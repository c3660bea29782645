package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, EventOps, Similarity}

/** Adversarial-skew rehearsal (VERDICT r8 task 2): the 100 TB posture
  * claims — PPJoin hot-shingle immunity, salted-join reducer balance,
  * SemDeDup cluster bounding — proven against deliberately hostile
  * fixtures instead of argued in Scaladoc. Candidate-set cardinalities
  * are pinned EXACTLY (every path is deterministic); the wall-clock twin
  * of this spec is [[graft.SkewBench]] → SKEWBENCH.json.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // ---- fixture 1: one shingle shared by 50% of documents -------------

  /** 120 docs; evens carry a shared 3-token boilerplate phrase (the hot
    * shingle, df=60), plus one genuine near-dup pair (docs 200/201,
    * J=8/9). All other shingles are unique per doc. */
  private def hotShingleDocs = {
    val base = (0 until 120).map { i =>
      val uniq = (0 until 10).map(t => s"u${i}t$t").mkString(" ")
      val text = if (i % 2 == 0) s"$uniq spam spam spam" else uniq
      (i.toLong, text, "en", "s", 0L)
    }
    val pair = Seq(
      (200L, (0 until 10).map(t => s"v$t").mkString(" "), "en", "s", 0L),
      (201L, (0 until 10).map(t => s"v$t").mkString(" ") + " w", "en", "s", 0L))
    (base ++ pair).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("hot shingle in 50% of docs: prefix candidates stay flat, plain fan-out is quadratic") {
    val docs = hotShingleDocs
    // the plain inverted join would pay Σ C(df,2): C(60,2)=1770 on the
    // hot shingle + 8 shared shingles of the one true near-dup pair
    assert(Dedup.plainCandidateCount(docs) == 1778L)
    // the prefix path keeps only each doc's rarest shingles: the hot
    // shingle (max df) never enters a prefix, so the ONLY candidate is
    // the true near-dup pair
    assert(Dedup.prefixCandidatesDf(docs).count() == 1L)
    // both paths still agree on the qualifying pairs (the prefix theorem
    // guarantees losslessness; the hot docs' J = 1/21 < 0.2 so the 1770
    // hot candidates were all wasted verification work)
    val prefix = Dedup.jaccardPairsPrefixDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val plain = Dedup.jaccardPairsPlainDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(prefix.toSeq == Seq((200L, 201L, 0.888889)))
    assert(plain.toSeq == prefix.toSeq)
  }

  // ---- fixture 2: one user owning 30% of events ----------------------

  /** 60k events; user 0 owns 30%, the rest spread over 97 users. Values
    * are 2-dp so cents arithmetic is exact. */
  private def hotUserEvents = spark.range(60000).select(
    col("id").as("event_id"),
    when(col("id") % 10 < 3, 0L).otherwise(col("id") % 97 + 1).as("user_id"),
    concat(lit("t"), col("id") % 5).as("event_type"),
    (col("id") % 1000).cast("double").divide(100.0).as("value"))

  test("hot user with 30% of events: salted join balances reducers, matches the plain join bit-for-bit") {
    val events = hotUserEvents
    val salted = EventOps.saltedJoinTotalsDf(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // unsalted control: the same join without the salt column
    val dim = events.groupBy("user_id").agg(
      count(lit(1)).as("hist_events"),
      sum(round(col("value") * 100).cast("long")).as("hist_value_cents"))
    val control = events.select(col("event_id"), col("user_id"), col("event_type"))
      .join(dim, Seq("user_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("hist_events")).as("partner_events"),
        sum(col("hist_value_cents")).as("partner_value_cents"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(salted.toSeq == control.toSeq, "salting must not change join semantics")
    // reducer balance: the hot user's 18k rows spread over all 8 salts,
    // no (user, salt) group keeps more than ~1/8 + slack of the hot mass
    val perSalt = events
      .withColumn("salt", pmod(hash(col("event_id")), lit(8)))
      .filter(col("user_id") === 0L)
      .groupBy("salt").count().collect().map(r => r.getLong(1))
    assert(perSalt.length == 8, "hot user must occupy every salt bucket")
    assert(perSalt.sum == 18000L)
    assert(perSalt.max <= 18000L / 8 * 13 / 10,
      s"hot-user rows skewed across salts: ${perSalt.mkString(",")}")
  }

  test("AQE marks the unsalted control skewed; the salted join needs no skew split") {
    val events = hotUserEvents
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // toy thresholds sized to the fixture's COMPRESSED shuffle bytes
    // (range-generated rows compress to ~KBs); the discriminator between
    // the two plans is the skew FACTOR: the unsalted hot partition is ~3×
    // the median, the salted partitions are even
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    // factor 2: the unsalted hot partition is ~2.7× the median — well
    // above — while the salted layout's benign hash imbalance (~1.1–1.3×)
    // must stay below, or the toy 1KB byte floor would flag noise as skew
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    try {
      // the profile dim MATERIALIZED (as a real pipeline's dim table is):
      // OptimizeSkewedJoin only matches Sort(ShuffleQueryStage) children,
      // so a dim that is a post-shuffle AGGREGATE over the same key hides
      // the stage behind the HashAggregate and AQE cannot split the join
      // at all — a real planning cliff this test documents: materialize
      // the dim (or salt) when the probe side is hot
      val dim = events.groupBy("user_id").agg(
        count(lit(1)).as("hist_events"),
        sum(round(col("value") * 100).cast("long")).as("hist_value_cents"))
        .localCheckpoint()
      // unsalted control: user 0's partition is ~3× the median → AQE must
      // split it at runtime (the engine's fallback when no salt is coded).
      // The md5 payload keeps shuffle BYTES proportional to rows — the hot
      // partition's constant-user rows otherwise compress so much better
      // than the mixed partitions that the byte-level skew factor erodes
      val unsalted = events
        .select(col("event_id"), col("user_id"), col("event_type"),
          md5(col("event_id").cast("string")).as("payload"))
        .join(dim, Seq("user_id"))
      assert(unsalted.collect().length == 60000)
      val unsaltedPlan = unsalted.queryExecution.executedPlan.toString
      assert(unsaltedPlan.contains("skew=true"),
        s"expected AQE skew split on the unsalted control in:\n$unsaltedPlan")
      // salted path under the SAME toy thresholds: (user, salt) keys are
      // balanced, so no partition trips the skew detector
      val salted = EventOps.saltedJoinTotalsDf(events)
      salted.collect()
      val saltedPlan = salted.queryExecution.executedPlan.toString
      assert(!saltedPlan.contains("skew=true"),
        s"salted join should not need a skew split:\n$saltedPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    }
  }

  // ---- fixture 3: one giant (mislabeled) cluster ---------------------

  /** 400 vectors, dim 64. Label 0 holds 240 members (60% — a collapsed
    * clustering), labels 1–8 hold 20 each. Members 0–19 are ten planted
    * near-identical pairs (2i, 2i+1); every other vector is a
    * deterministic pseudo-random direction. */
  private def giantClusterEmbeddings = {
    // murmur-hashed components — genuinely uncorrelated directions (a
    // modular/LCG formula here produces shifted-sawtooth vectors whose
    // pairwise cosines are spuriously high)
    def comp(seed: Int, d: Int): Float =
      (scala.util.hashing.MurmurHash3.productHash((seed, d)) % 1000) / 1000.0f
    def vec(id: Long): Array[Float] =
      if (id < 20) { // ten planted near-identical twin pairs (2i, 2i+1)
        val arr = (0 until 64).map(d => comp(1000 + (id / 2).toInt, d)).toArray
        if (id % 2 == 1) arr(0) += 0.01f
        arr
      } else (0 until 64).map(d => comp(id.toInt, d)).toArray
    (0L until 400L).map { id =>
      val label = if (id < 240) 0 else (id % 8 + 1).toInt
      (id, vec(id), label)
    }.toDF("vec_id", "embedding", "label")
  }

  test("giant cluster: within-cluster pair mass is quadratic, SRP sub-sharding collapses it and keeps the planted dups") {
    val e = giantClusterEmbeddings
    // the unguarded SemDeDup candidate mass: Σ C(cluster,2)
    val plainCands = e.groupBy("label").count()
      .agg(expr("sum(count * (count - 1) div 2)")).head().getLong(0)
    assert(plainCands == 28680L + 8L * 190L) // C(240,2) + 8·C(20,2)
    // sub-sharded: the giant cluster splits over SRP buckets, small
    // clusters keep shard 0 — candidate mass collapses ~20×
    val shardedCands = Similarity.shardedGroupsDf(e, cap = 100)
      .groupBy("label", "shard").count()
      .agg(expr("sum(count * (count - 1) div 2)")).head().getLong(0)
    assert(shardedCands < plainCands / 10,
      s"sub-sharding should collapse candidate mass: $shardedCands vs $plainCands")
    // the ten planted near-identical pairs survive sub-sharding: twins
    // are ~parallel, so their SRP signatures agree and both variants
    // count them as duplicates of label 0
    val plainRow = Similarity.semanticDedupDf(e).filter(col("label") === 0).head()
    val shardRow = Similarity.semanticDedupShardedDf(e, cap = 100)
      .filter(col("label") === 0).head()
    assert(plainRow.getLong(2) >= 10L, s"plain path must see the 10 planted pairs, got $plainRow")
    assert(shardRow.getLong(2) >= 10L, s"sharded path must keep the 10 planted pairs, got $shardRow")
    assert(shardRow.getLong(2) <= plainRow.getLong(2))
    // untouched small clusters agree exactly between the two variants
    val plainSmall = Similarity.semanticDedupDf(e).filter(col("label") > 0).collect().toSeq
    val shardSmall = Similarity.semanticDedupShardedDf(e, cap = 100).filter(col("label") > 0).collect().toSeq
    assert(plainSmall == shardSmall)
  }

  // ---- fixture 5: giant near-dup cluster vs the cluster-atomic split --

  test("giant cluster under eq131: still zero leaks, but mass concentrates — rep-selection is the documented mitigation") {
    // 60 of 80 docs form ONE near-dup cluster (shared boilerplate run,
    // pairwise J ≥ 0.2); 20 docs are unique singletons. The
    // cluster-atomic split must still leak zero pairs — but the giant
    // cluster lands in ONE split wholesale, so split masses skew: this
    // is the inherent leakage-safety/balance tradeoff. The production
    // mitigation is eq84: collapse each cluster to its representative
    // BEFORE splitting, which turns the giant cluster into one doc.
    val boiler = (0 until 12).map(t => s"b$t").mkString(" ")
    val docs = ((0 until 60).map { i =>
      (i.toLong, s"$boiler x$i", "en", "s", 0L)
    } ++ (100 until 120).map { i =>
      val uniq = (0 until 10).map(t => s"u${i}t$t").mkString(" ")
      (i.toLong, uniq, "en", "s", 0L)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Dedup.clusterSplitDf(docs).collect()
    val cluster = rows.filter(_.getString(0) == "cluster")
    assert(cluster.forall(_.getLong(5) == 0L), "leak-free even under the giant cluster")
    // the giant cluster's 60 docs land in exactly one split atomically
    assert(cluster.map(_.getLong(2)).max >= 60L,
      "the giant cluster must not be torn across splits")
    // after eq84 rep-selection the same corpus splits at DOCUMENT
    // granularity again: 1 rep + 20 singletons assigned independently —
    // multiple splits occupied (vs the giant cluster's all-or-nothing
    // 60-doc block), masses near the designed 80/10/10
    val reps = Dedup.clusterRepsDf(docs).select(col("rep_doc_id"))
    val repCorpus = docs.join(reps, docs("doc_id") === reps("rep_doc_id"), "left_semi")
      .union(docs.filter(col("doc_id") >= 100L)).distinct()
    assert(repCorpus.count() == 21L)
    val repRows = Dedup.clusterSplitDf(repCorpus).collect()
      .filter(_.getString(0) == "cluster")
    assert(repRows.forall(_.getLong(5) == 0L))
    assert(repRows.length >= 2,
      "rep-collapsed corpus must occupy more than one split")
    assert(repRows.forall(_.getLong(2) <= 18L),
      "no 60-doc atomic block remains after rep selection")
  }

  // ---- fixture 4: one giant document ---------------------------------

  test("giant document: chunkTexts bounds the explode fan-out and preserves the token profile exactly") {
    // 5 normal 6-token docs + one 1000-token doc (fan-out unit Spark
    // cannot split); chunking at 64 tokens must cap per-row fan-out at 64
    // while the per-source token profile stays bit-identical
    val docs = ((0 until 5).map(i =>
      (i.toLong, (0 until 6).map(t => s"g${i}t$t").mkString(" "), "web")) :+
      (9L, (0 until 1000).map(t => s"w$t").mkString(" "), "dump"))
      .toDF("doc_id", "text", "source")
    val chunks = graft.pipeline.CorpusOps.chunkTexts(docs, 64)
    // ceil(1000/64)=16 chunks for the giant; 1 chunk per normal doc
    val perDoc = chunks.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc(9L) == 16L && (0 until 5).forall(i => perDoc(i.toLong) == 1L))
    val fanout = chunks
      .select(size(split(col("text"), "\\s+")).as("n")).agg(max("n")).head().getInt(0)
    assert(fanout == 64, s"chunk fan-out must be capped at 64, got $fanout")
    def profile(df: org.apache.spark.sql.DataFrame) = df
      .select(col("source"), explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(length(col("tok"))).as("chars"),
        countDistinct(col("tok")).as("d"))
      .orderBy("source").collect().map(_.toString).toSeq
    assert(profile(chunks) == profile(docs),
      "chunked layout must preserve the token profile exactly")
  }

  // ---- fixture 6 (r13): a hostile hot-band BATCH against the state log

  test("hostile hot-band batch vs the state log: ingest work is " +
    "state-size-independent — the attack costs the batch, never the state") {
    // 400 MUTUAL near-duplicates in one micro-batch — 11 shared template
    // tokens plus a unique member token per doc, so every doc collides
    // into the same band buckets as every other. The within-batch mining
    // legitimately pays the cluster's own pair mass (the batch IS one
    // giant near-dup cluster — SKEWBENCH §5's shape arriving as a
    // delta), but the claim that matters at 100 TB is that the attack's
    // cost is bounded by the BATCH: the same hostile batch ingested into
    // a log wrapping a 10× bigger committed state must ship ~the same
    // shuffle bytes. Probes broadcast batch keys into scan-only state
    // unions; nothing about the hostile collision structure reaches the
    // state side as shuffle.
    import graft.sources.{SnapshotStateSink, StateLog}
    val meter = WorkMass.meter(spark.sparkContext)
    def hostileBatch(from: Long) = spark.range(from, from + 400).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        ((0 until 11).map(j => lit(s"zqv0s0t$j")) :+
          concat(lit("m"), translate(col("id").cast("string"),
            "0123456789", "abcdefghij"))): _*).as("text"),
      lit("en").as("lang"), lit("s0").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .localCheckpoint()
    def ingestHostile(n: Long): WorkMass = {
      val old = ScaleBench.corpus(spark, n).localCheckpoint()
      val st = SnapshotStateSink.write(spark, old, lit(false), lit(true))
      val ref = StateLog.fromSnapshot(spark, st,
        StateLog.writeCorpusStore(spark, old))
      Dedup.clearDerivedCaches() // fresh-restart posture: the batch pays its own signing
      var applied = false
      val w = meter { applied = StateLog.ingestBatch(spark, ref, st, hostileBatch(n), 0L) }
      assert(applied, "the hostile batch must still commit")
      w
    }
    val w1 = ingestHostile(2000)
    val w10 = ingestHostile(20000)
    println(s"[skewspec] hostile-band batch ingest shuffle: 1x=${w1.shuffleRead}B " +
      s"10x=${w10.shuffleRead}B peak=${w1.peakMem}/${w10.peakMem}")
    assert(w1.shuffleRead > 0, "meter must observe the hostile ingest")
    assert(w10.shuffleRead < 3L * w1.shuffleRead,
      s"a hostile batch's ingest work must not grow with the committed state: " +
        s"${w1.shuffleRead} -> ${w10.shuffleRead}")
    Dedup.clearDerivedCaches() // 20k-doc frames must not outlive the test
  }

  // ---- fixture 7: clustered doc_ids vs the pack prefix sum -----------

  test("clustered-id pack corpus: the refinement re-splits the one oversized " +
    "bucket down to the threshold, values equal the plain window (VERDICT r13 task 2)") {
    import org.apache.spark.sql.expressions.Window
    import graft.pipeline.Curation
    // a razor-thin id band inside a huge range: level-0 range buckets put
    // the WHOLE corpus in one bucket — the degraded single-task shape the
    // r13 verdict flagged. Two outliers stretch the range.
    val n = 50000L
    val base = 5000000000L
    val docs = spark.range(n).select(
        (col("id") + base).as("doc_id"), lit("en").as("lang"),
        (col("id") % 7).cast("long").as("n_tokens"))
      .unionByName(Seq((0L, "en", 1L), (4000000000000L, "en", 2L))
        .toDF("doc_id", "lang", "n_tokens"))
      .localCheckpoint()
    // prove the fixture is hostile: the LEVEL-0 bucket rule alone puts
    // ≥ n rows in one bucket
    val k = spark.sessionState.conf.numShufflePartitions
    val width0 = 4000000000000L / k + 1
    val level0Max = docs
      .groupBy(expr(s"doc_id div $width0")).count()
      .agg(max("count")).head().getLong(0)
    assert(level0Max >= n,
      s"fixture must degenerate at level 0, got max bucket $level0Max")
    // the refinement bounds the max bucket by the split threshold
    val (_, stats, threshold) = Curation.packBucketed(docs)
    val maxRows = stats.map(_.rows).max
    println(s"[skewspec] clustered-id pack: level0_max=$level0Max " +
      s"refined_max=$maxRows threshold=$threshold buckets=${stats.size}")
    assert(maxRows <= threshold,
      s"refined max bucket $maxRows must be <= threshold $threshold " +
        s"(level-0 was $level0Max)")
    assert(stats.size > k / 2,
      s"the band must actually spread across buckets, got ${stats.size}")
    // and the values are still EXACTLY the plain window's
    val plainW = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = docs.withColumn("cum",
      coalesce(sum(col("n_tokens")).over(plainW), lit(0L)))
    val got = Curation.packPrefixCum(docs)
    assert(got.select("doc_id", "cum").exceptAll(expect.select("doc_id", "cum")).isEmpty &&
      expect.select("doc_id", "cum").exceptAll(got.select("doc_id", "cum")).isEmpty,
      "refined two-phase cum diverged from the plain window")
  }

  // ---- fixture 8: duplicate doc_ids vs the pack bucket re-split ------

  test("duplicate-id pack corpus (contract violation): degradation is bounded " +
    "by the max per-id multiplicity — every over-threshold bucket is a " +
    "single-VALUE bucket, and the plain window pays the same (VERDICT r14 task 6)") {
    import org.apache.spark.sql.expressions.Window
    import graft.pipeline.Curation
    // doc_id uniqueness is the documented corpus contract; this fixture
    // VIOLATES it with one id repeated `mult` times. A single-value
    // bucket (mn == mx) is unsplittable by the range rule BY DESIGN —
    // and by ANY design: the plain window puts an id's tied rows in one
    // partition too, so the bound below is the floor any order-by-id
    // prefix sum has on this input, not a rewrite regression.
    val mult = 30000L
    val dupId = 5000000L
    val docs = spark.range(1000).select(
        col("id").as("doc_id"), lit("en").as("lang"),
        (col("id") % 7).cast("long").as("n_tokens"))
      .unionByName(spark.range(mult).select(
        lit(dupId).as("doc_id"), lit("en").as("lang"),
        lit(1L).as("n_tokens"))) // uniform: tie order cannot change cums
      .unionByName(Seq((9000000L, "en", 3L), (9000001L, "en", 4L))
        .toDF("doc_id", "lang", "n_tokens"))
      .localCheckpoint()
    val (_, stats, threshold) = Curation.packBucketed(docs)
    val over = stats.filter(_.rows > threshold)
    println(s"[skewspec] duplicate-id pack: mult=$mult threshold=$threshold " +
      s"over=${over.map(s => (s.rows, s.mn, s.mx))} buckets=${stats.size}")
    assert(over.nonEmpty && threshold < mult,
      s"fixture must force an over-threshold bucket (threshold $threshold)")
    assert(over.forall(s => s.mn == s.mx),
      s"every over-threshold bucket must be single-VALUE (unsplittable), got " +
        over.map(s => (s.rows, s.mn, s.mx)).mkString(", "))
    assert(stats.map(_.rows).max == mult,
      s"the degradation bound is the max per-id multiplicity $mult, got " +
        s"${stats.map(_.rows).max}")
    // values: with the duplicated id's rows uniform, the cum MULTISET is
    // deterministic and equals the plain window's despite the tie order
    val plainW = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = docs.withColumn("cum",
      coalesce(sum(col("n_tokens")).over(plainW), lit(0L)))
    val got = Curation.packPrefixCum(docs)
    assert(got.select("doc_id", "cum").exceptAll(expect.select("doc_id", "cum")).isEmpty &&
      expect.select("doc_id", "cum").exceptAll(got.select("doc_id", "cum")).isEmpty,
      "two-phase cum multiset diverged from the plain window on duplicate ids")
  }
}
