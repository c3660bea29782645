package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusOps, Dedup, EventOps, Similarity}

/** Adversarial-skew rehearsal bench (VERDICT r8 task 2) — the wall-clock
  * twin of SkewSpec. Three hostile fixtures, generated deterministically
  * in-memory:
  *
  *   1. hot shingle  — one 3-token boilerplate phrase in 50% of 20k docs:
  *      the plain inverted Jaccard join pays Σ C(df,2) ≈ 50M candidate
  *      verifications; the PPJoin prefix path's candidate set is EMPTY
  *      (the hot shingle never enters a prefix). The blowup is visible in
  *      wall-clock (~4-5× locally) AND in the candidate counts.
  *   2. hot user     — one user owns 30% of 8M events, dim-too-big regime
  *      (broadcast disabled): the unsalted probe-side join funnels 2.4M
  *      rows through ONE reducer; the x25 salted join caps every reducer
  *      at ~300k. On local[32] the shared core pool absorbs the straggler
  *      (all cores drain one box's work either way), so wall-clock parity
  *      here is EXPECTED — the scale-relevant measurement is per-reducer
  *      input, which is what becomes stage wall-clock on a real cluster;
  *      SkewSpec's plan assert covers the AQE-rescue of the unsalted
  *      shape.
  *   3. giant cluster — 60% of 16k embeddings share one (mislabeled)
  *      cluster label: SemDeDup's within-cluster pair mass is ~48.6M; the
  *      SRP sub-sharding guard collapses it ~18× (wall-clock ~3×) and
  *      keeps the planted true duplicates.
  *   4. giant document — one 2M-token document among 20k normal docs
  *      (~89% of corpus tokens): `explode` fans a row out inside the ONE
  *      task that owns it — the skew unit Spark cannot split. The
  *      mitigation is ingest-time re-shaping ([[graft.pipeline.CorpusOps
  *      .chunkTexts]]): pay the O(doc) split once, store 512-token chunk
  *      rows, and every downstream token pipeline is bounded per row.
  *      Token profiles (counts, chars, distinct) are pinned equal across
  *      the two layouts; max_row_fanout is the scale-relevant metric
  *      (2M → 512), with local wall-clock reported for both.
  *
  * Methodology: one un-timed warm-up, then three timed passes per
  * measurement, median reported (the Bench discipline). Prints ONE JSON
  * line and writes it to SKEWBENCH.json (committed as the round artifact).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def median3(f: => Unit): Double = {
      f // warm-up
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }

    // ---- 1. hot shingle in 50% of 20k docs ---------------------------
    val docs = spark.range(20000).select(
        col("id").as("doc_id"),
        concat(
          concat_ws(" ", (0 until 12).map(t =>
            concat(lit("u"), col("id"), lit(s"t$t"))): _*),
          when(col("id") % 2 === 0, lit(" spam spam spam")).otherwise(lit(""))).as("text"),
        lit("en").as("lang"), lit("s").as("source"), lit(0L).as("n_chars"))
      .localCheckpoint()
    // materializes the shared shingle-set checkpoint too, so the timed
    // paths below compare the JOIN strategies, not the shingling
    val plainCands = Dedup.plainCandidateCount(docs)
    val prefixCands = Dedup.prefixCandidatesDf(docs).count()
    val plainSec = median3(Dedup.jaccardPairsPlainDf(docs).count())
    val prefixSec = median3(Dedup.jaccardPairsPrefixDf(docs).count())

    // ---- 2. one user owning 30% of 8M events -------------------------
    val events = spark.range(8000000).select(
        col("id").as("event_id"),
        when(col("id") % 10 < 3, 0L).otherwise(col("id") % 997 + 1).as("user_id"),
        concat(lit("t"), col("id") % 5, lit("x" * 60)).as("event_type"),
        (col("id") % 1000).cast("double").divide(100.0).as("value"))
      .localCheckpoint()
    def unsaltedJoinTotals(): Unit = {
      // the x25 join WITHOUT the salt — dim built inline exactly as the
      // salted path builds its own, so the timings compare join layouts
      val dim = events.groupBy("user_id").agg(
        count(lit(1)).as("hist_events"),
        sum(round(col("value") * 100).cast("long")).as("hist_value_cents"))
      events.select(col("event_id"), col("user_id"), col("event_type"))
        .join(dim, Seq("user_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("hist_events")).as("partner_events"),
          sum(col("hist_value_cents")).as("partner_value_cents"))
        .collect()
    }
    // the x25 contract: salting targets the dim-TOO-BIG, key-skewed
    // regime — at broadcast-able dim sizes Spark broadcasts and the skew
    // never materializes. Disable broadcast so both paths run the shuffled
    // join that regime forces, making the reducer skew real.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val unsaltedSec = median3(unsaltedJoinTotals())
    val saltedSec = median3(EventOps.saltedJoinTotalsDf(events).collect())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    val hotRows = events.filter(col("user_id") === 0L).count()
    val maxSaltedGroup = events
      .withColumn("salt", pmod(hash(col("event_id")), lit(8)))
      .groupBy("user_id", "salt").count()
      .agg(max("count")).head().getLong(0)

    // ---- 3. giant mislabeled cluster over 16k embeddings --------------
    def comp(seed: Int, d: Int): Float =
      (scala.util.hashing.MurmurHash3.productHash((seed, d)) % 1000) / 1000.0f
    val emb = (0L until 16000L).map { id =>
      val v =
        if (id < 40) { // twenty planted near-identical twin pairs
          val a = (0 until 64).map(d => comp(100000 + (id / 2).toInt, d)).toArray
          if (id % 2 == 1) a(0) += 0.01f
          a
        } else (0 until 64).map(d => comp(id.toInt, d)).toArray
      val label = if (id < 9600) 0 else (id % 8 + 1).toInt
      (id, v, label)
    }.toDF("vec_id", "embedding", "label").localCheckpoint()
    val clusterPairMass = emb.groupBy("label").count()
      .agg(expr("sum(count * (count - 1) div 2)")).head().getLong(0)
    val shardedPairMass = Similarity.shardedGroupsDf(emb, cap = 1000)
      .groupBy("label", "shard").count()
      .agg(expr("sum(count * (count - 1) div 2)")).head().getLong(0)
    val plainSemSec = median3(Similarity.semanticDedupDf(emb).collect())
    val shardedSemSec = median3(Similarity.semanticDedupShardedDf(emb, cap = 1000).collect())
    val plainDups = Similarity.semanticDedupDf(emb)
      .agg(sum("n_dup_pairs")).head().getLong(0)
    val shardedDups = Similarity.semanticDedupShardedDf(emb, cap = 1000)
      .agg(sum("n_dup_pairs")).head().getLong(0)
    // recall on the planted twins: a twin pair survives sub-sharding iff
    // both members draw the same SRP shard
    val shardAssign = Similarity.shardedGroupsDf(emb, cap = 1000)
      .select(col("vec_id"), col("shard")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val twinsKept = (0L until 40L by 2)
      .count(i => shardAssign(i) == shardAssign(i + 1))

    // ---- 4. one giant document owning ~89% of corpus tokens -----------
    // 20k normal docs of 12 tokens + ONE 2M-token document. explode() fans
    // a row out inside the single task that owns it — the one skew unit
    // Spark cannot split — so every token-pipeline stage downstream of the
    // giant row runs in one task. The mitigation is ingest-time re-shaping:
    // CorpusOps.chunkTexts splits the monster into 512-token chunk ROWS
    // once, after which the same analysis is bounded per row and spreads.
    val giantText = spark.range(2000000)
      .agg(concat_ws(" ", collect_list(concat(lit("w"), col("id")))))
      .head().getString(0)
    val gdocs = spark.range(20000).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(t =>
          concat(lit("g"), col("id"), lit(s"t$t"))): _*).as("text"),
        lit("web").as("source"))
      .union(spark.createDataFrame(Seq((20000L, giantText, "dump")))
        .toDF("doc_id", "text", "source"))
      .localCheckpoint()
    // ingest-time chunked twin (one-time cost, measured separately), spread
    // across the session's partitions like a real chunk table would be
    val chunkT0 = System.nanoTime()
    val gchunks = CorpusOps.chunkTexts(gdocs, 512)
      .repartition(cpus.toInt).localCheckpoint()
    val chunkIngestSec = (System.nanoTime() - chunkT0) / 1e9
    def tokenProfile(df: DataFrame): Array[org.apache.spark.sql.Row] = df
      .select(col("source"), explode(graft.pipeline.TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), sum(length(col("tok"))).as("n_chars"),
        countDistinct(col("tok")).as("n_distinct"))
      .orderBy("source").collect()
    val directProfile = tokenProfile(gdocs)
    val chunkedProfile = tokenProfile(gchunks)
    require(directProfile.map(_.toString).sameElements(chunkedProfile.map(_.toString)),
      "chunked token profile must equal the direct profile")
    val directSec = median3(tokenProfile(gdocs))
    val chunkedSec = median3(tokenProfile(gchunks))
    val maxFanoutDirect = gdocs
      .select(size(graft.pipeline.TextAnalysis.tokens(col("text"))).as("n"))
      .agg(max("n")).head().getInt(0)
    val maxFanoutChunked = gchunks
      .select(size(graft.pipeline.TextAnalysis.tokens(col("text"))).as("n"))
      .agg(max("n")).head().getInt(0)

    // ---- 5. clustered doc_ids vs the pack prefix sum (r14) ------------
    // 1M ids in a razor-thin band inside a huge range + 2 outliers:
    // level-0 range buckets put ~everything in ONE bucket (the degraded
    // single-task window the r13 verdict flagged); the refinement loop
    // re-splits it to <= threshold. Control: the same 1M rows with
    // uniform ids (no refinement triggered). Measured: the level-0 max
    // bucket, the refined max bucket vs threshold, and wall-clock of the
    // full prefix sum on both layouts.
    val pn = 1000000L
    val clustered = spark.range(pn).select(
        (col("id") + 5000000000L).as("doc_id"), lit("en").as("lang"),
        (col("id") % 7).cast("long").as("n_tokens"))
      .union(spark.createDataFrame(Seq(
        (0L, "en", 1L), (4000000000000L, "en", 2L)))
        .toDF("doc_id", "lang", "n_tokens"))
      .localCheckpoint()
    val uniform = spark.range(pn + 2).select(
        (col("id") * 3999999L).as("doc_id"), lit("en").as("lang"),
        (col("id") % 7).cast("long").as("n_tokens"))
      .localCheckpoint()
    val kPart = spark.sessionState.conf.numShufflePartitions
    val width0 = 4000000000000L / kPart + 1
    val level0Max = clustered
      .groupBy(expr(s"doc_id div $width0")).count()
      .agg(max("count")).head().getLong(0)
    val (_, packStats, packThreshold) =
      graft.pipeline.Curation.packBucketed(clustered)
    val refinedMax = packStats.map(_.rows).max
    val clusteredSec = median3(
      graft.pipeline.Curation.packPrefixCum(clustered).agg(sum("cum")).collect())
    val uniformSec = median3(
      graft.pipeline.Curation.packPrefixCum(uniform).agg(sum("cum")).collect())

    // ---- 6. duplicate doc_ids vs the pack re-split (r15) --------------
    // the CONTRACT-VIOLATING corpus: one id owns 300k of 1M rows. A
    // single-VALUE bucket is unsplittable by the range rule (and by any
    // design — the plain window puts an id's tied rows in one partition
    // too), so the degradation must be bounded by the max per-id
    // multiplicity, never by corpus size or layout. Measured: the
    // refined max bucket (== multiplicity), that every over-threshold
    // bucket is single-value, and the prefix-sum wall on the violating
    // corpus vs the same mass deduped upstream (the real fix).
    val dn = 1000000L
    val dupMult = 300000L
    val dupCorpus = spark.range(dn - dupMult).select(
        (col("id") + 5000000000L).as("doc_id"), lit("en").as("lang"),
        (col("id") % 7).cast("long").as("n_tokens"))
      .union(spark.range(dupMult).select(
        lit(5010000000L).as("doc_id"), lit("en").as("lang"),
        lit(1L).as("n_tokens")))
      .localCheckpoint()
    val dedupedCorpus = dupCorpus.groupBy("doc_id")
      .agg(first(col("lang")).as("lang"), min(col("n_tokens")).as("n_tokens"))
      .localCheckpoint()
    val (_, dupStats, dupThreshold) = graft.pipeline.Curation.packBucketed(dupCorpus)
    val dupMax = dupStats.map(_.rows).max
    val dupOverSingleValue =
      dupStats.filter(_.rows > dupThreshold).forall(s => s.mn == s.mx)
    val dupSec = median3(
      graft.pipeline.Curation.packPrefixCum(dupCorpus).agg(sum("cum")).collect())
    val dedupedSec = median3(
      graft.pipeline.Curation.packPrefixCum(dedupedCorpus).agg(sum("cum")).collect())

    val json =
      s"""{"metric":"skewbench","unit":"sec","cpus":$cpus,""" +
        s""""hot_shingle":{"docs":20000,"hot_df":10000,""" +
        s""""plain_candidates":$plainCands,"prefix_candidates":$prefixCands,""" +
        s""""plain_sec":$plainSec,"prefix_sec":$prefixSec},""" +
        s""""hot_user":{"events":8000000,"hot_user_rows":$hotRows,""" +
        s""""max_salted_group_rows":$maxSaltedGroup,""" +
        s""""unsalted_sec":$unsaltedSec,"salted_sec":$saltedSec},""" +
        s""""giant_cluster":{"vectors":16000,"giant_members":9600,""" +
        s""""cluster_pair_mass":$clusterPairMass,"sharded_pair_mass":$shardedPairMass,""" +
        s""""plain_dup_pairs":$plainDups,"sharded_dup_pairs":$shardedDups,""" +
        s""""planted_twins":20,"planted_twins_kept":$twinsKept,""" +
        s""""plain_sec":$plainSemSec,"sharded_sec":$shardedSemSec},""" +
        s""""giant_doc":{"docs":20001,"giant_tokens":2000000,"normal_tokens":240000,""" +
        s""""max_row_fanout_direct":$maxFanoutDirect,"max_row_fanout_chunked":$maxFanoutChunked,""" +
        s""""chunk_ingest_sec":$chunkIngestSec,""" +
        s""""direct_sec":$directSec,"chunked_sec":$chunkedSec},""" +
        s""""clustered_pack":{"rows":${pn + 2},"level0_max_bucket":$level0Max,""" +
        s""""refined_max_bucket":$refinedMax,"threshold":$packThreshold,""" +
        s""""buckets":${packStats.size},""" +
        s""""clustered_sec":$clusteredSec,"uniform_sec":$uniformSec},""" +
        s""""duplicate_pack":{"rows":$dn,"dup_multiplicity":$dupMult,""" +
        s""""refined_max_bucket":$dupMax,"threshold":$dupThreshold,""" +
        s""""over_threshold_all_single_value":$dupOverSingleValue,""" +
        s""""violating_sec":$dupSec,"deduped_sec":$dedupedSec}}"""
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_SKEWBENCH_OUT", "SKEWBENCH.json")),
      json.getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[skewbench] file sink failed: ${e.getMessage}") }
    spark.stop()
  }
}
