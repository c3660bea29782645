package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Md5Expressions.md5_key28
import graft.functions.ShingleExpressions

/** eq136 — the composed END-TO-END curation pipeline (VERDICT r9 task 2):
  * the engine's operators exist as ~176 independent audits; a real
  * pretraining run chains them. This operator runs the chain in
  * production ORDER over one corpus and publishes the per-stage funnel a
  * release would publish — one row per stage with document/token/char
  * conservation accounting (the eq54 shape, extended to the full
  * lifecycle):
  *
  *   1 ingest           — the raw corpus
  *   2 exact_dedup      — keep the min-doc_id copy per identical text
  *                        (eq11's rule)
  *   3 neardup_dedup    — keep the best-quality representative per
  *                        near-dup cluster (eq26's components over the
  *                        MEMOIZED eq12 pair table; eq84's quality-rep
  *                        rule, eq8's score)
  *   4 split_train      — keep the TRAIN side of the cluster-atomic
  *                        80/10/10 split (eq131's leakage-safe rule: the
  *                        split hashes the CLUSTER, so near-dup pairs
  *                        never straddle)
  *   5 quality_gate     — keep quality ≥ 0.5 (eq38's gate, same shared
  *                        qualityCols as the standalone query)
  *   6 decontam         — drop any survivor whose distinct-3-shingle
  *                        overlap with the held-out TEST split exceeds
  *                        [[DecontamMaxRatio]] (eq29's shuffle-on-shingle
  *                        audit turned into the scrub it exists for)
  *   7 temperature_mix  — α=0.3 language rebalancing against a
  *                        half-corpus budget (eq106's exact integer
  *                        rates, md5-ppm membership)
  *   8 shard_pack       — pack survivors into 2000-token shards per
  *                        language (eq34's prefix-sum layout);
  *                        n_units = shard count
  *   9 bpe_encode       — encode the surviving token stream under the
  *                        corpus-wide MEMOIZED BPE vocabulary (eq126/
  *                        eq129); n_units = total encoded symbols
  *
  * Output: (stage_id, stage, n_docs, n_dropped, total_tokens,
  * total_chars, n_units) with n_dropped = the previous stage's n_docs
  * minus this one's — conservation is IN the frame, so the oracle hash
  * checks it. n_units is the stage's natural output unit (docs for the
  * filters, shards for packing, symbols for encoding).
  *
  * Why this is the memo lifecycle's production proof: the chain consumes
  * the Jaccard pair table (via the component labels) and the BPE
  * vocabulary exactly ONCE each from their PlanMemo entries — shared with
  * eq12/eq26/eq84/eq131 and eq126/eq129 — and PipelineSpec asserts the
  * mining counters advance by exactly 1 across the whole run (and by 0 on
  * a re-run). At 100 TB this is the difference between a pipeline that
  * re-mines a corpus-squared pair join per stage and one that
  * materializes its derived artifacts once per snapshot.
  *
  * Scale shape: one map-side qualityCols pass + a labels join (labels are
  * pair-graph-sized, ≪ corpus) checkpointed once; exact dedup is a window
  * on the 32-byte sha2 key (never the text); rep selection a window on
  * the cluster key; stages 4-5 map-side filters; decontam one
  * shuffle-on-shingle semi-join (never doc×doc); the mix two broadcast
  * scalar frames + a map-side filter; packing a per-lang window; encode a
  * vocabulary-bounded join over the token stream. The terminal 9-row
  * funnel is metadata-sized (its lag window is unpartitioned over 9 rows
  * by construction, the EventOps bucket-stats precedent). */
object Curation {

  private val QualityMin = 0.5
  private[graft] val DecontamMaxRatio = 0.2
  private[graft] val ShardBudget = 2000

  def curationPipeline(spark: SparkSession, dir: String): DataFrame =
    curationPipelineDf(Tables.load(spark, dir, "documents"))

  /** The chain's PRODUCT, not just its accounting: the stage-7 survivor
    * corpus with each document's eq34 shard assignment attached —
    * (doc_id, lang, source, text, n_chars, n_tokens, quality, cluster,
    * cluster_split, shard_id) — i.e. what a trainer actually consumes.
    * Built by the SAME stage builder as the funnel, so the two can never
    * disagree on membership (pinned by test against the funnel's stage-7
    * and stage-8 rows). */
  def curatedDocs(spark: SparkSession, dir: String): DataFrame =
    curatedDocsDf(Tables.load(spark, dir, "documents"))

  def curatedDocsDf(docs: DataFrame): DataFrame =
    shardAssign(chainOf(docs).s7)

  /** The curated MEMBERSHIP (the stage-7 survivor frame) WITHOUT the
    * shard assignment (r16 optimization): consumers that re-window from
    * scratch anyway — the post-retraction repack family, the log's
    * curated-retained resolution — used to call [[curatedDocsDf]] and
    * immediately drop `shard_id`, paying [[packPrefixCum]]'s eager
    * per-bucket stats collects (driver jobs at frame-BUILD time, so not
    * even column pruning could remove them) for a column they discard.
    * [[shardAssign]] is row-preserving (its joins are against per-key
    * frames derived from the same corpus), so this frame is exactly
    * `curatedDocsDf(docs).drop("shard_id")`. */
  private[graft] def curatedMembership(docs: DataFrame): DataFrame =
    chainOf(docs).s7

  /** Exclusive per-lang prefix sum of `n_tokens` in `doc_id` order — the
    * pack family's one primitive — computed as a TWO-PHASE distributed
    * scan instead of a single per-lang window (r13). A plain
    * `Window.partitionBy("lang")` puts a language's ENTIRE corpus
    * through one task (an external sort + scan), which at production
    * scale makes the dominant language a single-task sort of most of
    * the corpus — the last single-partition shape in the engine.
    *
    *  1. per-lang (min, max) doc_id — one cheap aggregate, broadcast;
    *  2. a deterministic ORDER-PRESERVING bucket per row:
    *     `(doc_id - min) div width`, `width = (max - min) div K + 1`
    *     (pure integer division: no sampling, no overflow, no second
    *     materialization of the frame, bkt ∈ [0, K));
    *  3. per-(lang, bucket) stats — count, token sum, (min, max) doc_id
    *     — map-side combined down to a TINY frame (≤ K·|langs| rows)
    *     and collected (the one deliberate driver read, same class as
    *     the state log's manifest);
    *  4. RE-SPLIT of oversized buckets (VERDICT r13 task 2): the bucket
    *     boundaries are id-RANGE-derived, so ids clustered into one
    *     narrow band put ~everything in one bucket — the degraded shape
    *     is the very single-task window this rewrite removes. Any
    *     bucket holding more than max(1, 2·|corpus|/K) rows is split
    *     again by the SAME range rule over its OWN (min, max) — a
    *     clustered band's internal range is exactly the band, so one
    *     level usually resolves it; fractal layouts recurse (each level
    *     divides the id range by K, so ≤ ~64/log2 K levels before
    *     width 1, where unique ids force count 1). Each level costs one
    *     extra scan+partial-agg over the frame and runs ONLY when an
    *     oversized bucket exists; the driver renumbers the leaf
    *     intervals densely in id order, so bucket ids stay small,
    *     Long-safe and order-preserving;
    *  5. per-bucket EXCLUSIVE offsets — exact prefix sums over the
    *     collected stats, computed on the driver, broadcast back;
    *  6. the per-row prefix sum within each (lang, bucket) window plus
    *     the broadcast bucket offset.
    *
    * `cum` is EXACTLY the single-window value for every row — buckets
    * are order-preserving, doc_ids unique, long addition exact — and
    * K-independent (only the plan varies with the session), so golden
    * hashes are bit-identical. Shuffle byte class unchanged (one
    * frame-sized exchange, keyed (lang, bucket) instead of (lang)); the
    * max window partition is ≤ the split threshold ~2·|corpus|/K
    * whenever ids are splittable (only duplicate-id single-value
    * buckets can exceed it — and unique doc_ids make those count ≤ 1).
    * A corpus that VIOLATES the unique-doc_id contract degrades with a
    * measured bound (r15, SkewSpec fixture 8): an over-threshold bucket
    * is always a single-VALUE bucket, so the max partition is the max
    * per-id multiplicity — the same floor the plain window has on that
    * input, since an id's tied rows are one indivisible partition under
    * any order-by-id prefix sum. Dedup upstream (eq1's exact pass) is
    * the real fix for such a corpus, not the packer.
    * The BATCH-side windows ([[appendPackCount]]/[[appendPackSummary]])
    * keep the plain shape — batch-bounded by contract. The lang key is
    * null-safe via a PAIR (`lang IS NULL`, `coalesce(lang, '')`) — no
    * reserved sentinel value (ADVICE r13: a corpus whose lang is
    * literally the old NUL sentinel must stay a separate partition from
    * NULL), and a plain single-column join would silently DROP
    * null-lang rows the old window kept as their own partition. */
  /** One (lang-key, bucket)'s collected stats — the tiny driver-side
    * frame [[packBucketed]]'s refinement loop and [[packPrefixCum]]'s
    * offset computation both run on. */
  private[graft] final case class BStat(pln: Boolean, pl: String, bkt: Long,
    rows: Long, toks: Long, mn: Long, mx: Long)

  /** Steps 1–4 of [[packPrefixCum]]: the order-preserving bucket
    * assignment with the oversized-bucket refinement loop. Returns the
    * bucketed frame (`_pln`, `_pl`, `_bkt` appended), the final
    * per-bucket stats, and the split threshold — exposed so SkewSpec can
    * pin the SHAPE (max bucket ≤ threshold on hostile clustered-id
    * layouts), not just the values. */
  private[graft] def packBucketed(corpus: DataFrame):
      (DataFrame, Seq[BStat], Long) = {
    val k = math.max(1, corpus.sparkSession.sessionState.conf.numShufflePartitions)
    val keyCols = Seq("_pln", "_pl")
    val withKey = corpus
      .withColumn("_pln", col("lang").isNull)
      .withColumn("_pl", coalesce(col("lang"), lit("")))
    val ranges = withKey.groupBy(keyCols.map(col): _*).agg(
      min(col("doc_id")).as("_idmin"), max(col("doc_id")).as("_idmax"))
    var bucketed = withKey.join(broadcast(ranges), keyCols)
      .withColumn("_bkt",
        expr(s"(doc_id - _idmin) div (((_idmax - _idmin) div $k) + 1)"))
      .drop("_idmin", "_idmax")

    // per-(lang-key, bkt) stats: rows, token sum, (min, max) doc_id; TINY
    def statsOf(df: DataFrame): Seq[BStat] =
      df.groupBy(col("_pln"), col("_pl"), col("_bkt"))
        .agg(count(lit(1)).as("_c"), sum(col("n_tokens")).as("_s"),
          min(col("doc_id")).as("_mn"), max(col("doc_id")).as("_mx"))
        .collect().toSeq.map(r => BStat(r.getBoolean(0), r.getString(1),
          r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) 0L else r.getLong(4), r.getLong(5), r.getLong(6)))

    var stats = statsOf(bucketed)
    val total = stats.map(_.rows).sum
    val threshold = math.max(1L, 2L * total / k)
    var level = 0
    // refine while any bucket is oversized AND still splittable: a
    // single-id bucket cannot split, and with unique doc_ids it holds
    // one row anyway — a duplicate-id corpus just stops there, matching
    // the plain window's partition. Each level divides the id range by
    // K, so the 40-level bound is never the stopper in practice.
    while (level < 40 && stats.exists(s => s.rows > threshold && s.mx > s.mn)) {
      level += 1
      val spark = corpus.sparkSession
      import spark.implicits._
      // dense leaf renumbering in id order: an unsplit bucket keeps one
      // slot, a split bucket takes k consecutive slots (sub-range order
      // == id order), so global (lang, bkt) order is preserved.
      val remap = stats.groupBy(s => (s.pln, s.pl)).toSeq.flatMap {
        case ((pln, pl), bs) =>
          var next = 0L
          bs.sortBy(_.bkt).map { s =>
            val split = s.rows > threshold && s.mx > s.mn
            val base = next
            next += (if (split) k.toLong else 1L)
            (pln, pl, s.bkt, base,
              if (split) Some(s.mn) else None,
              if (split) Some((s.mx - s.mn) / k + 1) else None)
          }
      }.toDF("_pln", "_pl", "_bkt", "_nb", "_smin", "_swidth")
      bucketed = bucketed.join(broadcast(remap), keyCols :+ "_bkt")
        .withColumn("_bkt",
          when(col("_swidth").isNull, col("_nb"))
            .otherwise(col("_nb") + expr("(doc_id - _smin) div _swidth")))
        .drop("_nb", "_smin", "_swidth")
      stats = statsOf(bucketed)
    }
    (bucketed, stats, threshold)
  }

  private[graft] def packPrefixCum(corpus: DataFrame): DataFrame = {
    val keyCols = Seq("_pln", "_pl")
    val (bucketed, stats, _) = packBucketed(corpus)
    // exact exclusive offsets from the collected stats, driver-side
    val offsets = {
      val spark = corpus.sparkSession
      import spark.implicits._
      stats.groupBy(s => (s.pln, s.pl)).toSeq.flatMap { case ((pln, pl), bs) =>
        var acc = 0L
        bs.sortBy(_.bkt).map { s =>
          val off = acc; acc += s.toks; (pln, pl, s.bkt, off)
        }
      }.toDF("_pln", "_pl", "_bkt", "_boff")
    }
    val bktW = Window.partitionBy(col("_pln"), col("_pl"), col("_bkt"))
      .orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), keyCols :+ "_bkt")
      .withColumn("cum",
        coalesce(sum(col("n_tokens")).over(bktW), lit(0L)) + col("_boff"))
      .drop("_pln", "_pl", "_bkt", "_boff")
  }

  /** The eq34 shard assignment over a corpus frame: per-lang prefix sum
    * of n_tokens in doc_id order ([[packPrefixCum]] — the two-phase
    * scan), shard = cum div budget. Shared by [[curatedDocsDf]] (the
    * full curation's product) and the post-retraction REPACK (fresh
    * assignments over the retained corpus —
    * [[graft.sources.SnapshotStateSink.repack]]), so the two can never
    * disagree on the packing rule. */
  private[graft] def shardAssign(corpus: DataFrame): DataFrame =
    packPrefixCum(corpus)
      .withColumn("shard_id", expr(s"cum div $ShardBudget"))
      .select((corpus.columns :+ "shard_id").map(col).toIndexedSeq: _*)

  /** The seven survivor frames, one per filter stage (packing/encoding
    * transform s7 without dropping). */
  private final case class Chain(
      spine: DataFrame, s2: DataFrame, s3: DataFrame, s4: DataFrame,
      s5: DataFrame, s6: DataFrame, s7: DataFrame)

  /** Chain memo (ADVICE r10): a consumer that wants both the funnel
    * (curationPipelineDf) and the product corpus (curatedDocsDf) must not
    * execute the 7-stage chain — three localCheckpoint materializations
    * and the memoized-artifact reads — twice. Memoized per (session,
    * canonicalized docs plan) exactly like the pair table, so the
    * shared-builder guarantee (funnel and product can never disagree on
    * membership) now also means shared EXECUTION. */
  private val chainMemo = new PlanMemo[Chain]
  private def chainOf(docs: DataFrame): Chain =
    chainMemo(docs)(buildChain(docs))

  private def buildChain(docs: DataFrame): Chain = {
    // ---- spine: per-doc columns every stage reads, materialized once ----
    // (quality from the SHARED eq8 builder; cluster labels from the
    // MEMOIZED eq12 pair table via eq26's component labeling)
    val labels = Dedup.neardupLabelsDf(docs).withColumnRenamed("label", "label_")
    val spine = TextAnalysis.qualityCols(docs)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        col("n_chars"), col("n_tokens").cast("long").as("n_tokens"),
        col("quality"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("label_"), col("doc_id")))
      .withColumn("cluster_split",
        Dedup.splitOfBucket(md5_key28(col("cluster").cast("string")) % 100))
      .drop("label_")
      .localCheckpoint()

    // ---- stages 2-3: the two dedup windows, materialized once ----------
    val s2 = spine
      .withColumn("rn", row_number().over(
        Window.partitionBy(sha2(col("text"), 256)).orderBy("doc_id")))
      .filter(col("rn") === 1).drop("rn")
    val s3 = s2
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster")
          .orderBy(col("quality").desc_nulls_last, col("doc_id").asc)))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint() // stages 4-9 and three stage stats all read this

    // ---- stages 4-5: map-side gates ------------------------------------
    val s4 = s3.filter(col("cluster_split") === "train")
    val s5 = s4.filter(col("quality") >= QualityMin)

    // ---- stage 6: decontamination against the held-out TEST split ------
    // eq29's per-doc overlap ratio (shared shape: distinct-shingle probe,
    // count over a left join) turned into the scrub it audits for: drop a
    // survivor when MORE THAN [[DecontamMaxRatio]] of its distinct
    // shingles occur in the test split (the fixture's train-doc overlap
    // deciles run 0-0.35, so 0.2 is a discriminating production cut). Any-overlap would be the wrong
    // production rule — boilerplate shingles occur everywhere — and the
    // ratio keeps the gate scale-free.
    val s6 = s5.join(contaminatedIds(s5, testVocabOf(spine)), Seq("doc_id"), "left_anti")
      .localCheckpoint() // the mix rates and stage 7 both read this

    // ---- stage 7: temperature mix (eq106's exact arithmetic) -----------
    val s7 = s6.join(broadcast(mixRatesOf(s6)), Seq("lang"))
      .filter(md5_key28(col("text")) % 1000000 < col("rate_ppm"))
      .drop("rate_ppm")
      .localCheckpoint() // stage stats, packing, and encode all read this

    Chain(spine, s2, s3, s4, s5, s6, s7)
  }

  /** The snapshot's per-lang pack summary, memoized ON DEMAND (its own
    * PlanMemo, not a Chain field — chain consumers that never pack, like
    * curatedDocs' write path, must not pay the summary's window pass;
    * r11-late review finding). eq136's stage-8 count is its n_shards sum;
    * eq137's append packing starts each lang at (t_tokens, last_shard) —
    * O(batch) per delta ingest instead of re-windowing the merged corpus. */
  private val packMemo = new PlanMemo[DataFrame]
  private def packOf(docs: DataFrame, s7: DataFrame): DataFrame =
    packMemo(docs)(packSummaryOf(s7).localCheckpoint() /* |langs| rows */)

  /** The per-lang pack summary of a corpus frame — (lang, n_docs,
    * t_tokens, t_chars, n_shards, last_shard). Derived from the SAME eq34
    * prefix-sum window as curatedDocs' shard ids, so the summary can
    * never disagree with the written layout. */
  private[graft] def packSummaryOf(corpus: DataFrame): DataFrame = {
    packPrefixCum(corpus
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("n_chars")))
      .withColumn("shard", expr(s"cum div $ShardBudget"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("t_tokens"),
        coalesce(sum(col("n_chars")), lit(0L)).as("t_chars"),
        countDistinct(col("shard")).as("n_shards"),
        max(col("shard")).as("last_shard"))
  }

  /** The O(batch) append-pack union count: total distinct (lang, shard)
    * after `delta` (lang, doc_id, n_tokens) packs after the old corpus
    * summarized by `ps` ([[packSummaryOf]] schema). Each delta lang
    * starts its prefix sum at the old t_tokens; delta shard ids are
    * monotone ≥ the old last shard, so the only possible collision is
    * exactly that shard. Pinned against the full-merge reference
    * computation on hostile synthetic layouts in PipelineSpec. */
  private[graft] def appendPackCount(ps: DataFrame, delta: DataFrame): DataFrame = {
    val deltaPackW = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val deltaPack = delta
      .select(col("lang"), col("doc_id"), col("n_tokens"))
      .join(broadcast(ps.select(col("lang"), col("t_tokens"), col("last_shard"))),
        Seq("lang"), "left_outer")
      .withColumn("cum", coalesce(sum(col("n_tokens")).over(deltaPackW), lit(0L))
        + coalesce(col("t_tokens"), lit(0L)))
      .withColumn("shard", expr(s"cum div $ShardBudget"))
      .groupBy("lang")
      .agg(countDistinct(col("shard")).as("d_shards"),
        min(col("shard")).as("d_first"),
        max(col("last_shard")).as("last_shard"))
    ps.select(col("lang"), col("n_shards"))
      .join(deltaPack, Seq("lang"), "full_outer")
      .agg(coalesce(sum(
        coalesce(col("n_shards"), lit(0L)) + coalesce(col("d_shards"), lit(0L))
          - when(col("d_first") === col("last_shard"), lit(1L)).otherwise(lit(0L))),
        lit(0L)).as("n_units"))
  }

  /** The O(batch) ADVANCED pack summary: [[packSummaryOf]](old ∪ delta)
    * computed from the stored summary and the delta alone — the pack half
    * of eq141's state advance. Same append math as [[appendPackCount]]
    * (delta langs start their prefix sums at the stored t_tokens; the
    * only shard the sides can share is the old LAST one, subtracted when
    * the delta's first shard collides), extended to every summary column;
    * the advanced last_shard is the delta's when a delta exists (its
    * shard ids are ≥ the old last by monotonicity). Pinned against the
    * full-merge [[packSummaryOf]] on hostile layouts in PipelineSpec. */
  private[graft] def appendPackSummary(ps: DataFrame, delta: DataFrame): DataFrame = {
    val deltaPackW = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val dsum = delta
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("n_chars"))
      .join(broadcast(ps.select(col("lang"), col("t_tokens").as("o_t"),
        col("last_shard").as("o_last"))), Seq("lang"), "left_outer")
      .withColumn("cum", coalesce(sum(col("n_tokens")).over(deltaPackW), lit(0L))
        + coalesce(col("o_t"), lit(0L)))
      .withColumn("shard", expr(s"cum div $ShardBudget"))
      .groupBy("lang")
      .agg(count(lit(1)).as("d_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("d_tokens"),
        coalesce(sum(col("n_chars")), lit(0L)).as("d_chars"),
        countDistinct(col("shard")).as("d_shards"),
        min(col("shard")).as("d_first"),
        max(col("shard")).as("d_last"),
        max(col("o_last")).as("o_last"))
    ps.join(dsum, Seq("lang"), "full_outer")
      .select(col("lang"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("d_docs"), lit(0L))).as("n_docs"),
        (coalesce(col("t_tokens"), lit(0L)) + coalesce(col("d_tokens"), lit(0L))).as("t_tokens"),
        (coalesce(col("t_chars"), lit(0L)) + coalesce(col("d_chars"), lit(0L))).as("t_chars"),
        (coalesce(col("n_shards"), lit(0L)) + coalesce(col("d_shards"), lit(0L))
          - when(col("d_first") === col("o_last"), lit(1L)).otherwise(lit(0L))).as("n_shards"),
        coalesce(col("d_last"), col("last_shard")).as("last_shard"))
  }

  /** The held-out TEST split's distinct-3-shingle vocabulary — the frame
    * every decontamination scrub probes (eq136 stage 6; eq137 scrubs its
    * delta against the OLD snapshot's test vocab, the production shape:
    * the benchmark set is fixed between full curations). */
  private def testVocabOf(spine: DataFrame): DataFrame =
    spine.filter(col("cluster_split") === "test")
      .select(explode(ShingleExpressions.shingles(col("text"), 3)).as("sg"))
      .distinct()
      .withColumn("hit", lit(1))

  /** eq29's per-doc overlap ratio turned into the scrub rule: doc_ids of
    * `survivors` whose distinct-3-shingle overlap with `testVocab`
    * exceeds [[DecontamMaxRatio]]. One shuffle-on-shingle join — never
    * doc×doc. */
  private def contaminatedIds(survivors: DataFrame, testVocab: DataFrame): DataFrame =
    survivors
      .select(col("doc_id"),
        array_distinct(ShingleExpressions.shingles(col("text"), 3)).as("shd"))
      .withColumn("sz", size(col("shd")))
      .filter(col("sz") > 0)
      .select(col("doc_id"), col("sz"), explode(col("shd")).as("sg"))
      .join(testVocab, Seq("sg"), "left_outer")
      .groupBy("doc_id", "sz")
      .agg(count(col("hit")).as("n_hit"))
      .filter(col("n_hit").cast("double") / col("sz") > DecontamMaxRatio)
      .select("doc_id")

  /** eq106's exact per-lang temperature rates derived from a corpus frame
    * — (lang, rate_ppm). Factored so eq137 can FREEZE the old snapshot's
    * rates and apply them to an incoming delta (mixture weights are fixed
    * per release; re-derivation happens at the next full curation).
    *
    * DECIMAL(38,0) widening (ADVICE r10, the eq120/eq135 pattern): in
    * pure LONG the numerator w_micro·(n_total/2)·10⁶ overflows past
    * ~1.8e7 docs and the denominator w_sum·ln_docs past ~1e11 — ANSI
    * ARITHMETIC_OVERFLOW at exactly the corpus sizes the pipeline
    * targets. IntegralDivide over decimal returns BIGINT, so rate_ppm's
    * type (and every recorded hash) is unchanged. */
  private def mixRatesOf(corpus: DataFrame): DataFrame = {
    val counts = corpus.groupBy("lang").agg(count(lit(1)).as("ln_docs"))
    val total = counts.agg(sum(col("ln_docs")).as("n_total"))
    val w = counts.crossJoin(broadcast(total))
      .withColumn("w_micro",
        round(pow(col("ln_docs").cast("double") / col("n_total").cast("double"),
          CorpusOps.TemperatureAlpha) * 1000000.0).cast("long"))
    val wsum = w.agg(sum(col("w_micro")).as("w_sum"))
    w.crossJoin(broadcast(wsum))
      .withColumn("rate_ppm", least(lit(1000000L),
        expr("(cast(w_micro as decimal(38,0)) * (n_total div 2) * 1000000)" +
          " div (cast(w_sum as decimal(38,0)) * ln_docs)")))
      .select(col("lang"), col("rate_ppm"))
  }

  def curationPipelineDf(docs: DataFrame): DataFrame = {
    val ch = chainOf(docs)
    import ch._

    // ---- stage 8: shard packing (eq34's layout); n_units = shards ------
    // shard ids partition by lang, so Σ per-lang distinct counts from the
    // memoized pack summary ≡ countDistinct(lang, shard) over the corpus
    val nShards = packOf(docs, s7).agg(
      coalesce(sum(col("n_shards")), lit(0L)).as("n_units"))

    // ---- stage 9: BPE encode under the MEMOIZED corpus-wide vocabulary -
    val enc = TextAnalysis.bpeEncTable(docs, TextAnalysis.BpeTrainMerges)
    val nSymbols = s7
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 1)
      .join(enc, Seq("tok"), "left_outer")
      .agg(sum(coalesce(col("sy_after"), length(col("tok")).cast("long")))
        .as("n_units"))

    // ---- the funnel: 9 bounded rows with conservation accounting -------
    def stat(id: Int, name: String, df: DataFrame, units: Option[DataFrame]): DataFrame = {
      val base = df.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("total_tokens"),
        coalesce(sum(col("n_chars")), lit(0L)).as("total_chars"))
      val withUnits = units match {
        case Some(u) => base.crossJoin(broadcast(u))
        case None => base.withColumn("n_units", col("n_docs"))
      }
      withUnits.select(lit(id).as("stage_id"), lit(name).as("stage"),
        col("n_docs"), col("total_tokens"), col("total_chars"), col("n_units"))
    }
    val funnel = Seq(
      stat(1, "ingest", spine, None),
      stat(2, "exact_dedup", s2, None),
      stat(3, "neardup_dedup", s3, None),
      stat(4, "split_train", s4, None),
      stat(5, "quality_gate", s5, None),
      stat(6, "decontam", s6, None),
      stat(7, "temperature_mix", s7, None),
      stat(8, "shard_pack", s7, Some(nShards)),
      stat(9, "bpe_encode", s7, Some(nSymbols))).reduce(_ union _)
    funnel
      .withColumn("n_dropped",
        coalesce(lag(col("n_docs"), 1).over(Window.orderBy("stage_id"))
          - col("n_docs"), lit(0L)))
      .select(col("stage_id"), col("stage"), col("n_docs"), col("n_dropped"),
        col("total_tokens"), col("total_chars"), col("n_units"))
      .orderBy("stage_id")
  }

  /** eq137 — INCREMENTAL snapshot curation (VERDICT r10 task 3):
    * production pipelines curate *deltas*, not full corpora. The corpus
    * splits by eq104's deterministic snapshot rule — `doc_id % 10 < 8` is
    * the OLD snapshot (already curated by the eq136 chain, its derived
    * artifacts memoized), `doc_id % 10 ∈ {8,9}` is the incoming DELTA
    * batch (~20%). Only the delta is mined/gated/packed; the old corpus
    * is PROBED, never re-paired against itself, and its pair table /
    * chain / BPE vocabulary come straight from their PlanMemo entries
    * (PipelineSpec pins: cold run mines old-chain + delta pair tables and
    * the old-snapshot vocabulary exactly once; a re-run mines NOTHING).
    *
    * Delta stages, in production order:
    *
    *    1 delta_ingest      — the batch, with quality + within-batch
    *                          near-dup cluster labels (the batch IS
    *                          mined: O(batch²)-bounded PPJoin, while the
    *                          corpus is only probed)
    *    2 delta_exact       — within-batch keep-min-doc_id per identical
    *                          text (eq11's rule) AND drop any doc whose
    *                          content hash is already in the old corpus
    *                          (eq104's exact layer — a doc seen before is
    *                          never re-admitted)
    *    3 delta_near_corpus — drop docs whose band-key probe of the
    *                          bucket-guarded old index verifies at
    *                          Jaccard ≥ 0.5 (eq104's near layer, shared
    *                          signatureParts memo)
    *    4 delta_near_self   — best-quality representative per
    *                          within-batch cluster (eq84's rule)
    *    5 delta_split_train — cluster-atomic split on the BATCH clusters
    *                          (eq131's leakage-safe hashing)
    *    6 delta_quality_gate— quality ≥ 0.5 (eq38's gate)
    *    7 delta_decontam    — scrub against the OLD snapshot's held-out
    *                          TEST split vocabulary (the benchmark set is
    *                          fixed between full curations)
    *    8 delta_mix_frozen  — the OLD snapshot's per-lang rate_ppm,
    *                          FROZEN and applied to the delta (mixture
    *                          weights are fixed per release); a lang
    *                          unseen at rate-derivation time passes at
    *                          full rate pending the next full curation
    *    9 delta_encode      — n_units = delta survivors' symbol count
    *                          under the OLD snapshot's BPE vocabulary
    *                          (the shipped tokenizer encodes new data;
    *                          retraining waits for the next snapshot)
    *   10 merged_corpus     — old curated corpus ∪ delta survivors;
    *                          n_units = shard count after APPEND packing
    *                          (delta packs after the old corpus per lang,
    *                          so existing shards are never rewritten —
    *                          old docs keep their eq136 shard ids)
    *
    * n_dropped = lag conservation within the delta funnel (stages 2-9);
    * the merge stage ADDS, so its n_dropped is 0 by definition.
    *
    * Scale shape: per-ingest cost is O(batch × bucket) + O(batch²-bounded
    * prefix join) — corpus-sized work appears ONLY through memoized
    * artifacts (index signatures, chain, vocabulary) that a production
    * deployment materializes once per snapshot. This is the difference
    * between re-running eq136 on 100 TB per arriving crawl and touching
    * only the new terabyte. */
  def incrementalCuration(spark: SparkSession, dir: String): DataFrame =
    incrementalCurationDf(Tables.load(spark, dir, "documents"))

  def incrementalCurationDf(docs: DataFrame): DataFrame = {
    val isNew = col("doc_id") % 10 >= 8
    val oldDocs = docs.filter(col("doc_id") % 10 < 8)
    val oldCh = chainOf(oldDocs) // the last full curation, memoized
    deltaFunnel(docs.filter(isNew), FrozenState(
      Dedup.matchedOldHashes(docs, isNew),
      Dedup.incrementalNearIds(docs, isNew),
      testVocabOf(oldCh.spine),
      mixRatesOf(oldCh.s6)),
      TextAnalysis.bpeEncTable(oldDocs, TextAnalysis.BpeTrainMerges),
      packOf(oldDocs, oldCh.s7))
  }

  /** The OLD snapshot's frozen artifacts, as the delta path consumes
    * them — one field per production handoff. eq137 reads them from the
    * session memos; eq140 reads every one from AT-REST tables (the
    * restart posture), through [[incrementalCurationFromState]]. */
  private final case class FrozenState(
      matchedHashes: DataFrame, // stored hashes ∩ batch — d2's anti side
      nearIds: DataFrame,       // batch ids verifying near-vs-corpus (d3)
      testVocab: DataFrame,     // (sg, hit) — the decontam reference (d7)
      mixRates: DataFrame)      // (lang, rate_ppm) — frozen release rates (d8)

  /** eq140 — the eq137 delta path with every frozen artifact supplied
    * from storage: the dedup index layers ([[Dedup.storedMatchedHashes]]
    * / [[Dedup.storedNearIds]] over the eq139 tables), the test-split
    * vocabulary, the release mix rates, the shipped BPE encoder, and the
    * per-lang pack summary — i.e. a delta ingest in a session that holds
    * NOTHING in memory from the last full curation. The funnel is
    * bit-identical to eq137's (same oracle); PipelineSpec pins that a
    * fresh session running this mines only the delta (+1 pair table, +1
    * labels, +1 batch signing) and re-learns nothing (BPE +0, index
    * memos +0). */
  private[graft] def incrementalCurationFromState(docs: DataFrame, isNew: Column,
      hashIdx: DataFrame, bandIdx: DataFrame, testVocab: DataFrame,
      mixRates: DataFrame, bpeEnc: DataFrame, packSummary: DataFrame): DataFrame =
    deltaFunnel(docs.filter(isNew), FrozenState(
      Dedup.storedMatchedHashes(docs.filter(isNew), hashIdx),
      Dedup.storedNearIds(docs, isNew, bandIdx),
      testVocab.withColumn("hit", lit(1)),
      mixRates), bpeEnc, packSummary)

  /** The OLD snapshot's artifact frames in storable form, derived from
    * the memoized chain exactly as eq137 consumes them — what
    * [[graft.sources.SnapshotStateSink]] writes at the end of a full
    * curation. */
  private[graft] def snapshotArtifactFrames(
      oldDocs: DataFrame): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val oldCh = chainOf(oldDocs)
    (testVocabOf(oldCh.spine).select("sg"),
      mixRatesOf(oldCh.s6),
      TextAnalysis.bpeEncTable(oldDocs, TextAnalysis.BpeTrainMerges),
      packOf(oldDocs, oldCh.s7))
  }

  /** The delta filter stages (the funnel's d1–d8 frames), split from the
    * stat assembly so eq141's state advance can reach the survivor frame
    * (d8) without computing funnel statistics. */
  private final case class DeltaStages(
      d1: DataFrame, d2: DataFrame, d3: DataFrame, d4: DataFrame,
      d5: DataFrame, d6: DataFrame, d7: DataFrame, d8: DataFrame)

  /** eq141's handle on the delta's SURVIVORS under at-rest state — the
    * frame the advance appends into the stored index and pack summary. */
  private[graft] def deltaSurvivorsFromState(docs: DataFrame, isNew: Column,
      hashIdx: DataFrame, bandIdx: DataFrame, testVocab: DataFrame,
      mixRates: DataFrame): DataFrame =
    deltaSurvivorsSplit(docs.filter(isNew), docs.filter(!isNew),
      hashIdx, bandIdx, testVocab, mixRates)

  /** [[deltaSurvivorsFromState]] with the batch and the indexed corpus as
    * SEPARATE frames (r16 optimization, the [[Dedup.storedNearIdsSplit]]
    * seam): lets the state log hand the batch's own stable plan so the
    * per-batch signing/labeling memos key on the batch, not on a union
    * plan that embeds per-log table names. Row-identical to the filter
    * split. */
  private[graft] def deltaSurvivorsSplit(batch: DataFrame, oldDocs: DataFrame,
      hashIdx: DataFrame, bandIdx: DataFrame, testVocab: DataFrame,
      mixRates: DataFrame): DataFrame =
    deltaStages(batch, FrozenState(
      Dedup.storedMatchedHashes(batch, hashIdx),
      Dedup.storedNearIdsSplit(batch, oldDocs, bandIdx),
      testVocab.withColumn("hit", lit(1)),
      mixRates)).d8

  private def deltaStages(deltaDocs: DataFrame, st: FrozenState): DeltaStages = {
    // ---- delta spine: quality + within-batch clusters + split ----------
    val labels = Dedup.neardupLabelsDf(deltaDocs).withColumnRenamed("label", "label_")
    val d1 = TextAnalysis.qualityCols(deltaDocs)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        col("n_chars"), col("n_tokens").cast("long").as("n_tokens"),
        col("quality"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("label_"), col("doc_id")))
      .withColumn("cluster_split",
        Dedup.splitOfBucket(md5_key28(col("cluster").cast("string")) % 100))
      .drop("label_")
      .localCheckpoint()

    // ---- stage 2: exact — within-batch keep-min + old-hash probe -------
    val d2 = d1
      .withColumn("rn", row_number().over(
        Window.partitionBy(sha2(col("text"), 256)).orderBy("doc_id")))
      .filter(col("rn") === 1).drop("rn")
      .join(broadcast(st.matchedHashes), md5(col("text")) === col("h"), "left_anti")

    // ---- stage 3: near-vs-corpus — eq104's probe, no old×old pairing ---
    val d3 = d2.join(st.nearIds, Seq("doc_id"), "left_anti")

    // ---- stage 4: within-batch cluster representative ------------------
    val d4 = d3
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster")
          .orderBy(col("quality").desc_nulls_last, col("doc_id").asc)))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint() // stages 5-9 and three stage stats read this

    // ---- stages 5-6: map-side gates ------------------------------------
    val d5 = d4.filter(col("cluster_split") === "train")
    val d6 = d5.filter(col("quality") >= QualityMin)

    // ---- stage 7: decontam vs the OLD snapshot's test vocabulary -------
    val d7 = d6.join(contaminatedIds(d6, st.testVocab), Seq("doc_id"), "left_anti")

    // ---- stage 8: the old snapshot's rates, frozen ---------------------
    val d8 = d7.join(broadcast(st.mixRates), Seq("lang"), "left_outer")
      .filter(md5_key28(col("text")) % 1000000
        < coalesce(col("rate_ppm"), lit(1000000L)))
      .drop("rate_ppm")
      .localCheckpoint() // stage stats, encode, and the merge read this

    DeltaStages(d1, d2, d3, d4, d5, d6, d7, d8)
  }

  private def deltaFunnel(deltaDocs: DataFrame, st: FrozenState,
      bpeEnc: DataFrame, packSummary: DataFrame): DataFrame = {
    val ds = deltaStages(deltaDocs, st)
    import ds._

    // ---- stage 9: encode under the OLD snapshot's vocabulary -----------
    val enc = bpeEnc
    val nSymbols = d8
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 1)
      .join(enc, Seq("tok"), "left_outer")
      .agg(sum(coalesce(col("sy_after"), length(col("tok")).cast("long")))
        .as("n_units"))

    // ---- stage 10: merge + append packing — O(batch), never a rescan ---
    // The old snapshot's per-lang pack state (token total, shard count,
    // last shard id) comes from the memoized summary; the delta packs
    // after the old corpus per lang (merged order (is_delta, doc_id)), so
    // each delta lang starts its prefix sum at t_tokens. Old docs keep
    // their eq136 shard ids by construction; the only shard the two sides
    // can share is the old LAST one (delta ids are ≥ it, monotone), so
    // the union count subtracts exactly that collision.
    val ps = packSummary
    val nShards = appendPackCount(ps, d8)
    val oldTotals = ps.agg(
      coalesce(sum(col("n_docs")), lit(0L)).as("o_docs"),
      coalesce(sum(col("t_tokens")), lit(0L)).as("o_tokens"),
      coalesce(sum(col("t_chars")), lit(0L)).as("o_chars"))

    // ---- the funnel: 10 bounded rows -----------------------------------
    def stat(id: Int, name: String, df: DataFrame, units: Option[DataFrame]): DataFrame = {
      val base = df.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("total_tokens"),
        coalesce(sum(col("n_chars")), lit(0L)).as("total_chars"))
      val withUnits = units match {
        case Some(u) => base.crossJoin(broadcast(u))
        case None => base.withColumn("n_units", col("n_docs"))
      }
      withUnits.select(lit(id).as("stage_id"), lit(name).as("stage"),
        col("n_docs"), col("total_tokens"), col("total_chars"), col("n_units"))
    }
    val funnel = Seq(
      stat(1, "delta_ingest", d1, None),
      stat(2, "delta_exact", d2, None),
      stat(3, "delta_near_corpus", d3, None),
      stat(4, "delta_near_self", d4, None),
      stat(5, "delta_split_train", d5, None),
      stat(6, "delta_quality_gate", d6, None),
      stat(7, "delta_decontam", d7, None),
      stat(8, "delta_mix_frozen", d8, None),
      stat(9, "delta_encode", d8, Some(nSymbols)),
      // stage 10 sums the memoized old totals with the delta's own — the
      // merged corpus is never re-scanned for its stats either
      stat(10, "merged_corpus", d8, Some(nShards))
        .crossJoin(broadcast(oldTotals))
        .select(col("stage_id"), col("stage"),
          (col("n_docs") + col("o_docs")).as("n_docs"),
          (col("total_tokens") + col("o_tokens")).as("total_tokens"),
          (col("total_chars") + col("o_chars")).as("total_chars"),
          col("n_units"))).reduce(_ union _)
    funnel
      .withColumn("n_dropped",
        when(col("stage_id") === 10, lit(0L)).otherwise(
          coalesce(lag(col("n_docs"), 1).over(Window.orderBy("stage_id"))
            - col("n_docs"), lit(0L))))
      .select(col("stage_id"), col("stage"), col("n_docs"), col("n_dropped"),
        col("total_tokens"), col("total_chars"), col("n_units"))
      .orderBy("stage_id")
  }
}
