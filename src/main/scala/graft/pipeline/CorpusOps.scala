package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Md5Expressions.md5_key28
import graft.functions.ShingleExpressions
import graft.functions.TextCountExpressions.ws_token_count

/** Corpus-preparation operators over the `documents` table — the
  * curation steps a training-data pipeline runs between raw ingest and
  * tokenization (SURVEY.md §2.8 extension surface): domain-mix
  * down-sampling, context-window chunking, corpus heavy-hitters,
  * token-budget shard packing, and length-outlier trimming.
  *
  * All five are content-keyed or single-pass by design, the property that
  * matters at 100 TB:
  *  - sampling and packing decisions are pure functions of the document
  *    text / the (lang, doc_id) order, so re-ingestion, re-partitioning
  *    and replication reproduce them bit-for-bit;
  *  - nothing here compares documents pairwise — every operator is a
  *    map-side transform plus one bounded aggregation or a
  *    partition-parallel window.
  */
object CorpusOps {

  /** eq31 — stratified (per-language) content-keyed down-sampling, the
    * domain-mixing primitive: each language keeps a fixed per-mille of its
    * documents, selected by a 28-bit md5 key of the TEXT (not doc_id, not
    * a RNG) so the sample is reproducible across runs, engines and
    * partitionings, and exact duplicates are kept or dropped together.
    * Pure map-side filter — no shuffle beyond the summary groupBy, so it
    * runs at any corpus size. Summarized per (lang, source) for the
    * oracle hash-compare; the per-doc filter is the same predicate
    * un-aggregated. */
  private[graft] val SampleRatePerMille: Seq[(String, Int)] =
    Seq("de" -> 800, "en" -> 300, "es" -> 600, "fr" -> 1000, "zh" -> 500)

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSampleDf(Tables.load(spark, dir, "documents"))

  /** The per-document keep predicate of [[stratifiedSampleDf]] — a pure
    * function of (text, lang), shared with the streaming ingest gate
    * ([[graft.streaming.StreamingOps.corpusGate]]) so batch and streaming
    * can never disagree on membership. */
  private[graft] def sampleKeep(text: org.apache.spark.sql.Column,
                                lang: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val rate = SampleRatePerMille.foldLeft(lit(0)) { case (els, (l, r)) =>
      when(lang === l, lit(r)).otherwise(els)
    }
    md5_key28(text) % 1000 < rate
  }

  def stratifiedSampleDf(docs: DataFrame): DataFrame = {
    docs
      .filter(sampleKeep(col("text"), col("lang")))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang", "source")
  }

  /** eq32 — context-window chunking: split every document into windows of
    * [[ChunkLen]] whitespace tokens with stride [[ChunkStride]] (8-token
    * overlap), the pre-tokenization step that shapes long documents into
    * training sequences. One row per chunk with its token count and
    * content md5. Pure per-row explode — parallelism is per document, no
    * shuffle except the presentation sort (which a real pipeline would
    * drop, writing chunks partitioned by shard instead). */
  private val ChunkLen = 32
  private val ChunkStride = 24

  def docChunks(spark: SparkSession, dir: String): DataFrame =
    docChunksDf(Tables.load(spark, dir, "documents"))

  def docChunksDf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
      // chunk starts at i*stride; last chunk is the first that reaches the
      // end: n <= len -> 1 chunk, else ceil((n-len)/stride)+1 of them
      .withColumn("n_chunks",
        when(col("n") <= ChunkLen, lit(1))
          .otherwise(expr(s"((n - ${ChunkLen - ChunkStride + 1}) div $ChunkStride) + 1")))
      .select(col("doc_id"), col("t"),
        // `div` yields LONG; chunk ordinals are small — keep them INT
        explode(sequence(lit(0), (col("n_chunks") - 1).cast("int"))).as("chunk_id"))
      .withColumn("c", slice(col("t"), col("chunk_id") * ChunkStride + 1, lit(ChunkLen)))
      .select(
        col("doc_id"), col("chunk_id"),
        size(col("c")).as("n_chunk_tokens"),
        md5(concat_ws(" ", col("c")).cast("binary")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  /** eq33 — corpus heavy hitters: the 20 most frequent 3-token shingles
    * with total occurrences and document frequency. The aggregation key is
    * the shingle, so cost is bounded by vocabulary (with map-side partial
    * aggregation), never by doc×doc; the cut is a 20-row
    * TakeOrderedAndProject with a deterministic (count DESC, shingle ASC)
    * tie-break. The boilerplate-detection primitive: at 100 TB these top
    * shingles are the site templates/navigation chrome you strip. */
  def trigramTopK(spark: SparkSession, dir: String): DataFrame =
    trigramTopKDf(Tables.load(spark, dir, "documents"))

  def trigramTopKDf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(ShingleExpressions.shingles(col("text"), 3)).as("shingle"))
      .groupBy("shingle")
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("shingle").asc)
      .limit(20)

  /** x10 — Count-Min-sketched heavy hitters: the [[trigramTopK]] top-20
    * with each shingle's frequency re-estimated from a mergeable Count-Min
    * sketch built in one distributed aggregate — the fixed-memory
    * frequency oracle a 100 TB pipeline keeps where exact per-key counts
    * would need a full shuffle. Driver-checkable shape (the x6/x8
    * pattern): the exact counts are oracle-verified values, and the sketch
    * surfaces as booleans the oracle pins TRUE — `cms_ge` is the sketch's
    * hard guarantee (estimate ≥ true count, always), `cms_close` the
    * probabilistic one (estimate ≤ true + 5·ε·N, ε = 1e-4 — 5× the
    * per-probe bound, astronomically safe at depth 5). Sketch hashing is
    * seeded Murmur3, so the estimates are deterministic across runs. */
  def cmsTopK(spark: SparkSession, dir: String): DataFrame =
    cmsTopKDf(Tables.load(spark, dir, "documents"))

  def cmsTopKDf(docs: DataFrame): DataFrame = {
    // materialized once: the sketch build and the exact aggregate both
    // consume this frame — without it each job re-runs the shingling pass
    val exploded = docs
      .select(col("doc_id"),
        explode(ShingleExpressions.shingles(col("text"), 3)).as("shingle"))
      .localCheckpoint()
    val eps = 1e-4
    val cms = exploded.stat.countMinSketch(col("shingle"), eps, 0.99, 42)
    val n = cms.totalCount() // stream length N for the ε·N bound, free from the sketch
    val est = graft.functions.SketchExpressions.cms_estimate(col("shingle"), cms)
    exploded
      .groupBy("shingle")
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("shingle").asc)
      .limit(20)
      .withColumn("cms_ge", est >= col("n_occurrences"))
      .withColumn("cms_close", est <= col("n_occurrences") + lit(5.0 * eps) * lit(n))
      .orderBy(col("n_occurrences").desc, col("shingle").asc)
  }

  /** eq34 — token-budget shard packing: documents are laid out in
    * deterministic (lang, doc_id) order and cut into shards of
    * [[ShardBudget]] whitespace tokens by exclusive prefix sum — the
    * "pack sequences into shards of N tokens" step before training. The
    * window is PARTITIONED BY lang, so each language packs independently
    * and in parallel; at 100 TB the partition key would be (lang, day) or
    * similar to bound any single sort, which changes shard numbering but
    * not the mechanism. Integer token counts make the prefix sum exact and
    * order-stable. */
  private val ShardBudget = 2000

  def packShards(spark: SparkSession, dir: String): DataFrame =
    packShardsDf(Tables.load(spark, dir, "documents"))

  def packShardsDf(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col("lang"), col("doc_id"),
        ws_token_count(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("shard_id", expr(s"cum div $ShardBudget"))
      .groupBy("lang", "shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("lang", "shard_id")
  }

  /** eq35 — length-outlier trimming: per-language p05/p95 bounds on
    * `n_chars` (exact interpolated percentile, ≡ DuckDB `quantile_cont`)
    * and the kept/dropped tally — the Gopher-style "drop the pathological
    * tails" filter. Two passes: a per-lang percentile aggregate (5 rows)
    * broadcast back onto the corpus, then a map-side classification — the
    * exact shape that scales (at 100 TB the first pass would use the
    * mergeable approx sketch; the exact form IS the oracle here).
    * Classification compares against the UNROUNDED bounds in both engines;
    * rounding is display-only. */
  def lengthTrim(spark: SparkSession, dir: String): DataFrame =
    lengthTrimDf(Tables.load(spark, dir, "documents"))

  def lengthTrimDf(docs: DataFrame): DataFrame = {
    val bounds = docs.groupBy("lang").agg(
      expr("percentile(n_chars, 0.05D)").as("p05"),
      expr("percentile(n_chars, 0.95D)").as("p95"))
    docs
      .join(broadcast(bounds), Seq("lang"))
      .groupBy("lang")
      .agg(
        round(first(col("p05")), 6).as("p05"),
        round(first(col("p95")), 6).as("p95"),
        sum(when(col("n_chars") < col("p05"), 1L).otherwise(0L)).as("n_short"),
        sum(when(col("n_chars") >= col("p05") && col("n_chars") <= col("p95"), 1L)
          .otherwise(0L)).as("n_kept"),
        sum(when(col("n_chars") > col("p95"), 1L).otherwise(0L)).as("n_long"))
      .orderBy("lang")
  }
}
