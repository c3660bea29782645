package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative clustering over the `embeddings` table: Lloyd's k-means with
  * exact scaled-integer arithmetic, and the product-quantization codebooks
  * built on top of it (x21).
  *
  * Determinism discipline (shared with eq36/eq57/eq72): float components
  * are quantized to integer micro-units once, every per-cluster moment is
  * an exact BIGINT sum (order-free under any partitioning), and centroid
  * updates use an explicit floor-division `(s - pmod(s, n)) div n` whose
  * DuckDB twin is `(s - ((s % n + n) % n)) // n` — bit-identical in both
  * engines, so a 5-iteration run is hash-checkable end to end. This is the
  * same reason MLlib's KMeans can't be the oracle surface here: its
  * float accumulation order varies with partitioning.
  *
  * Scale posture: each iteration is one broadcast join of the k×d centroid
  * frame against the exploded corpus plus one (cid, pos) shuffle — the
  * canonical distributed k-means shape. Centroids live in k×d-row frames
  * (k=8, d=64 ⇒ 512 rows), localCheckpoint'd per round like eq72's power
  * iteration so the lineage stays O(1) instead of O(2^iters).
  */
object Clustering {

  private val Scale = 1000000.0

  /** Exact portable floor division of BIGINT columns (n > 0): pmod lands
    * in [0, n) so the numerator is exactly divisible and `div`'s
    * truncation equals the floor. DuckDB twin: `(s - ((s%n + n) % n)) // n`. */
  private def fdiv(s: Column, n: Column): Column =
    ((s - pmod(s, n)) / n).cast("long")

  /** The exploded micro-unit view of `embeddings`:
    * (vec_id, pos, v = round(x·10⁶) as BIGINT). */
  private[pipeline] def microVectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"),
        round(col("x").cast("double") * Scale).cast("long").as("v"))

  /** eq89 — Lloyd's k-means (k=8, 5 iterations) over the embedding corpus,
    * exact in integer micro-units so the run is oracle-reproducible:
    *
    *  - init: the k vectors ranked first by (md5(vec_id), vec_id) — a
    *    deterministic pseudo-random spread; planned as
    *    TakeOrderedAndProject, never a global sort;
    *  - assign: squared-L2 in exact BIGINT (|v| ≤ ~10⁶ ⇒ Σ_d diff² ≤
    *    ~2.6e14 at d=64 — far inside BIGINT), argmin = min(struct(dist,
    *    cid)) with cid as the deterministic tie-break;
    *  - update: per-(cid, pos) BIGINT sums, floor-div mean; clusters that
    *    lose all members keep their previous centroid (deterministic, no
    *    re-seeding randomness).
    *
    * Output: (cid, pos, n_members, centroid) — k×d rows regardless of
    * corpus size. The per-iteration driver work is nil: centroids stay in
    * a k×d-row DataFrame (localCheckpoint'd, like eq72), never collected.
    */
  def kmeans(spark: SparkSession, dir: String): DataFrame =
    kmeansDf(Tables.load(spark, dir, "embeddings"))

  def kmeansDf(e: DataFrame, k: Int = 8, iters: Int = 5): DataFrame = {
    // materialized once: seeding, every assign pass and every update pass
    // re-consume the exploded frame (iters·2 + 1 scans otherwise)
    val v = microVectors(e).localCheckpoint()

    // k seed rows via top-k (TakeOrderedAndProject); the row_number that
    // turns rank into cid runs over exactly k rows — bounded by design
    val seedIds = v.select(col("vec_id")).distinct()
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id"))
      .limit(k)
    val byHash = Window.orderBy(col("h"), col("vec_id"))
    val seeds = seedIds
      .withColumn("cid", (row_number().over(byHash) - 1).cast("int"))
      .select("vec_id", "cid")

    var cents = seeds.join(v, "vec_id")
      .select(col("cid"), col("pos"), col("v").as("cv"))
      .localCheckpoint()
    var assign: DataFrame = null
    for (_ <- 1 to iters) {
      assign = assignTo(v, cents)
      val upd = assign.join(v, "vec_id")
        .groupBy("cid", "pos")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      cents = cents.join(upd, Seq("cid", "pos"), "left")
        .select(col("cid"), col("pos"),
          when(col("n").isNull, col("cv"))
            .otherwise(fdiv(col("s"), col("n"))).as("cv"))
        .localCheckpoint() // k×d rows; cuts the per-iteration lineage
    }
    val sizes = assign.groupBy("cid").agg(count(lit(1)).as("n_members"))
    cents.join(sizes, Seq("cid"), "left")
      .select(col("cid"), col("pos"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        round(col("cv").cast("double") / Scale, 6).as("centroid"))
      .orderBy("cid", "pos")
  }

  /** One Lloyd assignment pass: nearest centroid per vector by exact
    * integer squared-L2, ties to the smallest cid. One broadcast of the
    * k×d centroid frame, one (vec_id, cid) partial-agg shuffle. */
  private def assignTo(v: DataFrame, cents: DataFrame): DataFrame =
    v.join(broadcast(cents), "pos")
      .groupBy("vec_id", "cid")
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("dist"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))
}
