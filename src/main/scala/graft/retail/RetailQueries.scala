package graft.retail

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's 11 analytics query types (SURVEY.md §2.9, Q1–Q11),
  * re-expressed as single declarative DataFrame programs. Each maps to one
  * QUERY_MAP template or Python-orchestrated composite in
  * `/root/reference/etl_project/api_etl/views.py`; the Python post-loops
  * (views.py:226-254, 300-339) become joins + conditional aggregates so the
  * whole query is one Catalyst DAG — no driver-side iteration, no collect()
  * of fact-sized data (100 TB posture, SURVEY.md §7 risk 6).
  *
  * Determinism rules (SURVEY.md §2.9 canon): fixed parameters, `round(_, 6)`
  * on every double *before* any order-sensitive step, `magid ASC` tie-breaks
  * on all top-k, explicit full ORDER BY on output.
  */
object RetailQueries {
  // Frozen t2 parameters, verified non-degenerate at sf0.01 (SURVEY.md §2.9).
  val Cat   = "STANDARD"
  val Fab   = "Brand#12"
  val Debut = "1995-01-01"
  val Fin   = "1996-12-31"
  val AsOf  = "1998-09-01"

  /** Q1 — `cat` (views.py:10): full projection, equality predicate.
    * dateid rendered ISO for oracle parity. */
  def q1(spark: SparkSession, dir: String): DataFrame =
    Tables.produits(spark, dir)
      .filter(col("catid") === Cat)
      .select(
        date_format(col("dateid"), "yyyy-MM-dd").as("dateid"),
        col("prodid"), col("catid"), col("fabid"))
      .orderBy("dateid", "prodid", "catid", "fabid")

  /** Q2 — `mag-cat` (views.py:12): scalar COUNT(DISTINCT) — exact, planned
    * as partial+final HashAggregate by Catalyst. */
  def q2(spark: SparkSession, dir: String): DataFrame =
    Tables.pdv(spark, dir)
      .filter(col("catid") === Cat)
      .agg(countDistinct(col("magid")).as("total_magasins"))

  /** Q3 — `fab-cat` (views.py:14). */
  def q3(spark: SparkSession, dir: String): DataFrame =
    Tables.produits(spark, dir)
      .filter(col("catid") === Cat)
      .agg(countDistinct(col("fabid")).as("total_fabricants"))

  /** Q4 — `avg-prod-per-fab` (views.py:16-25): AVG over a grouped subquery.
    * Integer counts sum exactly in double, so the average is
    * order-insensitive and safe to hash at 6 dp. */
  def q4(spark: SparkSession, dir: String): DataFrame =
    Tables.produits(spark, dir)
      .filter(col("catid") === Cat && col("dateid").between(Debut, Fin))
      .groupBy("fabid")
      .agg(countDistinct(col("prodid")).as("product_count"))
      .agg(round(avg(col("product_count")), 6).as("avg_products_per_fab"))

  /** Shared body of Q5 (`top-magasins`, views.py:27-43): per-store
    * multi-COUNT(DISTINCT) (planned via Expand, exact) + weighted score.
    * Score is rounded to 6 dp *before* the sort so the top-k cut is decided
    * on identical values in both engines; `magid ASC` breaks ties
    * (SURVEY.md §7 risk 3). `TakeOrderedAndProject` — no full sort. */
  private[graft] def top10AllCats(spark: SparkSession, dir: String): DataFrame =
    topMagasins(Tables.pdv(spark, dir), Debut, Fin)

  /** Parameterized Q5 body — the ONE implementation of the all-category
    * weighted top-10, shared by the frozen t2 variant above and the typed
    * API layer ([[graft.api.QueryService]]). */
  private[graft] def topMagasins(pdv: DataFrame, debut: String, fin: String): DataFrame =
    pdv
      .filter(col("dateid").between(debut, fin))
      .groupBy("magid")
      .agg(
        countDistinct(col("fabid")).as("total_fabricants"),
        countDistinct(col("catid")).as("total_categories"),
        countDistinct(col("prodid")).as("total_produits"),
        count(lit(1)).as("total_ventes"))
      .withColumn("score", round(
        col("total_fabricants") * 0.1 + col("total_categories") * 0.2 +
          col("total_produits") * 0.3 + col("total_ventes") * 0.4, 6))
      .orderBy(col("score").desc, col("magid").asc)
      .limit(10)

  def q5(spark: SparkSession, dir: String): DataFrame = top10AllCats(spark, dir)

  /** Shared body of Q6 (`top-magasins-cat`, views.py:45-60): same shape,
    * category-filtered, weights 0.1/0.3/0.6, no catid distinct. */
  private[graft] def top10Cat(spark: SparkSession, dir: String): DataFrame =
    topMagasinsCat(Tables.pdv(spark, dir), Cat, Debut, Fin)

  /** Parameterized Q6 body (weights 0.1/0.3/0.6), shared with the API layer. */
  private[graft] def topMagasinsCat(pdv: DataFrame, cat: String, debut: String, fin: String): DataFrame =
    pdv
      .filter(col("catid") === cat && col("dateid").between(debut, fin))
      .groupBy("magid")
      .agg(
        countDistinct(col("fabid")).as("total_fabricants"),
        countDistinct(col("prodid")).as("total_produits"),
        count(lit(1)).as("total_ventes"))
      .withColumn("score", round(
        col("total_fabricants") * 0.1 + col("total_produits") * 0.3 +
          col("total_ventes") * 0.6, 6))
      .orderBy(col("score").desc, col("magid").asc)
      .limit(10)

  def q6(spark: SparkSession, dir: String): DataFrame = top10Cat(spark, dir)

  /** Q7 — `nb-mag-cat-date` (views.py:62-71): month-bucketed
    * COUNT(DISTINCT), year predicate. */
  def q7(spark: SparkSession, dir: String): DataFrame =
    Tables.pdv(spark, dir)
      .filter(col("catid") === Cat && year(col("dateid")) === 1995)
      .groupBy(date_format(col("dateid"), "yyyy-MM").as("mois"))
      .agg(countDistinct(col("magid")).as("nbmag"))
      .orderBy("mois")

  /** Q8 — `score-evolution` (views.py:73-88): conditional SUM + safe ratio.
    * `DATE('now')` (views.py:85, bug B4) replaced by the :asof parameter.
    * Arithmetic order mirrors SQLite: (sum * 100.0) / count, in double. */
  def q8(spark: SparkSession, dir: String): DataFrame =
    Tables.pdv(spark, dir)
      .filter(col("catid") === Cat && col("dateid").between(Debut, AsOf))
      .groupBy(date_format(col("dateid"), "yyyy-MM").as("mois"))
      .agg(
        count(lit(1)).as("total_ventes"),
        sum(when(col("fabid") === Fab, 1).otherwise(0)).as("ventes_fab"))
      .withColumn("score_sante", round(
        coalesce(
          col("ventes_fab") * lit(100.0) /
            when(col("total_ventes") === 0, lit(null)).otherwise(col("total_ventes")),
          lit(0.0)), 6))
      .orderBy("mois")

  /** Q9 — `top-1` as intended (views.py:157-190; bug B1 makes the reference
    * endpoint 500 — SURVEY.md §2.10): two-phase top-k semi-join. Phase 1 is
    * Q5's top-10 ids; phase 2 rescores (weights 0.3/0.6/0.1, views.py:175-177,
    * category-filtered, no date filter — faithful to views.py:179) restricted
    * to those ids via a broadcast left-semi join (≤10 rows on the build side). */
  def q9(spark: SparkSession, dir: String): DataFrame = {
    val top10 = top10AllCats(spark, dir).select("magid")
    Tables.pdv(spark, dir)
      .filter(col("catid") === Cat)
      .join(broadcast(top10), Seq("magid"), "left_semi")
      .groupBy("magid")
      .agg(
        countDistinct(col("fabid")).as("total_fabricants"),
        countDistinct(col("prodid")).as("total_produits"),
        count(lit(1)).as("total_ventes"))
      .withColumn("score", round(
        col("total_produits") * 0.3 + col("total_ventes") * 0.6 +
          col("total_fabricants") * 0.1, 6))
      .orderBy(col("score").desc, col("magid").asc)
      .limit(1)
  }

  /** Q10 — `avg-cat-fab-10-mag` (views.py:118-126, 206-254): Q6's top-10,
    * left-joined with the per-store fabricant distinct-product count
    * (0-filled — the `dict.get(magid, 0)` at views.py:232), percentage per
    * store, and the scalar mean over stores with a nonzero denominator
    * (views.py:234-249). Python's `(best/top)*100` float order is preserved.
    * The scalar is attached via a 1-row crossJoin (broadcast), not a global
    * window — no single-partition shuffle of the row set. */
  def q10(spark: SparkSession, dir: String): DataFrame =
    avgFabTop10(Tables.pdv(spark, dir), Cat, Fab, Debut, Fin)

  /** Collect the ≤10-row phase-1 top-10 ONCE — the composite analogue of
    * the reference materializing `df_top_mag` in pandas (views.py:119/130).
    * Driver-side by design: the frame is bounded at 10 rows, and feeding it
    * back as literals means the fact table is scanned once per phase-2
    * aggregate instead of once per plan reference (Spark has no within-query
    * CTE materialization), and the emptiness guard costs no extra job. */
  private[graft] def collectTop10Cat(pdv: DataFrame, cat: String,
                                     debut: String, fin: String): Seq[(Long, Long)] =
    topMagasinsCat(pdv, cat, debut, fin).select("magid", "total_produits")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))

  /** Parameterized Q10 body — shared with the typed API layer. */
  private[graft] def avgFabTop10(pdv: DataFrame, cat: String, fab: String,
                                 debut: String, fin: String): DataFrame =
    avgFabTop10From(pdv, collectTop10Cat(pdv, cat, debut, fin), cat, fab)

  /** Q10 phase 2 over an already-materialized top-10 (magid, total_produits). */
  private[graft] def avgFabTop10From(pdv: DataFrame, top10Rows: Seq[(Long, Long)],
                                     cat: String, fab: String): DataFrame = {
    val spark = pdv.sparkSession
    import spark.implicits._
    val top10 = top10Rows.toDF("magid", "total_produits")
    val best = pdv
      .filter(col("catid") === cat && col("fabid") === fab)
      .join(broadcast(top10.select("magid")), Seq("magid"), "left_semi")
      .groupBy("magid")
      .agg(countDistinct(col("prodid")).as("nb_produits_fab"))
    val rows = top10
      .join(best, Seq("magid"), "left_outer")
      .withColumn("nb_produits_fab", coalesce(col("nb_produits_fab"), lit(0L)))
      .withColumn("pct_raw",
        col("nb_produits_fab").cast("double") / col("total_produits") * lit(100.0))
    val avgRow = rows.agg(round(coalesce(
      avg(when(col("total_produits") =!= 0, col("pct_raw"))), lit(0.0)), 6).as("average"))
    rows
      .select(col("magid"), col("total_produits"), col("nb_produits_fab"),
        round(col("pct_raw"), 6).as("percentage"))
      .crossJoin(broadcast(avgRow))
      .orderBy("magid")
  }

  /** Q11 — `score-sante-touts-les-mois` (views.py:127-137, 256-339): the
    * three-SQL-queries-plus-Python-loops composite as ONE DataFrame DAG:
    * month spine (sequence/explode) × Q6's top-10 stores, left-joined with
    * the per-(store, month) distinct-product counts (no date filter —
    * faithful to views.py:294), then the dual semantics of views.py:317-335:
    * emitted rows zero-fill empty months, but both means skip them
    * (avg(when(...)) ignores nulls). */
  def q11(spark: SparkSession, dir: String): DataFrame =
    scoreSanteMonths(spark, Tables.pdv(spark, dir), Cat, Fab,
      java.time.LocalDate.parse(Debut), java.time.LocalDate.parse(AsOf))

  /** Parameterized Q11 body — shared with the typed API layer. The spine
    * bounds are typed dates injected as literals (never interpolated into
    * SQL text — reference bug B3 stays fixed at this layer too). */
  private[graft] def scoreSanteMonths(spark: SparkSession, pdv: DataFrame,
      cat: String, fab: String, debut: java.time.LocalDate,
      asOf: java.time.LocalDate): DataFrame =
    scoreSanteMonthsFrom(spark, pdv,
      collectTop10Cat(pdv, cat, debut.toString, asOf.toString), cat, fab, debut, asOf)

  /** Q11 body over an already-materialized top-10 (magid, total_produits). */
  private[graft] def scoreSanteMonthsFrom(spark: SparkSession, pdv: DataFrame,
      top10Rows: Seq[(Long, Long)], cat: String, fab: String,
      debut: java.time.LocalDate, asOf: java.time.LocalDate): DataFrame = {
    import spark.implicits._
    val top10 = top10Rows.toDF("magid", "total_produits")
    val perMonth = pdv
      .filter(col("catid") === cat && col("fabid") === fab)
      .join(broadcast(top10.select("magid")), Seq("magid"), "left_semi")
      .groupBy(col("magid"), date_format(col("dateid"), "yyyy-MM").as("mois_annee"))
      .agg(countDistinct(col("prodid")).as("nb"))
    val spine = spark.range(1)
      .select(explode(sequence(
        lit(java.sql.Date.valueOf(debut)),
        lit(java.sql.Date.valueOf(asOf)),
        expr("interval 1 month"))).as("m"))
      .select(date_format(col("m"), "yyyy-MM").as("mois_annee"))
    val monthly = spine
      .crossJoin(broadcast(top10))
      .join(perMonth, Seq("magid", "mois_annee"), "left_outer")
      .groupBy("mois_annee")
      .agg(avg(when(col("nb").isNotNull && col("total_produits") =!= 0,
        col("nb").cast("double") / col("total_produits") * lit(100.0))).as("avg_raw"))
    val avgRow = monthly.agg(round(coalesce(avg(col("avg_raw")), lit(0.0)), 6).as("average"))
    monthly
      .select(col("mois_annee"),
        round(coalesce(col("avg_raw"), lit(0.0)), 6).as("avg_percentage"))
      .crossJoin(broadcast(avgRow))
      .orderBy("mois_annee")
  }

  /** All-category top-10 magids, materialized once (Top1's phase 1). */
  private[graft] def collectTop10Magids(pdv: DataFrame, debut: String, fin: String): Seq[Long] =
    topMagasins(pdv, debut, fin).select("magid").collect().toSeq.map(_.getLong(0))

  /** Q11's top-10 uses the wider window debut..asof (views.py:131). */
  private[graft] def top10CatAsOf(spark: SparkSession, dir: String): DataFrame =
    topMagasinsCat(Tables.pdv(spark, dir), Cat, Debut, AsOf)
}
