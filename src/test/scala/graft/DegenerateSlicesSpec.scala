package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusOps, EventOps, TextAnalysis}

/** R10 degenerate-slice pins: statistics that are UNDEFINED on 1-row /
  * zero-variance / zero-mass slices must be NULL — never a Spark 4 ANSI
  * `DIVIDE_BY_ZERO` crash, and NULL identically in the DuckDB oracles
  * (mirrored by NULLIF/CASE on the same denominators). Every case here
  * reproduced a real crash before the guard. At 100 TB these slices are
  * routine: a nation with one order month in the window, a zero-revenue
  * cohort, a corpus slice with one language, a near-empty vocabulary. */
class DegenerateSlicesSpec extends SparkSpec {
  import spark.implicits._

  test("eq91: a single-month nation yields NULL slope/intercept, other nations unaffected") {
    val li = Seq(
      (1L, java.sql.Date.valueOf("1995-03-15"), 10.0, 1L),
      (2L, java.sql.Date.valueOf("1995-03-20"), 20.0, 1L), // same month
      (3L, java.sql.Date.valueOf("1995-01-10"), 10.0, 1L), // GERMANY: two months
      (4L, java.sql.Date.valueOf("1995-02-10"), 30.0, 1L))
      .toDF("l_orderkey", "l_shipdate", "l_extendedprice", "l_quantity")
      .withColumn("l_discount", lit(0.0))
    val o = Seq((1L, 5L), (2L, 5L), (3L, 6L), (4L, 6L)).toDF("o_orderkey", "o_custkey")
    val c = Seq((5L, 7L), (6L, 8L)).toDF("c_custkey", "c_nationkey")
    val n = Seq((7L, "FRANCE"), (8L, "GERMANY")).toDF("n_nationkey", "n_name")
    val r = graft.star.StarQueries.trendSlopesDf(li, o, c, n).collect()
      .map(row => row.getString(0) -> row).toMap
    assert(r("FRANCE").isNullAt(2) && r("FRANCE").isNullAt(3),
      "one distinct month -> OLS undefined -> NULL")
    assert(!r("GERMANY").isNullAt(2), "two months -> a real slope")
    assert(math.abs(r("GERMANY").getDouble(2) - 2000.0) < 1e-6,
      "GERMANY slope: (3000-1000) cents across one month")
  }

  test("eq62: a one-token vocabulary yields NULL slope and r2") {
    val docs = Seq((0L, "hello", "en", "s0", 5L), (1L, "hello", "en", "s0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = CorpusOps.zipfSlopeDf(docs).head()
    assert(r.getLong(0) == 1L)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("eq62: a uniform-count vocabulary yields a slope but NULL r2") {
    // distinct ranks -> denX > 0; identical counts -> denY = 0 -> the
    // correlation (not the slope) is the undefined statistic
    val docs = Seq((0L, "aa bb cc dd", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = CorpusOps.zipfSlopeDf(docs).head()
    assert(r.getLong(0) == 4L)
    assert(!r.isNullAt(1) && r.getDouble(1) == 0.0,
      "equal counts regress to slope 0 over distinct ranks")
    assert(r.isNullAt(2), "zero count variance -> r2 undefined")
  }

  test("eq116: a 1x1 contingency yields NULL Cramer's V (chi2 and MI still defined)") {
    val docs = (0L until 6L).map(i => (i, s"text number $i word", "en", "s0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.assocAuditDf(docs).head()
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L) // one lang, one source
    assert(r.getDouble(4) == 0.0, "single-cell MI is 0")
    assert(r.getDouble(5) == 0.0, "single-cell chi2 is 0")
    assert(r.isNullAt(6), "min(r-1,c-1)=0 -> Cramer's V undefined")
  }

  test("eq120: a zero-revenue nation yields NULL gini and top-decile ppm") {
    val o2 = Seq((1L, 5L, 0.0), (2L, 5L, 0.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val c = Seq((5L, 7L)).toDF("c_custkey", "c_nationkey")
    val n = Seq((7L, "FRANCE")).toDF("n_nationkey", "n_name")
    val r = graft.star.StarQueries.giniConcentrationDf(o2, c, n).head()
    assert(r.getLong(2) == 0L, "total cents 0")
    assert(r.isNullAt(3) && r.isNullAt(4),
      "concentration of zero mass is undefined -> NULL, not a crash")
  }

  test("eq113: a single-doc language yields NULL spearman, multi-doc langs unaffected") {
    val docs = Seq(
      (0L, "one solitary document", "ro", "s0", 21L),
      (1L, "first english text here", "en", "s0", 23L),
      (2L, "second, much longer english document text!", "en", "s0", 42L),
      (3L, "third.", "en", "s0", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.rankCorrDf(docs).collect()
      .map(row => row.getString(0) -> row).toMap
    assert(r("ro").getLong(1) == 1L && r("ro").isNullAt(2))
    assert(!r("en").isNullAt(2), "3-doc slice has a defined rank correlation")
  }
}
