package graft

import org.apache.spark.sql.functions._

import graft.functions.{Md5Expressions, ShingleExpressions, TextCountExpressions}

/** The SQL function surface (GraftFunctions.register /
  * GraftExtensions): every registered function must agree exactly with
  * its Column-API twin over the fixture corpus. */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val docs = {
    GraftFunctions.register(spark)
    Tables.load(spark, Sf, "documents").limit(100).cache()
  }

  test("SQL token/alpha counts equal the Column API over the fixture corpus") {
    val both = docs.select(
      expr("graft_ws_token_count(text)").as("sql_ws"),
      TextCountExpressions.ws_token_count(col("text")).as("api_ws"),
      expr("graft_re_token_count(text)").as("sql_re"),
      TextCountExpressions.re_token_count(col("text")).as("api_re"),
      expr("graft_alpha_count(text)").as("sql_al"),
      TextCountExpressions.alpha_count(col("text")).as("api_al"))
    assert(both.filter(
      col("sql_ws") =!= col("api_ws") ||
      col("sql_re") =!= col("api_re") ||
      col("sql_al") =!= col("api_al")).isEmpty)
  }

  test("SQL md5 key and shingles equal the Column API; literal n respected") {
    val both = docs.select(
      expr("graft_md5_key28(text)").as("sql_k"),
      Md5Expressions.md5_key28(col("text")).as("api_k"),
      expr("graft_shingles(text, 2)").as("sql_s2"),
      ShingleExpressions.shingles(col("text"), 2).as("api_s2"),
      expr("graft_shingles(text)").as("sql_s3"),
      ShingleExpressions.shingles(col("text"), 3).as("api_s3"))
    assert(both.filter(
      col("sql_k") =!= col("api_k") ||
      not(col("sql_s2") === col("api_s2")) ||
      not(col("sql_s3") === col("api_s3"))).isEmpty)
  }

  test("registered functions run inside a full spark.sql statement") {
    GraftFunctions.register(spark)
    Tables.load(spark, Sf, "documents").createOrReplaceTempView("docs_ext")
    val row = spark.sql(
      """SELECT lang, SUM(graft_ws_token_count(text)) AS toks
        |FROM docs_ext GROUP BY lang ORDER BY lang""".stripMargin).collect()
    assert(row.length == 5 && row.forall(_.getLong(1) > 0))
  }

  test("non-string SQL arguments fail analysis, not at runtime") {
    GraftFunctions.register(spark)
    Tables.load(spark, Sf, "documents").createOrReplaceTempView("docs_ext2")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_md5_key28(doc_id) FROM docs_ext2").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_shingles(doc_id, 2) FROM docs_ext2").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("type"))
  }

  test("graft_shingles accepts any constant integral width expression") {
    val both = docs.select(
      expr("graft_shingles(text, 1 + 1)").as("sql_sum"),
      expr("graft_shingles(text, CAST(2 AS BIGINT))").as("sql_cast"),
      ShingleExpressions.shingles(col("text"), 2).as("api_s2"))
    assert(both.filter(
      not(col("sql_sum") === col("api_s2")) ||
      not(col("sql_cast") === col("api_s2"))).isEmpty)
  }

  test("graft_shingles rejects bad widths at analysis time with its own message") {
    GraftFunctions.register(spark)
    Tables.load(spark, Sf, "documents").createOrReplaceTempView("docs_ext3")
    def failureMessage(sql: String): String = {
      val t = intercept[Throwable](spark.sql(sql).collect())
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null).mkString(" | ")
    }
    // out of range (0 and MaxShingleWidth+1), NULL, and a non-constant
    // column width must all fail analysis with the graft_shingles context,
    // never as a bare per-task runtime throw
    assert(failureMessage("SELECT graft_shingles(text, 0) FROM docs_ext3")
      .contains("must be in [1, 64]"))
    assert(failureMessage("SELECT graft_shingles(text, 65) FROM docs_ext3")
      .contains("must be in [1, 64]"))
    assert(failureMessage("SELECT graft_shingles(text, NULL) FROM docs_ext3")
      .contains("graft_shingles"))
    assert(failureMessage("SELECT graft_shingles(text, doc_id) FROM docs_ext3")
      .contains("constant integer"))
  }

  test("GraftExtensions injects the same builder list") {
    // the extensions class and runtime registrar must share one source of
    // truth; a drift here would make spark.sql behavior depend on how the
    // session was built
    val names = GraftFunctions.all.map(_._1)
    assert(names.distinct.size == names.size)
    assert(names.toSet == Set("graft_ws_token_count", "graft_re_token_count",
      "graft_alpha_count", "graft_md5_key28", "graft_shingles"))
  }
}
