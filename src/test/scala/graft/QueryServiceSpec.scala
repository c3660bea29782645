package graft

import graft.api.QueryService
import graft.api.QueryService.{ApiError, Params}

class QueryServiceSpec extends SparkSpec {

  test("unknown query type -> 400 UnknownQueryType (views.py:113-114)") {
    val r = QueryService.run(spark, Sf, "nope", Params())
    assert(r == Left(ApiError.UnknownQueryType("nope")))
  }

  test("missing param -> 400 MissingParam (views.py:143-145)") {
    val r = QueryService.run(spark, Sf, "cat", Params())
    assert(r == Left(ApiError.MissingParam("catID")))
    val r2 = QueryService.run(spark, Sf, "top-magasins", Params(debut = Some("1995-01-01")))
    assert(r2 == Left(ApiError.MissingParam("fin")))
  }

  test("missing database -> 404 NotFound (views.py:92-96)") {
    val r = QueryService.run(spark, "/nonexistent/dir", "cat", Params(catId = Some("STANDARD")))
    assert(r == Left(ApiError.NotFound("Base de données")))
  }

  test("empty phase-1 result in a composite -> 404 EmptyResult (views.py:122-123)") {
    val r = QueryService.run(spark, Sf, "avg-cat-fab-10-mag", Params(
      catId = Some("NO_SUCH_CAT"), fabId = Some("Brand#12"),
      debut = Some("1995-01-01"), fin = Some("1996-12-31")))
    assert(r.left.toOption.exists(_.isInstanceOf[ApiError.EmptyResult]))
  }

  test("parameterized queries agree with the frozen t2 variants") {
    val viaApi = QueryService.run(spark, Sf, "mag-cat", Params(catId = Some("STANDARD")))
      .toOption.get.head().getLong(0)
    val frozen = graft.retail.RetailQueries.q2(spark, Sf).head().getLong(0)
    assert(viaApi == frozen)

    val top = QueryService.run(spark, Sf, "top-magasins-cat", Params(
      catId = Some("STANDARD"), debut = Some("1995-01-01"), fin = Some("1996-12-31")))
      .toOption.get.select("magid").collect().map(_.getLong(0))
    val frozenTop = graft.retail.RetailQueries.q6(spark, Sf)
      .select("magid").collect().map(_.getLong(0))
    assert(top.sameElements(frozenTop))
  }

  test("malformed asOf -> typed 400 InvalidParam, never a parse exception or silent empty result") {
    val r = QueryService.run(spark, Sf, "score-sante-touts-les-mois", Params(
      catId = Some("STANDARD"), fabId = Some("Brand#12"),
      asOf = Some("1998-09-01'), interval 1 month))--")))
    assert(r == Left(ApiError.InvalidParam("asOf", "1998-09-01'), interval 1 month))--")))
  }

  test("data dir with lineitem but missing part -> typed 404, not a raw AnalysisException") {
    val dir = java.nio.file.Files.createTempDirectory("graft_partial").toString
    Tables.load(spark, Sf, "lineitem").write.parquet(s"$dir/lineitem.parquet")
    val r = QueryService.run(spark, dir, "cat", Params(catId = Some("STANDARD")))
    assert(r == Left(ApiError.NotFound("Base de données")))
  }

  test("a genuinely broken plan reports as a typed 500, never as NotFound") {
    import org.apache.spark.sql.AnalysisException
    // arbitrary engine defect -> Internal
    assert(QueryService.mapBuildFailure(new RuntimeException("boom"))
      .isInstanceOf[ApiError.Internal])
    // bad column reference (a planner-visible defect) -> Internal
    val bad = intercept[AnalysisException] {
      Tables.load(spark, Sf, "part")
        .select(org.apache.spark.sql.functions.col("no_such_col")).schema
    }
    assert(QueryService.mapBuildFailure(bad).isInstanceOf[ApiError.Internal])
    // missing source path -> the reference's 404
    val missing = intercept[AnalysisException] {
      spark.read.parquet("/nonexistent/never.parquet").schema
    }
    assert(QueryService.mapBuildFailure(missing) == ApiError.NotFound("Base de données"))
  }

  test("events loads via explicit schema; no session-global nanosAsLong flag") {
    // force-decode ts (LongType over parquet TIMESTAMP(NANOS)) — a
    // limit(1).count() would column-prune the scan and pass even if
    // decoding ts failed at execution
    val ts = Tables.load(spark, Sf, "events")
      .select("ts").limit(1).collect()(0).getTimestamp(0)
    assert(ts.toInstant.atZone(java.time.ZoneOffset.UTC).getYear == 2024,
      s"implausible event timestamp $ts")
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") != "true")
  }

  test("results serialize to records-style JSON (views.py:152-154)") {
    val df = QueryService.run(spark, Sf, "fab-cat", Params(catId = Some("STANDARD"))).toOption.get
    val json = QueryService.toJson(df)
    assert(json.length == 1)
    assert(json.head.contains("\"total_fabricants\":"))
  }
}
