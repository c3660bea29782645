package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query names — default: all]
    val (sfDir, outDir) = (args(0), args(1))
    // blank tokens are dropped so a "" third arg means "all", not the
    // impossible query named "" (which would silently write nothing)
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").filter(_.nonEmpty).toSet
      else Set.empty
    require(only.isEmpty || only.subsetOf(SparkEntry.queries.keySet),
      s"unknown queries requested: ${(only -- SparkEntry.queries.keySet).mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MEM_FRACTION: same spill-rehearsal knob as Bench — a
    // constrained run must also prove results UNCHANGED, which is this
    // dump + the parity compare under the same squeezed memory pool.
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = sys.env.get("SPARK_GRAFT_MEM_FRACTION")
      .fold(builder)(f => builder.config("spark.memory.fraction", f))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Fail fast on fixture-schema drift (footer reads only) — one explicit
    // error beats 159 queries against corrupted decodes.
    Tables.validate(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Fixture preflight metadata: the ENGINE's decoded view of the base
    // tables (row counts; events ts range in epoch-micros). The parity
    // harness compares these against the oracle's native read of the same
    // parquet, so an engine-vs-oracle fixture disagreement — e.g. the r7
    // ts-unit drift, where every Spark timestamp was 1000× off while
    // DuckDB read the file correctly — fails one explicit preflight check
    // instead of 27 opaque per-query hash mismatches.
    locally {
      import org.apache.spark.sql.functions.{count, max, min, unix_micros}
      val counts = Tables.base.map { t =>
        s""""$t": ${Tables.load(spark, sfDir, t).count()}"""
      }.mkString("{", ", ", "}")
      val ev = Tables.load(spark, sfDir, "events")
        .agg(unix_micros(min(org.apache.spark.sql.functions.col("ts"))).as("lo"),
             unix_micros(max(org.apache.spark.sql.functions.col("ts"))).as("hi"))
        .head()
      Files.writeString(Paths.get(s"$outDir/_fixture_meta.json"),
        s"""{"counts": $counts, "events_ts_min_us": ${ev.getLong(0)}, "events_ts_max_us": ${ev.getLong(1)}}""")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
