package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of queries once each (args = query names; no
  * args = all), printing per-query seconds as they finish. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[bench-one] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      } catch {
        case e: Throwable => println(s"[bench-one] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
