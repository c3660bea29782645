package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for stage-level profiling (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    import graft.pipeline.TextAnalysis
    val sets = docs.select(col("doc_id"),
      array_distinct(TextAnalysis.shingles3(TextAnalysis.tokens(col("text")))).as("sh"))
      .withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)
      .select(col("doc_id"), col("sz"), transform(col("sh"), s => xxhash64(s)).as("shh"))

    time("sets count")(sets.count())
    time("sets count again")(sets.count())
    val ex = sets.select(col("doc_id"), col("sz"), explode(col("shh")).as("sg"))
    time("ex count")(ex.count())
    val a = ex.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("sg"))
    val b = ex.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"), col("sg"))
    val joined = a.join(b, Seq("sg")).filter(col("doc_a") < col("doc_b"))
    time("raw join count")(joined.count())
    val grouped = joined.groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("common"), max(col("sz_a")).as("sz_a"), max(col("sz_b")).as("sz_b"))
    time("grouped count")(grouped.count())
    val cachedSets = sets.cache()
    time("cached sets count")(cachedSets.count())
    val ex2 = cachedSets.select(col("doc_id"), col("sz"), explode(col("shh")).as("sg"))
    val a2 = ex2.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("sg"))
    val b2 = ex2.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"), col("sg"))
    time("cached join+group count")(
      a2.join(b2, Seq("sg")).filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common")).count())
    spark.stop()
  }
}
