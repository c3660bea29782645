package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The at-rest layout the engine prescribes for the fact table at 100 TB
  * (SURVEY.md §4 "partition pruning"): parquet partitioned by month of
  * `dateid` (`mois=yyyy-MM/`), so every month-bucketed or date-windowed
  * query (Q7/Q8/Q11 shapes) prunes to the touched months at planning time
  * instead of scanning the full fact.
  *
  * At test scale this materializes the pdv view once; at production scale
  * this is the ingest sink layout (S4) — written once, pruned by every
  * reader. Hive-style directory partitioning is what Spark's
  * `PartitioningAwareFileIndex` prunes statically, and dynamic partition
  * pruning handles join-driven date predicates.
  */
object PartitionedLayout {

  /** Write pdv partitioned by month. `maxRecordsPerFile` would bound file
    * sizes at scale; omitted here (tiny fixtures). */
  def writeMonthPartitioned(spark: SparkSession, sfDir: String, outDir: String): Unit =
    Tables.pdv(spark, sfDir)
      .withColumn("mois", date_format(col("dateid"), "yyyy-MM"))
      .write
      .mode("overwrite")
      .partitionBy("mois")
      .parquet(outDir)

  /** Read back; `mois` is a partition column — predicates on it prune
    * directories before any file is opened. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Q7 over the partitioned layout: the `mois` predicate prunes to the 12
    * months of the requested year. Same result as the view-based Q7. */
  def q7Partitioned(spark: SparkSession, dir: String, annee: Int): DataFrame =
    read(spark, dir)
      .filter(col("catid") === "STANDARD" && col("mois").startsWith(f"$annee%04d-"))
      .groupBy("mois")
      .agg(countDistinct(col("magid")).as("nbmag"))
      .orderBy("mois")
}
