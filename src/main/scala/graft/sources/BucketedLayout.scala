package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Bucketed at-rest layout for the co-located fact⋈dimension join
  * (SURVEY.md §4 join strategy; the 100 TB posture for `pdv` =
  * `lineitem ⋈ part`): both tables bucketed on the join key with the same
  * bucket count, so the sort-merge join reads bucket-aligned files and
  * needs NO shuffle exchange on either side — at 100 TB that removes the
  * two largest exchanges in the whole workload.
  *
  * Bucketing requires the table catalog (`bucketBy` + `saveAsTable`);
  * tables land in the session's warehouse dir. The no-Exchange property is
  * asserted by test against the executed plan.
  */
object BucketedLayout {
  val Buckets = 8
  val LineitemTable = "graft_lineitem_bucketed"
  val PartTable = "graft_part_bucketed"

  def writeBucketed(spark: SparkSession, sfDir: String): Unit = {
    Tables.load(spark, sfDir, "lineitem")
      .write.mode("overwrite")
      .bucketBy(Buckets, "l_partkey").sortBy("l_partkey")
      .saveAsTable(LineitemTable)
    Tables.load(spark, sfDir, "part")
      .write.mode("overwrite")
      .bucketBy(Buckets, "p_partkey").sortBy("p_partkey")
      .saveAsTable(PartTable)
  }

  /** The pdv join over the bucketed tables — same columns as
    * [[Tables.pdv]], planned shuffle-free when autoBucketedScan kicks in. */
  def pdvBucketed(spark: SparkSession): DataFrame =
    Tables.pdvOf(spark.table(LineitemTable), spark.table(PartTable))
}
