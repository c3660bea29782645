package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** eq78 — schema-drift union reconciliation: two parquet "drops" of the
  * same logical table with different column sets (the day-two reality of
  * any long-lived ingest: a column added, another not yet backfilled)
  * are merged with `unionByName(allowMissingColumns = true)` — missing
  * columns null-fill instead of failing the load — and the result is
  * audited per drop: row counts, null counts for each drifted column,
  * and the recoverable char mass. The union is metadata-only (no
  * shuffle); the audit is one aggregate. At 100 TB this is how a reader
  * spans historical partitions written under older schemas.
  */
object SchemaDrift {

  def eq78(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    // the two historical layouts, derived from the fixture table: a
    // legacy drop predating `source`/`n_chars`, a modern drop that
    // dropped `lang` after language-id moved downstream
    val legacy = docs.select(col("doc_id"), col("text"), col("lang"))
      .withColumn("drop_id", lit("legacy"))
    val modern = docs.select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .withColumn("drop_id", lit("modern"))
    legacy.unionByName(modern, allowMissingColumns = true)
      .groupBy("drop_id")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("lang").isNull.cast("long")).as("null_lang"),
        sum(col("source").isNull.cast("long")).as("null_source"),
        sum(coalesce(col("n_chars"), lit(0L))).as("total_chars"))
      .orderBy("drop_id")
  }
}
