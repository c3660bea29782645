package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Error-tolerant JSONL document ingest — the "raw crawl drop" boundary of
  * a corpus pipeline. Real 100 TB crawl dumps always carry a tail of
  * malformed lines (truncated flushes, encoding damage, stray log lines);
  * the pipeline must quarantine them with exact accounting, not die and
  * not silently drop.
  *
  * Spark-first shape: `spark.read.schema(...).json` in PERMISSIVE mode
  * with `columnNameOfCorruptRecord` — unparseable lines surface as rows
  * whose data fields are null and whose corrupt column holds the raw line,
  * so quarantine is a plain projection, the scan stays a single narrow
  * pass (no pre-validation pass), and the malformed payloads can be routed
  * to a quarantine sink for replay. No reference counterpart (the
  * reference's pandas ingest dies on malformed input); extension surface
  * per SURVEY.md §2.8.
  *
  * The fixture keeps corruption clear-cut (syntactically invalid JSON
  * only), so "corrupt" means the same thing to Spark's Jackson parser and
  * the oracle's `json_valid` — field-level type coercion differences never
  * arise.
  */
object JsonlIngest {

  val fixturePath = "/root/repo/src/test/resources/fixtures/documents.jsonl"

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("_corrupt", StringType)))

  /** Parsed frame: good rows carry (doc_id, text, lang); malformed lines
    * carry the raw text in `_corrupt` with null data fields. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** eq45 (SURVEY.md §2.8): ingest the JSONL fixture and summarize per
    * language, quarantining malformed lines under the `__corrupt__` key —
    * the exact-accounting contract (n_good + n_corrupt = n_lines). */
  def eq45(spark: SparkSession, dir: String): DataFrame =
    summarize(read(spark, fixturePath))

  def summarize(parsed: DataFrame): DataFrame =
    parsed
      // quarantine is decided by the corrupt column, NOT by lang being
      // null — a syntactically valid line with no lang field is a GOOD
      // document with unknown language, and must never be miscounted as
      // corrupt (it would diverge from the oracle's json_valid rule)
      .groupBy(
        when(col("_corrupt").isNotNull, lit("__corrupt__"))
          .otherwise(coalesce(col("lang"), lit("__unknown__"))).as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(length(col("text"))), lit(0L)).as("total_chars"))
      .orderBy("lang")
}
