package graft

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Row}

/** The §2.9 canonicalization rules (SURVEY.md) as a shared prod/test util:
  * rows sorted by all columns ascending (NULLS FIRST), fields rendered as
  * strings (doubles already rounded *inside* the declared queries), rows
  * serialized as 0x1F-joined UTF-8 fields and 0x0A-joined rows, SHA-256
  * hex digest. Golden tests pin these hashes so regressions diff readably
  * without a DuckDB install. */
object Canonical {

  def render(v: Any): String = v match {
    case null => "\u0000NULL"
    case d: java.sql.Date => d.toString
    case t: java.sql.Timestamp => t.toString
    case f: Float => f.toDouble.toString
    case x => x.toString
  }

  /** Deterministic serialization of a result set (collects — use only on
    * canonical query outputs, which are top-k/aggregate-sized). */
  def serialize(df: DataFrame): String = {
    val cols = df.columns.sorted
    val rows = df.select(cols.head, cols.tail.toIndexedSeq: _*).collect()
      .map((r: Row) => (0 until r.length).map(i => render(r.get(i))).mkString("\u001F"))
      .sorted
    rows.mkString("\n")
  }

  def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def hash(df: DataFrame): String = sha256(serialize(df))

  /** Presentation-sort elision (VERDICT r8 task 7). Most declared queries
    * end in an `orderBy` that exists ONLY so the driver's hash compare and
    * the golden hashes see a canonical row order — at 100 TB those global
    * sorts (an extra rangepartitioning exchange + full sort of the output)
    * would be dropped or replaced by write-time bucketing. Queries whose
    * output is corpus-sized route their terminal sort through
    * [[presentationOrder]]; setting this SQLConf key to false yields the
    * production plan (no range exchange), and EngineSurfaceSpec pins
    * exactly that. Default ON: the oracle/golden contract requires
    * canonical order. Top-k queries do NOT use this — their
    * `orderBy+limit` is semantics, not presentation.
    *
    * The toggle is a per-SESSION runtime conf, not a JVM global (VERDICT
    * r9 task 7): a concurrent server hands each request its own
    * `spark.newSession()` clone and flips the key there, so one request
    * serving production plans cannot race another serving canonical ones
    * — there is no shared mutable state in the canonicalization path. */
  val PresentationSortsKey = "spark.graft.presentationSorts"

  def presentationSorts(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.get(PresentationSortsKey, "true").toBoolean

  def presentationOrder(df: DataFrame, first: Column, rest: Column*): DataFrame =
    if (presentationSorts(df.sparkSession)) df.orderBy((first +: rest): _*) else df
}
