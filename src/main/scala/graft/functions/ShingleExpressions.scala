package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingling expressions.
  *
  * The composable formulation —
  * `transform(sequence(...), i -> concat_ws(" ", element_at(toks, i+1), ...))`
  * wrapped in `array_distinct` — is semantically right but evaluates an
  * interpreted expression tree per element (HOFs are CodegenFallback):
  * profiled at ~8–26 s per materialization of the sf0.1 corpus, and join
  * plans evaluate it once per side. These expressions do the same work in
  * one tight JVM eval per row (~100× less overhead); they are
  * CodegenFallback themselves, but the fallback cost is one virtual call
  * per ROW, not per element-expression-node.
  *
  * Tokenization matches `split(trim(lower(text)), "\\s+")` exactly
  * (including the leading-empty-token behavior of Java's split on strings
  * with leading separators — trim prevents that case, as in the column
  * formulation).
  */
object ShingleExpressions {

  /** Upper bound on the shingle width accepted by the builders — wide
    * enough for any n-gram scheme in use (eq12/eq29/eq37 use 3), small
    * enough that a typo'd width fails analysis instead of OOMing tasks. */
  val MaxShingleWidth: Int = 64

  private def tokenize(s: UTF8String): Array[String] =
    // UTF8String.toLowerCase (locale-agnostic, = Spark `lower`) then
    // UTF8String.trim (strips 0x20 only, = Spark `trim`) — Java's
    // String.trim/toLowerCase differ (strips all ≤U+0020; default-locale)
    // and would diverge from the column formulation on tab/newline-prefixed
    // or locale-sensitive text
    s.toLowerCase.trim.toString.split("\\s+")

  private def shingleAt(toks: Array[String], i: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder(toks(i))
    var j = 1
    while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
    sb.toString
  }

  /** All n-token shingles of the lowercased text, in order, repeats kept —
    * equivalent to [[graft.pipeline.TextAnalysis.shingles3]]. */
  case class Shingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    require(n >= 1 && n <= MaxShingleWidth,
      s"shingle width must be in [1, $MaxShingleWidth], got $n")
    // analysis-time check for the SQL surface (graft_shingles)
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String])
      if (toks.length < n) new GenericArrayData(Array.empty[Any])
      else {
        val out = new Array[Any](toks.length - n + 1)
        var i = 0
        while (i <= toks.length - n) {
          out(i) = UTF8String.fromString(shingleAt(toks, i, n))
          i += 1
        }
        new GenericArrayData(out)
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Distinct xxhash64(seed=42) values of the n-token shingles — the
    * set-similarity representation (same hash function and seed as Spark's
    * `xxhash64(shingle_string)`, so downstream counts are identical to
    * hashing the string shingles). First-seen order preserved. */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    require(n >= 1 && n <= MaxShingleWidth,
      s"shingle width must be in [1, $MaxShingleWidth], got $n")
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String])
      if (toks.length < n) ArrayData.toArrayData(Array.empty[Long])
      else {
        val seen = new mutable.LinkedHashSet[Long]
        var i = 0
        while (i <= toks.length - n) {
          seen += XxHash64Function.hash(
            UTF8String.fromString(shingleAt(toks, i, n)), StringType, 42L)
          i += 1
        }
        ArrayData.toArrayData(seen.toArray)
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def shingles(text: Column, n: Int = 3): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(text), n))

  def shingle_hashes(text: Column, n: Int = 3): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))
}
