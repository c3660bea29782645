package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Probe expressions over Spark's mergeable sketches
  * (`org.apache.spark.util.sketch`) — the broadcast-a-sketch side of the
  * "build once, probe everywhere" pattern: a Bloom filter or Count-Min
  * sketch is built with one distributed aggregate (`df.stat.bloomFilter` /
  * `df.stat.countMinSketch`), serialized into the expression, and shipped
  * to every executor inside the plan — no shuffle on the probe side.
  *
  * Both sketches hash with Murmur3_x86_32 at fixed seeds, so probes are
  * deterministic across runs, JVMs and partitionings. `putString` and
  * `mightContainString`/`estimateCount(String)` both delegate to the raw
  * UTF-8 bytes, so probing with `UTF8String.getBytes` is bit-identical to
  * building from Java strings.
  *
  * CodegenFallback like the other native expressions: one virtual call per
  * row, sketch deserialized once per task via the transient lazy val.
  */
object SketchExpressions {

  /** TRUE iff `child` (string) might be in the serialized Bloom filter —
    * false positives possible at the configured fpp, false negatives
    * impossible (the property that makes bloom-prefiltered joins exact
    * after verification). */
  case class BloomMightContain(child: Expression, sketchBytes: Array[Byte])
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = BooleanType
    @transient private lazy val bf: BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(sketchBytes))
    override def nullSafeEval(input: Any): Any =
      bf.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Count-Min estimate of `child`'s (string) frequency — always ≥ the
    * true count; ≤ true + ε·N with probability 1−δ per probe. */
  case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = LongType
    @transient private lazy val cms: CountMinSketch =
      CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))
    override def nullSafeEval(input: Any): Any =
      cms.estimateCount(input.asInstanceOf[UTF8String].getBytes)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def bloom_might_contain(s: Column, bf: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(s), out.toByteArray))
  }

  def cms_estimate(s: Column, cms: CountMinSketch): Column = {
    val out = new java.io.ByteArrayOutputStream()
    cms.writeTo(out)
    ColumnBridge.column(CmsEstimate(ColumnBridge.expression(s), out.toByteArray))
  }
}
