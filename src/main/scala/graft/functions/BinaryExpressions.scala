package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native binary-payload expressions — the [[TextCountExpressions]]
  * discipline applied to media bytes: one tight scan per payload, no
  * per-byte Column arithmetic (a higher-order `aggregate(transform(...))`
  * formulation allocates and interprets per element; these cost one
  * virtual call per ROW). */
object BinaryExpressions {

  /** Per-frame unsigned-byte sums of a binary payload split into complete
    * `frameBytes`-sized frames (trailing partial frame dropped — the eq83
    * frame geometry). The "luma proxy" a scene-cut detector thresholds;
    * exact integers, so DuckDB re-derives it from `hex(encode(text))`. */
  case class FrameByteSums(child: Expression, frameBytes: Int)
      extends UnaryExpression with CodegenFallback
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    require(frameBytes > 0)
    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      val n = b.length / frameBytes
      val out = new Array[Long](n)
      var f = 0
      while (f < n) {
        var s = 0L
        var i = f * frameBytes
        val end = i + frameBytes
        while (i < end) { s += (b(i) & 0xFF); i += 1 }
        out(f) = s
        f += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def frame_byte_sums(bin: Column, frameBytes: Int): Column =
    ColumnBridge.column(FrameByteSums(ColumnBridge.expression(bin), frameBytes))
}
