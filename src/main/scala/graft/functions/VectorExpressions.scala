package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused dot product over two numeric array columns, as a native Catalyst
  * expression WITH whole-stage codegen.
  *
  * Why it exists (SURVEY.md §7 "custom Expression for fused cosine only if
  * hot in bench"): the composable formulation
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` is correct but higher-order
  * functions are CodegenFallback — interpreted per element, which measured
  * 150 s for the 2M-pair brute-force near-dup scan at sf0.1. This
  * expression generates a tight multiply-accumulate loop instead (~30×
  * faster end to end) while keeping EXACTLY the same arithmetic: elements
  * widened to double, accumulated left-to-right, so results stay
  * bit-identical to the fold and to the DuckDB oracle's unnest-order SUM.
  *
  * Nulls: null input array → null (BinaryExpression nullSafeEval); array
  * elements are assumed non-null (embedding vectors), as in the fold
  * formulation.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All SRP-LSH band signatures of a vector in ONE per-row eval: bit j of
  * band k is `sign(v · planes(k·bandBits+j)) > 0`, returned as an
  * `array<int>` of `planes.length / bandBits` signatures.
  *
  * Why it exists: the composable form — nBands×bandBits separate
  * [[DotProduct]] calls against `typedLit` hyperplane arrays — builds a
  * 128-dot expression tree whose generated code blows past JIT/codegen
  * limits; eq13 measured 5.7 s at sf0.1 with most of it constant
  * plan/codegen cost. This expression holds the planes as one embedded
  * constant and runs a tight multiply-accumulate loop per row
  * (CodegenFallback — one virtual call per ROW, like the shingle
  * expressions). Accumulation is the same left-to-right double fold as
  * [[DotProduct]], so signatures are bit-identical to the composable form
  * and to the DuckDB oracle's unnest-order SUM. */
case class SrpBandSignatures(child: Expression, planes: Seq[Array[Float]], bandBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val lf = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val nBands = planes.length / bandBits
    val out = new Array[Any](nBands)
    var k = 0
    while (k < nBands) {
      var sig = 0
      var j = 0
      while (j < bandBits) {
        val h = planes(k * bandBits + j)
        // fail loudly on a dim mismatch — silently truncating the loop
        // would compute different signatures than the oracle's spliced
        // hyperplanes without any error surfacing
        require(v.numElements() == h.length,
          s"SRP plane dim ${h.length} != vector dim ${v.numElements()}")
        val n = h.length
        var acc = 0.0
        var i = 0
        while (i < n) {
          val xv = if (lf) v.getFloat(i).toDouble else v.getDouble(i)
          acc += xv * h(i).toDouble
          i += 1
        }
        if (acc > 0) sig |= 1 << j
        j += 1
      }
      out(k) = sig
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** Column wrapper: codegen'd dot product in double precision.
    * (Spark 4's Column is Connect-decoupled; the classic bridge converts
    * Column ⇄ Catalyst Expression.) */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: all SRP band signatures in one pass. */
  def srp_band_signatures(v: Column, planes: Seq[Array[Float]], bandBits: Int): Column =
    ColumnBridge.column(
      SrpBandSignatures(ColumnBridge.expression(v), planes, bandBits))
}
