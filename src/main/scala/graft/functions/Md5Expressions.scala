package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-derived keys for the oracle-reproducible dedup family.
  *
  * The column formulations — `conv(substring(md5(s), k, 1), 16, 10)` per
  * hex digit — are semantically what the DuckDB oracles mirror, but they
  * materialize a 32-char hex string per value and then run one interpreted
  * base-conversion per digit (x2 evaluated 16 of them per token: ~4.3M
  * conv+substring evals at sf0.1). These expressions read the same bits
  * straight out of the digest bytes in one eval per row. Bit-equality with
  * the hex formulations is pinned by PipelineSpec; the DuckDB oracles are
  * unchanged (they keep the explicit hex arithmetic).
  *
  * MessageDigest is per-thread (md5 instances are not thread-safe).
  */
object Md5Expressions {

  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  private def md5(bytes: Array[Byte]): Array[Byte] = {
    val d = digests.get()
    d.reset()
    d.digest(bytes)
  }

  /** First 7 hex digits of md5(s) as a 28-bit long —
    * ≡ `conv(substring(md5(s), 1, 7), 16, 10)`. The minhash shingle key. */
  case class Md5Key28(child: Expression)
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    // analysis-time type check: the SQL registration (GraftFunctions)
    // would otherwise let non-string args through to a per-task
    // ClassCastException
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val h = md5(input.asInstanceOf[UTF8String].getBytes)
      // hex digit k (0-based) = high/low nibble of byte k/2; 7 digits = 28 bits
      var v = 0L
      var k = 0
      while (k < 7) {
        val nibble =
          if ((k & 1) == 0) (h(k >> 1) >> 4) & 0xF
          else h(k >> 1) & 0xF
        v = (v << 4) | nibble
        k += 1
      }
      v
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** The 64 simhash bits of md5(s) (one bit per (hex digit k, bit j%4):
    * bit j = (digit(j/4) >> (j%4)) & 1), packed as 4 little-endian 16-bit
    * ints: chunk c = Σ_{j∈[0,16)} bit(16c+j) << j. ≡ deriving the bits from
    * `conv(substring(md5(s), j/4+1, 1), 16, 10)` as the x2 oracle does. */
  case class Md5Bits4x16(child: Expression)
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val h = md5(input.asInstanceOf[UTF8String].getBytes)
      val out = new Array[Any](4)
      var c = 0
      while (c < 4) {
        var cv = 0
        var j = 0
        while (j < 16) {
          val bit = 16 * c + j
          val digit =
            if ((bit & 4) == 0) (h(bit >> 3) >> 4) & 0xF // even hex index: high nibble
            else h(bit >> 3) & 0xF
          if (((digit >> (bit & 3)) & 1) == 1) cv |= 1 << j
          j += 1
        }
        out(c) = cv
        c += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def md5_key28(s: Column): Column =
    ColumnBridge.column(Md5Key28(ColumnBridge.expression(s)))

  def md5_bits_4x16(s: Column): Column =
    ColumnBridge.column(Md5Bits4x16(ColumnBridge.expression(s)))
}
