package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Md5Expressions, ShingleExpressions, TextCountExpressions}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get the same
  * codegen-friendly single-pass operators the DataFrame API exposes.
  *
  * Production use (the standard extensions mechanism):
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * For a session that already exists (tests, notebooks),
  * [[GraftFunctions.register]] installs the same builders directly.
  *
  * SQL surface:
  *  - `graft_ws_token_count(text)`  — whitespace token count (≡ eq7's)
  *  - `graft_re_token_count(text)`  — BPE-ish token count
  *  - `graft_alpha_count(text)`     — a-z code-point count
  *  - `graft_md5_key28(s)`          — 28-bit md5-prefix key (eq27/x1's)
  *  - `graft_shingles(text, n)`     — n-token shingle array (n constant
  *    integer in [1, 64]; any foldable integral expression accepted)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  private def oneArg(name: String, f: Expression => Expression)
    : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name, info(name), {
      case Seq(e) => f(e)
      case args => throw new IllegalArgumentException(
        s"$name expects 1 argument, got ${args.length}")
    })

  /** (name, info, builder) for every SQL-exposed native function. The
    * count expressions lowercase their input themselves here (the Column
    * wrappers in [[TextCountExpressions]] do the same), so SQL and
    * DataFrame callers agree. */
  private[graft] val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    oneArg("graft_ws_token_count",
      e => TextCountExpressions.WsTokenCount(lowered(e))),
    oneArg("graft_re_token_count",
      e => TextCountExpressions.ReTokenCount(lowered(e))),
    oneArg("graft_alpha_count",
      e => TextCountExpressions.AlphaCount(lowered(e))),
    oneArg("graft_md5_key28", e => Md5Expressions.Md5Key28(e)),
    ("graft_shingles", info("graft_shingles"), {
      case Seq(text, n) => ShingleExpressions.Shingles(text, shingleWidth(n))
      case Seq(text) => ShingleExpressions.Shingles(text, 3)
      case args => throw new IllegalArgumentException(
        "graft_shingles expects (text[, n]) where n is a constant integer >= 1; got " +
          args.length + " argument(s): " + args.map(_.sql).mkString(", "))
    }))

  /** Analysis-time extraction of graft_shingles' width argument: any
    * foldable integral expression is accepted (`2`, `1+1`, `CAST(2 AS
    * BIGINT)`), folded here, and validated `>= 1` — so a bad width is a
    * query-compile error, never a per-task runtime throw. */
  private def shingleWidth(e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"graft_shingles: n must be a constant integer expression, got ${e.sql}")
    val folded =
      try e.eval(null)
      catch {
        case scala.util.control.NonFatal(t) => throw new IllegalArgumentException(
          s"graft_shingles: n (${e.sql}) could not be evaluated at analysis " +
            s"time: ${t.getMessage}", t)
      }
    val n = folded match {
      case i: Int => i.toLong
      case l: Long => l
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalArgumentException(
        s"graft_shingles: n must be integral, got ${e.sql}" +
          (if (other == null) " (NULL)" else s" of ${e.dataType.sql}"))
    }
    if (n < 1 || n > ShingleExpressions.MaxShingleWidth)
      throw new IllegalArgumentException(
        s"graft_shingles: n must be in [1, ${ShingleExpressions.MaxShingleWidth}], got $n")
    n.toInt
  }

  private def lowered(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Lower(e)

  /** Install into an ALREADY-RUNNING session (the extensions mechanism
    * only applies at session construction). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, infoObj, builder) =>
      org.apache.spark.sql.graftshim.RegistryBridge
        .registerFunction(spark, name, infoObj, builder)
    }
}
