package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** FunctionRegistry access for an already-running session. The
  * SparkSessionExtensions path (graft.GraftExtensions) is the public
  * mechanism but only applies while a session is being BUILT;
  * `sessionState` is `private[sql]`, so runtime registration needs this
  * one-call shim (same convention as [[ColumnBridge]]). */
object RegistryBridge {
  def registerFunction(spark: SparkSession, name: String, info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}
