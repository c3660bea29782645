package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge. Spark 4's Column API is
  * Connect-decoupled and the classic converters are `private[sql]`, so this
  * one-file shim lives under the `org.apache.spark.sql` namespace — the
  * conventional pattern for libraries that ship custom Catalyst expressions
  * against classic Spark. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
