package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ⇄ Expression converters —
  * the supported way for a library to lift a custom Catalyst `Expression`
  * into the public `Column` API in Spark 4.x (where `new Column(expr)` is
  * gone and columns wrap `ColumnNode`s).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
