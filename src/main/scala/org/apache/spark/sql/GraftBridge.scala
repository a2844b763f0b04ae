package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters.
  * Spark 4 removed the public `new Column(expr)` constructor; custom Catalyst
  * expressions (graft.functions.*) still need Column wrappers, and the
  * sanctioned pattern for extension libraries is a shim in the sql package.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
