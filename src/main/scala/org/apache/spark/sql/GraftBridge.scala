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

  /** Register a function builder on a LIVE session (the extensions-injection
    * path only applies at session construction; this covers
    * already-running sessions, e.g. notebook/REPL attach).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
