package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `sql` package: Spark 4 made Column <-> Expression
  * conversion (`classic.ExpressionUtils`) private[sql], so the engine's
  * custom Catalyst expressions go through this one-file shim.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
