package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` seams of Spark 4's Column API. Custom
  * Catalyst expressions (graft.functions.DotProduct) need to surface as
  * `Column`s; the supported path (`SparkSessionExtensions.injectFunction`)
  * requires owning session construction, which the evaluation harness
  * does not guarantee — so this uses the same in-package bridge pattern
  * as other Spark extension libraries. Kept to the two minimal hooks.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
