package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge for graft's native expressions.
  * Spark 4 made these conversions `private[sql]`
  * (`classic.ExpressionUtils`); declaring the bridge inside the sql
  * package is the standard pattern for third-party Catalyst extensions. */
object GraftExpressionBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
