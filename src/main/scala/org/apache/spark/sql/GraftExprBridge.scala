package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression conversions that
  * Spark 4 hides behind ColumnNode (classic.ExpressionUtils). Lives in
  * the org.apache.spark.sql package solely to satisfy the access
  * qualifier — the standard extension-library technique for exposing
  * custom Catalyst expressions as user-facing Columns.
  */
object GraftExprBridge {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
