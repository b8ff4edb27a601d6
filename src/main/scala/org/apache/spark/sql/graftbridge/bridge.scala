package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the private[sql] Column<->Expression converters —
  * the supported way for third-party Catalyst expressions to expose a
  * Column API in Spark 4 (the alternative, FunctionRegistry + expr(),
  * is also wired up in graft.functions.VectorOps.register).
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
