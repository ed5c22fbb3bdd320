package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql-private Column ⇄ catalyst Expression converters, the
  * standard extension-point pattern for registering custom codegen
  * expressions (graft.functions.expr.*) without a FunctionRegistry
  * round-trip. Lives in org.apache.spark.sql solely to see `private[sql]`
  * members; keep it to these two one-liners. */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
