package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column↔Expression converters so graft's
  * native Catalyst expressions (graft.functions.VecExprs) can surface as
  * ordinary Columns. Standard extension-library technique — the classic
  * API keeps these package-private in Spark 4. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
