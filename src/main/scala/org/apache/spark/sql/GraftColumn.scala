package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column⇄Expression converters — Spark 4 moved
  * `Column` to the connect-compatible sql-api (a `ColumnNode` wrapper),
  * and the factory that wraps a raw Catalyst `Expression` is
  * `private[sql]`. Custom expressions that carry non-Expression
  * constructor state (the WordPiece vocabulary map) cannot go through
  * the string-based `expr()`/FunctionRegistry path, hence this
  * one-object shim in the org.apache.spark.sql package — the
  * GraftListenerBus pattern. */
object GraftColumn {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = ExpressionUtils.expression(c)
}
