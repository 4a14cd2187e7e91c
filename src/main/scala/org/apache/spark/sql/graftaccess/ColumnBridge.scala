package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge (the SparkListenerAccess idiom for
  * `private[sql]`): Spark 4's public Column wraps a ColumnNode, so a
  * native Catalyst expression can only become a Column through the
  * `private[sql]` ExpressionUtils. Wrapping it here lets graft's native
  * expressions ([[graft.functions.QuantizeI64]] etc.) build Columns
  * DIRECTLY — no session-bound function registry needed at the call
  * site, so a pure `Column => Column` helper (e.g. DedupQueries.quantize)
  * can return a native expression without every caller having to run
  * GraftFunctions.register first. Wire-level stability: these two
  * conversions are the same calls `functions._` itself compiles to. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
