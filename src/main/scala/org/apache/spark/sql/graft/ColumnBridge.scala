package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Expression converters (the
  * classic-mode `ExpressionUtils`). Lives under `org.apache.spark.sql`
  * solely for access; the alternative — registering every custom
  * expression as a session temp function — couples Column construction
  * to a thread-local active session (wrong registry under multi-session
  * use) and pays a synchronized registry write per construction.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
