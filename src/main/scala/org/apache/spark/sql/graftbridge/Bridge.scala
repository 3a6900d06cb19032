package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 backs `Column` by `ColumnNode` and hides the Expression
  * conversion behind `private[sql]` (`classic.ExpressionUtils`), so
  * libraries adding native Catalyst expressions expose it from a
  * package under `org.apache.spark.sql` — the same access pattern
  * Spark-extension projects use (see SNIPPETS.md [1]/[3]).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
