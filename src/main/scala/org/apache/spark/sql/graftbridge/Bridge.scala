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

  /** Rebuild a checkpointed leaf WITHOUT its inherited `originStats`.
    *
    * `Dataset.checkpoint`/`localCheckpoint` propagate the origin
    * plan's Statistics into the new [[org.apache.spark.sql.execution.LogicalRDD]].
    * In an ITERATIVE loop whose round plan references the previous
    * round's table k >= 2 times (triangle enumeration: 3 references),
    * sizeInBytes therefore compounds as L*k^n across n rounds — by
    * round ~6 the stats are million-bit BigIntegers and the planner
    * spends HOURS multiplying them (observed: a 4-truss peel at
    * sf0.01 stuck in `SizeInBytesOnlyStatsPlanVisitor`). Dropping
    * originStats resets the leaf to `defaultSizeInBytes`, making
    * every round's stats cost constant; runtime join planning is
    * unaffected (AQE re-plans from actual sizes). Partitioning and
    * ordering advertisements are preserved.
    */
  def freshStatsLeaf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val clean = org.apache.spark.sql.execution.LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(spark, None, None)
        org.apache.spark.sql.classic.Dataset.ofRows(spark, clean)
      case _ => df
    }
}
