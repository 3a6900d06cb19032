package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational
import graft.flow.FlowAnalytics

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ FlowAnalytics.queries ++
      graft.text.TextAnalytics.queries ++ graft.dedup.Dedup.queries ++
      graft.ann.Knn.queries ++ graft.ann.Pca.queries ++
      graft.graph.GraphOps.queries ++ graft.graph.GraphSearch.queries ++
      graft.multimodal.Multimodal.queries ++
      graft.streaming.StreamingOps.queries ++ graft.operators.Joins.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ FlowAnalytics.oracleSql ++
      graft.text.TextAnalytics.oracleSql ++ graft.dedup.Dedup.oracleSql ++
      graft.ann.Knn.oracleSql ++ graft.ann.Pca.oracleSql ++
      graft.graph.GraphOps.oracleSql ++ graft.graph.GraphSearch.oracleSql ++
      graft.multimodal.Multimodal.oracleSql ++
      graft.streaming.StreamingOps.oracleSql ++ graft.operators.Joins.oracleSql
}
