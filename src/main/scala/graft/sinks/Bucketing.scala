package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support (SURVEY §4): pre-shuffle once at write time
  * so repeated fact⋈fact joins on the bucket key plan with NO exchange
  * on either side — at 100 TB the dominant cost of a big join is the
  * shuffle, and bucketing amortizes it across every downstream join,
  * aggregation, and incremental batch keyed the same way.
  *
  * (The ClickHouse analog is the MergeTree ORDER BY key making point
  * and merge lookups cheap; in Spark the contract is bucket files +
  * catalog metadata.)
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two tables bucketed on the same key; with matching bucket
    * counts Catalyst plans a SortMergeJoin with zero Exchange nodes.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
