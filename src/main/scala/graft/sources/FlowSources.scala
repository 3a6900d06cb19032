package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.flow.FlowSchema

/** Read-side sources (SURVEY §2 A10): the warehouse reader over the
  * day-partitioned `nflows` layout, and a JSON-lines flow source for
  * collectors that export JSON instead of nfdump CSV (goflow/vflow
  * style exporters emit one JSON object per flow).
  */
object FlowSources {

  /** Warehouse scan with a date range — the `date=` partition layout
    * written by PartitionedParquetSink turns this into partition
    * pruning (directories outside the range are never listed into
    * the scan), which is what makes "last 24h over 100 TB" cheap.
    */
  def nflows(spark: SparkSession, root: String,
      fromDate: String, toDate: String): DataFrame =
    spark.read.parquet(root)
      .where(col("date") >= fromDate && col("date") <= toDate)

  /** JSON-lines flow records with the nflows schema (schema declared,
    * not inferred — no sampling pass over the corpus; malformed lines
    * dropped like the CSV path).
    */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(FlowSchema.nflowsSchema)
      .option("mode", "DROPMALFORMED")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSS]")
      .json(path)
      .where(col("ts").isNotNull && col("te").isNotNull)

  /** Streaming variant of the JSON source. */
  def jsonlStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(FlowSchema.nflowsSchema)
      .option("mode", "DROPMALFORMED")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSS]")
      .option("maxFilesPerTrigger", "64")
      .json(dir)
      .where(col("ts").isNotNull && col("te").isNotNull)
}
