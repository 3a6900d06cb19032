package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Day-partitioned parquet sink + TTL retention (SURVEY §2 A3/A5).
  *
  * The Spark analog of the reference's ClickHouse MergeTree layout
  * (`PARTITION BY toDate(ts)` + `TTL ts + INTERVAL 90 DAY`): data
  * lands under `date=YYYY-MM-DD/` directories so time-range queries
  * partition-prune, and retention is a metadata-only partition drop —
  * no rewrite of surviving data, which is what makes TTL viable at
  * 100 TB.
  */
object PartitionedParquetSink {

  def write(df: DataFrame, tsCol: String, outDir: String): Unit =
    df.withColumn("date", to_date(col(tsCol)))
      .write
      .partitionBy("date")
      .mode("append")
      .parquet(outDir)

  /** Drop `date=` partitions strictly older than `cutoff` (YYYY-MM-DD).
    * Purely filesystem-level, mirroring ClickHouse's TTL partition
    * drops; returns the dropped partition names.
    */
  def expireOlderThan(spark: SparkSession, outDir: String, cutoff: String): Seq[String] = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val dropped = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("date=") && n.stripPrefix("date=") < cutoff
      }
    dropped.foreach(fs.delete(_, true))
    dropped.map(_.getName)
  }
}
