package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parquet table loaders + cross-engine-safe aggregation helpers.
  *
  * Oracle parity rules (Spark vs DuckDB on identical parquet):
  *  - money/ratio columns in the testdata carry exact 2-decimal values,
  *    so a cast to DECIMAL is lossless; summing in DECIMAL is exact and
  *    order-independent, unlike summing doubles under a shuffle.
  *  - the final cast back to DOUBLE is exact for |v| < 2^53 / 10^scale.
  * Every hash-checked aggregate goes through [[Tables.dsum]] /
  * [[Tables.davg]] so both engines compute bit-identical doubles.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` carries INT64 TIMESTAMP(NANOS) which Spark 4's parquet
    * reader rejects outright. Read nanos as long and rebuild a µs
    * TIMESTAMP_NTZ (the testdata has no sub-µs components; DuckDB
    * reads the same file as µs TIMESTAMP, so both engines agree).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts",
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }

  /** Exact decimal sum of a (≤ `scale`-decimal) column, output as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Exact decimal product-sum: cast each factor before multiplying. */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(28, scale))

  /** Deterministic average: exact double sum / long count (one IEEE div). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))
}
