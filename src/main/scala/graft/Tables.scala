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

  /** `events.ts` has shipped in two physical shapes across testdata
    * generations: INT64 TIMESTAMP(NANOS) (which Spark 4's parquet
    * reader surfaces only as long via `nanosAsLong`) and plain µs
    * TIMESTAMP. Normalize BOTH to µs TIMESTAMP_NTZ by inspecting the
    * read schema, so every downstream query and its DuckDB oracle
    * (which reads either file as µs TIMESTAMP) agree bit-for-bit.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    val tsConv = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
      case _ => expr("cast(ts as timestamp_ntz)")
    }
    raw.withColumn("ts", tsConv)
  }

  /** Exact decimal sum of a (≤ `scale`-decimal) column, output as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Exact decimal product-sum: cast each factor before multiplying. */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(28, scale))

  /** Deterministic average: exact double sum / long count (one IEEE div). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  /** Quantized order-free sum for CORPUS-SIZED aggregation passes:
    * each term becomes the exact integer floor(x·10⁹ + ½) summed as
    * LONG — whole-stage-codegen primitive arithmetic, ~10× the
    * decimal pattern's throughput (measured 15 s → 1.5 s on the
    * sf0.1 PCA covariance). Cross-engine parity is STRONGER than
    * round()+DECIMAL: floor of a double is exact IEEE, so there is
    * no shortest-repr-vs-binary disagreement window at half-ties at
    * all. Semantics differ from HALF_UP only at exact binary
    * half-ties (round-toward-+∞ instead of away-from-zero); the
    * oracle mirrors via [[qsumSql]]. Caller must bound |x|·10⁹ ×
    * group-size below 2⁶³ — fine whenever per-group mass is bounded
    * (PageRank: Σ terms ≤ 1; HITS: ≤ max degree; covariance: ≤
    * n·max|x|²).
    */
  def qsum(c: Column): Column =
    sum(floor(c * lit(1.0e9) + lit(0.5)).cast("long")).cast("double") / lit(1.0e9)

  /** SQL mirror of [[qsum]]. */
  def qsumSql(expr: String): String =
    s"CAST(sum(CAST(floor(($expr) * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
}
