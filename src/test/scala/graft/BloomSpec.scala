package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomAgg.{bloom_agg, bloom_contains}

/** Bloom filter gate (D23): membership contract (no false negatives,
  * bounded false positives), merge determinism across partitionings,
  * SQL registration, and the graded query's FP/no-FN shape.
  */
class BloomSpec extends SparkSpecBase {

  test("no false negatives: every inserted key is contained, merges included") {
    import spark.implicits._
    val keys = spark.range(1000).select(md5(concat(lit("key"), $"id").cast("binary")).as("k"))
      .repartition(8) // force partial filters + OR-merge
    val bf = keys.agg(bloom_agg($"k", 65536, 4).as("bf"))
    val missed = keys.crossJoin(broadcast(bf))
      .where(!bloom_contains($"bf", $"k")).count()
    assert(missed === 0L)
  }

  test("filter bytes are a pure function of the key set, any partitioning") {
    import spark.implicits._
    val keys = spark.range(500).select(concat(lit("k"), $"id").as("k"))
    val one = keys.coalesce(1).agg(bloom_agg($"k", 4096, 4)).head().getAs[Array[Byte]](0)
    val many = keys.repartition(16).agg(bloom_agg($"k", 4096, 4)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many))
  }

  test("false-positive rate stays under the design bound at ~0.5 load") {
    import spark.implicits._
    // n=500, m=4096, k=4: kn/m ~ 0.49, theoretical FP ~ (1-e^-0.49)^4 ~ 2.2%
    val inserted = spark.range(500).select(concat(lit("in"), $"id").as("k"))
    val bf = inserted.agg(bloom_agg($"k", 4096, 4).as("bf"))
    val fresh = spark.range(2000).select(concat(lit("out"), $"id").as("k"))
    val fp = fresh.crossJoin(broadcast(bf))
      .where(bloom_contains($"bf", $"k")).count()
    assert(fp <= 100L, s"FP rate ${fp / 2000.0} exceeds 5%") // 2.5x theory headroom
  }

  test("SQL surface: bloom_agg/bloom_contains registered via extensions") {
    spark.range(100).createOrReplaceTempView("bloom_in")
    val row = spark.sql(
      """WITH f AS (SELECT bloom_agg(CAST(id AS STRING), 1024, 3) AS bf FROM bloom_in)
        |SELECT bloom_contains(bf, '42') AS hit, bloom_contains(bf, 'nope') IS NOT NULL AS defined
        |FROM f""".stripMargin).head()
    assert(row.getBoolean(0))
    assert(row.getBoolean(1))
  }

  test("dedup_bloom_gate: every true duplicate is flagged; FPs are rare") {
    val rows = graft.dedup.Dedup.bloomGate(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val fn = rows.count(r => r.getBoolean(2) && !r.getBoolean(1))
    assert(fn === 0, "bloom missed a true duplicate (false negative)")
    val fresh = rows.count(r => !r.getBoolean(2))
    val fp = rows.count(r => !r.getBoolean(2) && r.getBoolean(1))
    assert(fresh > 0 && fp.toDouble / fresh < 0.05, s"FP $fp of $fresh fresh docs")
  }
}
