package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvAgg._

/** KMV/theta sketch (B59): sketch bytes as a pure function of the key
  * set under any partitioning, estimator accuracy on known
  * cardinalities, exact mode when unsaturated, and the set-algebra
  * estimators against planted overlaps.
  */
class KmvSpec extends SparkSpecBase {

  test("sketch bytes are a pure function of the key set, any partitioning") {
    import spark.implicits._
    val keys = spark.range(5000).select(concat(lit("k"), $"id").as("k"))
    val one = keys.coalesce(1).agg(kmv_sketch($"k", 128)).head().getAs[Array[Byte]](0)
    val many = keys.repartition(16).agg(kmv_sketch($"k", 128)).head().getAs[Array[Byte]](0)
    val dup = keys.union(keys).repartition(7)
      .agg(kmv_sketch($"k", 128)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many))
    assert(java.util.Arrays.equals(one, dup), "duplicates must not change the sketch")
  }

  test("unsaturated sketch estimates exactly; saturated within 5 sigma") {
    import spark.implicits._
    val small = spark.range(100).select(concat(lit("s"), $"id").as("k"))
      .agg(kmv_estimate(kmv_sketch($"k", 256))).head().getDouble(0)
    assert(small === 100.0, "n < k must be exact")
    val n = 20000
    val est = spark.range(n).select(concat(lit("x"), $"id").as("k"))
      .agg(kmv_estimate(kmv_sketch($"k", 256))).head().getDouble(0)
    val sigma = n / math.sqrt(255)
    assert(math.abs(est - n) < 5 * sigma, s"est $est vs $n (sigma $sigma)")
  }

  test("set algebra: planted overlap recovered within 5 sigma; disjoint sets give 0") {
    import spark.implicits._
    // A = [0, 12000), B = [8000, 20000) → |A∩B| = 4000, |A∪B| = 20000
    val a = spark.range(0, 12000).select(concat(lit("v"), $"id").as("k"))
      .agg(kmv_sketch($"k", 256).as("sk")).head().getAs[Array[Byte]](0)
    val b = spark.range(8000, 20000).select(concat(lit("v"), $"id").as("k"))
      .agg(kmv_sketch($"k", 256).as("sk")).head().getAs[Array[Byte]](0)
    val df = Seq((a, b)).toDF("a", "b")
      .select(kmv_union_est($"a", $"b").as("u"),
        kmv_inter_est($"a", $"b").as("i"),
        kmv_diff_est($"a", $"b").as("d"))
      .head()
    val (u, i, d) = (df.getDouble(0), df.getDouble(1), df.getDouble(2))
    assert(math.abs(u - 20000) < 5 * 20000 / math.sqrt(255), s"union $u")
    // ρ ≈ k·J = 256·0.2 ≈ 51 window hits → σ ≈ |A∩B|/√ρ
    assert(math.abs(i - 4000) < 5 * 4000 / math.sqrt(51), s"inter $i")
    assert(math.abs(d - 8000) < 5 * 8000 / math.sqrt(102), s"diff $d")
    assert(math.abs((u - (i + d + (u - i - d)))) < 1e-6) // algebra closes
    // disjoint sets: intersection exactly 0 (no common hashes)
    val c = spark.range(0, 5000).select(concat(lit("q"), $"id").as("k"))
      .agg(kmv_sketch($"k", 256).as("sk")).head().getAs[Array[Byte]](0)
    val z = Seq((a, c)).toDF("a", "c")
      .select(kmv_inter_est($"a", $"c")).head().getDouble(0)
    assert(z === 0.0)
  }

  test("SQL registration: kmv functions callable from spark.sql") {
    val n = spark.sql(
      """SELECT kmv_estimate(kmv_sketch(CAST(id AS STRING), 64)) AS e
        |FROM range(50)""".stripMargin).head().getDouble(0)
    assert(n === 50.0)
  }
}
