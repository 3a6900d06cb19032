package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[graft.plans.RewriteRankLimit]]: the automatic
  * `row_number() <= k` → [[graft.functions.TopKRowsAgg]] heap
  * rewrite. Every positive case checks BOTH that the window is gone
  * from the physical plan (heap agg present) and that the rows equal
  * the rule-disabled run bit-for-bit; negative cases check the window
  * survived.
  */
class RankLimitRewriteSpec extends SparkSpecBase {

  private def events = graft.Tables.events(spark, sf0001)

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def rewritten(df: DataFrame): Boolean = {
    val p = planOf(df)
    p.contains("topk_rows") && !p.contains("Window")
  }

  /** rows under the rule vs rows with the rule disabled, compared as
    * sorted seqs.
    */
  private def assertSameRows(build: => DataFrame): Unit = {
    val withRule = build.collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.rankLimitRewrite", "false")
    try {
      val without = build.collect().map(_.toString).sorted.toSeq
      assert(withRule == without, "rewritten rows differ from window rows")
    } finally spark.conf.unset("spark.graft.rankLimitRewrite")
  }

  test("per-group row_number <= k rewrites to a heap and matches the window result") {
    import spark.implicits._
    def q = events
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .where($"rn" <= 3)
    assert(rewritten(q), s"expected heap rewrite, got:\n${planOf(q)}")
    assertSameRows(q)
  }

  test("DESC order and a residual conjunct both survive the rewrite") {
    import spark.implicits._
    def q = events
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_type").orderBy($"value".desc, $"event_id")))
      .where($"rn" <= 5 && $"value" > lit(10.0))
    assert(rewritten(q), s"expected heap rewrite, got:\n${planOf(q)}")
    assertSameRows(q)
  }

  test("rn = 1 (keep-first dedup idiom) rewrites to a top-1 heap") {
    import spark.implicits._
    def q = events
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .where($"rn" === 1)
      .drop("rn")
    assert(rewritten(q), s"expected heap rewrite, got:\n${planOf(q)}")
    assertSameRows(q)
  }

  test("global top-k (empty partition spec) rewrites to a single-group heap") {
    import spark.implicits._
    def q = events
      .withColumn("rn", row_number().over(
        Window.orderBy($"value".desc, $"event_id")))
      .where($"rn" <= 7)
    assert(rewritten(q), s"expected heap rewrite, got:\n${planOf(q)}")
    assertSameRows(q)
  }

  test("SQL form rewrites too") {
    events.createOrReplaceTempView("rl_events")
    def q = spark.sql(
      """SELECT user_id, event_id, rn FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM rl_events) t
        |WHERE rn <= 2""".stripMargin)
    assert(rewritten(q), s"expected heap rewrite, got:\n${planOf(q)}")
    assertSameRows(q)
  }

  test("rank() is NOT rewritten (ties can exceed k)") {
    import spark.implicits._
    val q = events
      .withColumn("rn", rank().over(
        Window.partitionBy($"user_id").orderBy($"event_type")))
      .where($"rn" <= 3)
    assert(planOf(q).contains("Window"), "rank() must keep the window plan")
  }

  test("a lower bound on rn disables the rewrite (the heap cannot skip rows)") {
    import spark.implicits._
    val q = events
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .where($"rn" >= 2 && $"rn" <= 4)
    assert(planOf(q).contains("Window"), "rn >= 2 must keep the window plan")
  }

  test("k beyond the configured cap keeps the window plan") {
    import spark.implicits._
    spark.conf.set("spark.graft.rankLimitRewrite.maxK", "5")
    try {
      val q = events
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
        .where($"rn" <= 6)
      assert(planOf(q).contains("Window"), "k > maxK must keep the window plan")
    } finally spark.conf.unset("spark.graft.rankLimitRewrite.maxK")
  }

  test("null sort keys follow the window's null ordering (asc nulls-first / desc nulls-last)") {
    import spark.implicits._
    def base = Seq(
      (1L, Some(5.0)), (1L, None), (1L, Some(1.0)), (1L, Some(9.0)),
      (2L, None), (2L, None), (2L, Some(3.0))).toDF("g", "v")
      .withColumn("id", monotonically_increasing_id())
    def asc = base
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"v".asc, $"id")))
      .where($"rn" <= 2)
    def desc = base
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"v".desc, $"id")))
      .where($"rn" <= 2)
    assert(rewritten(asc) && rewritten(desc))
    assertSameRows(asc)
    assertSameRows(desc)
  }

  test("groups smaller than k emit all their rows") {
    import spark.implicits._
    def q = Seq((1L, 10.0), (2L, 1.0), (2L, 2.0), (2L, 3.0), (2L, 4.0))
      .toDF("g", "v")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"v", $"g")))
      .where($"rn" <= 3)
    assert(rewritten(q))
    assertSameRows(q)
    assert(q.count() == 4, "expected 1 + 3 rows")
  }

  test("rank column consumed ABOVE the filter keeps its values") {
    import spark.implicits._
    def q = events
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .where($"rn" <= 3)
      .select($"user_id", ($"rn" * 10).as("rn10"), $"event_id")
    assert(rewritten(q), s"expected heap rewrite, got:\n${planOf(q)}")
    assertSameRows(q)
  }
}
