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

  private def rankRewritten(df: DataFrame, agg: String): Boolean = {
    val p = planOf(df)
    p.contains(agg) && !p.contains("Window")
  }

  test("rank() <= k rewrites to a tie-expanded key-group heap") {
    import spark.implicits._
    def q = events
      .withColumn("rn", rank().over(
        Window.partitionBy($"user_id").orderBy($"event_type")))
      .where($"rn" <= 3)
    assert(rankRewritten(q, "rankk_rows"), s"expected rank heap, got:\n${planOf(q)}")
    assertSameRows(q)
  }

  test("dense_rank() <= k rewrites and matches the window result") {
    import spark.implicits._
    def q = events
      .withColumn("rn", dense_rank().over(
        Window.partitionBy($"user_id").orderBy($"event_type")))
      .where($"rn" <= 2)
    assert(rankRewritten(q, "densek_rows"), s"expected dense heap, got:\n${planOf(q)}")
    assertSameRows(q)
  }

  test("rank() boundary ties emit MORE than k rows (group eviction, not row eviction)") {
    import spark.implicits._
    // g=1: v ranks are 1,2,2,2,5 — rank <= 3 keeps the three tied 2s
    def q = Seq((1L, 1.0), (1L, 2.0), (1L, 2.0), (1L, 2.0), (1L, 5.0))
      .toDF("g", "v")
      .withColumn("rn", rank().over(Window.partitionBy($"g").orderBy($"v")))
      .where($"rn" <= 3)
    assert(rankRewritten(q, "rankk_rows"))
    assertSameRows(q)
    assert(q.count() == 4, "rank<=3 over ranks 1,2,2,2,5 must emit 4 rows")
  }

  test("dense_rank() keeps every row of the k-th distinct key") {
    import spark.implicits._
    // dense ranks: 1 (v=1), 2 (v=2 x3) — dense_rank <= 2 keeps all 4
    def q = Seq((1L, 1.0), (1L, 2.0), (1L, 2.0), (1L, 2.0), (1L, 5.0))
      .toDF("g", "v")
      .withColumn("rn", dense_rank().over(Window.partitionBy($"g").orderBy($"v")))
      .where($"rn" <= 2)
    assert(rankRewritten(q, "densek_rows"))
    assertSameRows(q)
    assert(q.count() == 4, "dense_rank<=2 over keys 1,2,2,2,5 must emit 4 rows")
  }

  test("rank() = 1 keeps ALL rows tied for best") {
    import spark.implicits._
    def q = Seq((1L, 2.0), (1L, 2.0), (1L, 3.0), (2L, 7.0))
      .toDF("g", "v")
      .withColumn("rn", rank().over(Window.partitionBy($"g").orderBy($"v")))
      .where($"rn" === 1)
      .drop("rn")
    assert(rankRewritten(q, "rankk_rows"))
    assertSameRows(q)
    assert(q.count() == 3, "both tied minima in g=1 plus g=2's best")
  }

  test("tie groups beyond the configured cap fail loud instead of growing unbounded") {
    import spark.implicits._
    // 10 rows all tied for rank 1: the semantics force the heap to
    // retain every one — unlike the Window plan it cannot spill, so
    // past the cap it must throw with guidance, never OOM or truncate
    spark.conf.set("spark.graft.rankLimitRewrite.maxTieRows", "4")
    try {
      val q = (1 to 10).map(i => (1L, 1.0, i)).toDF("g", "v", "id")
        .withColumn("rn", rank().over(Window.partitionBy($"g").orderBy($"v")))
        .where($"rn" <= 1)
      assert(rankRewritten(q, "rankk_rows"))
      val e = intercept[Exception] { q.collect() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("maxTieRows")),
        s"expected the tie-cap guidance, got: ${messages(e)}")
    } finally spark.conf.unset("spark.graft.rankLimitRewrite.maxTieRows")
  }

  test("rank() null sort keys follow the window's null ordering") {
    import spark.implicits._
    def base = Seq(
      (1L, Some(5.0)), (1L, None), (1L, None), (1L, Some(1.0)),
      (2L, None), (2L, Some(3.0))).toDF("g", "v")
    def asc = base
      .withColumn("rn", rank().over(Window.partitionBy($"g").orderBy($"v".asc)))
      .where($"rn" <= 2)
    def desc = base
      .withColumn("rn", rank().over(Window.partitionBy($"g").orderBy($"v".desc)))
      .where($"rn" <= 2)
    assert(rankRewritten(asc, "rankk_rows") && rankRewritten(desc, "rankk_rows"))
    assertSameRows(asc)
    assertSameRows(desc)
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
  private def prefixRewritten(df: DataFrame): Boolean = {
    val p = planOf(df)
    p.contains("prefix_rows") && !p.contains("Window")
  }

  test("percent_rank <= p rewrites to count-join + variable-k heap, matches window") {
    import spark.implicits._
    def q = events
      .withColumn("pr", percent_rank().over(
        Window.partitionBy($"event_type").orderBy($"value", $"event_id")))
      .where($"pr" <= 0.1)
    assert(prefixRewritten(q), s"expected prefix rewrite, got:\n${planOf(q)}")
    assertSameRows(q)
  }

  test("percent_rank boundary ties keep the whole tie group (rank semantics)") {
    import spark.implicits._
    // 10 rows, 4 of them tied at the second value: percent_rank of the
    // tie group is 1/9 <= 0.2 -> all four kept
    val df = Seq((1, 1.0), (2, 5.0), (3, 5.0), (4, 5.0), (5, 5.0),
      (6, 7.0), (7, 8.0), (8, 9.0), (9, 10.0), (10, 11.0))
      .toDF("id", "v")
    def q = df
      .withColumn("pr", percent_rank().over(Window.orderBy($"v")))
      .where($"pr" <= 0.2)
    assert(prefixRewritten(q), s"expected prefix rewrite, got:\n${planOf(q)}")
    assertSameRows(q)
    assert(q.count() === 5) // rank-1 row + the whole 4-way tie at rank 2
  }

  test("single-row groups: percent_rank is 0.0 and the row is kept") {
    import spark.implicits._
    val df = Seq((1, "a", 1.0), (2, "b", 2.0), (3, "b", 3.0)).toDF("id", "g", "v")
    def q = df
      .withColumn("pr", percent_rank().over(
        Window.partitionBy($"g").orderBy($"v")))
      .where($"pr" <= 0.5)
    assert(prefixRewritten(q), s"expected prefix rewrite, got:\n${planOf(q)}")
    assertSameRows(q)
    assert(q.where($"g" === "a").count() === 1)
  }

  test("ntile(t) <= q rewrites to the row_number-semantics prefix heap") {
    import spark.implicits._
    def q = events
      .withColumn("nt", ntile(5).over(
        Window.partitionBy($"event_type").orderBy($"value", $"event_id")))
      .where($"nt" <= 2)
    assert(prefixRewritten(q), s"expected prefix rewrite, got:\n${planOf(q)}")
    assertSameRows(q)
  }

  test("ntile = 1 (first-bucket idiom) rewrites; uneven buckets match Spark's fill") {
    import spark.implicits._
    // 7 rows, 3 buckets -> sizes 3,2,2: bucket 1 holds exactly 3
    val df = (1 to 7).map(i => (i, i.toDouble)).toDF("id", "v")
    def q = df
      .withColumn("nt", ntile(3).over(Window.orderBy($"v")))
      .where($"nt" === 1)
    assert(prefixRewritten(q), s"expected prefix rewrite, got:\n${planOf(q)}")
    assertSameRows(q)
    assert(q.count() === 3)
  }

  test("non-prefix forms keep their Window plan") {
    import spark.implicits._
    // p >= 1 keeps the whole group; ntile upper bound >= t likewise;
    // a lower bound is not a prefix at all
    def q1 = events
      .withColumn("pr", percent_rank().over(
        Window.partitionBy($"event_type").orderBy($"value")))
      .where($"pr" <= 1.0)
    def q2 = events
      .withColumn("nt", ntile(4).over(
        Window.partitionBy($"event_type").orderBy($"value")))
      .where($"nt" >= 2)
    assert(planOf(q1).contains("Window"), "pr <= 1.0 must not rewrite")
    assert(planOf(q2).contains("Window"), "nt >= 2 must not rewrite")
  }
  test("cume_dist <= p rewrites; ties share the tie-group-end numerator") {
    import spark.implicits._
    def q = events
      .withColumn("cd", cume_dist().over(
        Window.partitionBy($"event_type").orderBy($"value", $"event_id")))
      .where($"cd" <= 0.25)
    assert(prefixRewritten(q), s"expected prefix rewrite, got:\n${planOf(q)}")
    assertSameRows(q)
    // tie semantics: a 3-way tie spanning the boundary is excluded
    // whole (its shared cume value counts the full tie group)
    val df = Seq((1, 1.0), (2, 2.0), (3, 2.0), (4, 2.0), (5, 3.0),
      (6, 4.0), (7, 5.0), (8, 6.0)).toDF("id", "v")
    def q2 = df
      .withColumn("cd", cume_dist().over(Window.orderBy($"v")))
      .where($"cd" <= 0.25)
    assert(prefixRewritten(q2))
    assertSameRows(q2)
    assert(q2.collect().map(_.getInt(0)).toSeq == Seq(1)) // 4/8 > 0.25 for the tie
  }
}
