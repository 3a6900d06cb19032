package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.dsum

/** Join operators Spark lacks as primitives (SURVEY §2 C15/C16),
  * composed into shuffle-safe shapes instead of custom physical
  * operators — the built-ins can express both semantics with the
  * right plan shape, so per the preference order (compose > custom
  * plan) no `SparkStrategy` is needed.
  *
  * ASOF join (ClickHouse `ASOF JOIN`): "for each left row, the latest
  * right row with ts ≤ left.ts, per key". Implemented as a tagged
  * union + one window pass: sort right-before-left at equal ts, carry
  * the last seen right row forward. ONE shuffle on the key — the same
  * cost as a sort-merge join, with none of the per-row backward scans
  * a naive inequality join (broadcast-nested-loop) would do. At 100 TB
  * the window partitioning keys spread per user; no skew beyond the
  * key distribution itself.
  *
  * Range join: interval containment against an interval table.
  * Spark plans raw inequality joins as nested-loop; instead each
  * interval is pre-exploded into fixed-width buckets and the fact
  * side equi-joins on its value's bucket, then re-filters exactly.
  * Equi-join + filter = hash-partitionable, AQE-skew-handled.
  */
object Joins {

  /** Generic ASOF left join: for each row of `left`, attach the most
    * recent `right` row (by `tsCol`, ≤ left's) sharing `key`.
    * `rightCols` are carried over (nulls when no prior right row).
    */
  def asofLeft(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightCols: Seq[String]): DataFrame = {
    val collisions = rightCols.toSet.intersect(
      left.columns.toSet -- Set(key, tsCol))
    require(collisions.isEmpty,
      s"asofLeft rightCols collide with left columns: $collisions")
    // The matched right row travels as ONE struct through a single
    // last(ignoreNulls) — carrying columns individually would let a
    // NULL field in a newer right row be backfilled from an older one,
    // stitching together a right row that never existed.
    val lTagged = left
      .withColumn("_tag", lit(1))
      .withColumn("_rrow", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightCols.map(c => right.schema(c)))))
    val rTagged = right
      .withColumn("_tag", lit(0))
      .withColumn("_rrow", struct(rightCols.map(col): _*))
      .withColumns(left.columns.filterNot(c => c == key || c == tsCol)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
      .select(lTagged.columns.toIndexedSeq.map(col): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lTagged.union(rTagged)
      .withColumn("_asof", last(col("_rrow"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
      .select((left.columns.toIndexedSeq.map(col) ++
        rightCols.map(c => col(s"_asof.$c").as(c))): _*)
  }

  /** C15: for each click, the user's most recent signup at or before
    * the click (funnel attribution — ClickHouse ASOF JOIN territory).
    */
  def joinAsof(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts")
    val signups = ev.where($"event_type" === "signup")
      .select($"user_id", $"ts", $"event_id".as("signup_id"),
        $"ts".as("signup_ts"))
    asofLeft(clicks, signups, "user_id", "ts", Seq("signup_id", "signup_ts"))
      .orderBy($"click_id")
  }

  val joinAsofSql: String =
    """WITH clicks AS (
      |  SELECT event_id AS click_id, user_id, ts FROM events
      |  WHERE event_type = 'click'),
      |signups AS (
      |  SELECT event_id AS signup_id, user_id, ts FROM events
      |  WHERE event_type = 'signup')
      |SELECT c.click_id, c.user_id, c.ts, s.signup_id, s.ts AS signup_ts
      |FROM clicks c ASOF LEFT JOIN signups s
      |  ON c.user_id = s.user_id AND c.ts >= s.ts
      |ORDER BY click_id""".stripMargin

  /** C15b: ASOF with a match tolerance — "latest signup at or before
    * the click, but only within the last 2 hours; otherwise NULL"
    * (the stale-match guard every real attribution join needs; kdb's
    * `wj`/pandas `merge_asof(tolerance=...)` semantics). Same
    * one-shuffle tagged-union window as [[asofLeft]]; the tolerance is
    * a post-pass that nulls the carried struct when the matched row is
    * too old — correct because any EARLIER right row is older still,
    * so "latest within window" ≡ "latest, then window-checked".
    */
  def joinAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts")
    val signups = ev.where($"event_type" === "signup")
      .select($"user_id", $"ts", $"event_id".as("signup_id"),
        $"ts".as("signup_ts"))
    val inWin = $"signup_ts".isNotNull &&
      $"signup_ts" >= $"ts" - expr("INTERVAL 2 HOURS")
    asofLeft(clicks, signups, "user_id", "ts", Seq("signup_id", "signup_ts"))
      .select($"click_id", $"user_id", $"ts",
        when(inWin, $"signup_id").as("signup_id"),
        when(inWin, $"signup_ts").as("signup_ts"))
      .orderBy($"click_id")
  }

  val joinAsofToleranceSql: String =
    """WITH clicks AS (
      |  SELECT event_id AS click_id, user_id, ts FROM events
      |  WHERE event_type = 'click'),
      |signups AS (
      |  SELECT event_id AS signup_id, user_id, ts FROM events
      |  WHERE event_type = 'signup')
      |SELECT c.click_id, c.user_id, c.ts,
      |  CASE WHEN s.ts >= c.ts - INTERVAL 2 HOUR THEN s.signup_id END AS signup_id,
      |  CASE WHEN s.ts >= c.ts - INTERVAL 2 HOUR THEN s.ts END AS signup_ts
      |FROM clicks c ASOF LEFT JOIN signups s
      |  ON c.user_id = s.user_id AND c.ts >= s.ts
      |ORDER BY click_id""".stripMargin

  /** Value tiers for the range join — deliberately non-uniform so the
    * join is a real interval lookup, not an alignable division.
    */
  val tiers: Seq[(Int, Double, Double)] = Seq(
    (0, 0.0, 10.0), (1, 10.0, 25.0), (2, 25.0, 60.0),
    (3, 60.0, 150.0), (4, 150.0, 600.0))
  val BucketW = 10.0

  /** C16: events ⋈ value-interval tiers via bucket-exploded equi-join. */
  def joinRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tierDf = tiers.toDF("tier_id", "lo", "hi")
      .withColumn("bucket", explode(expr(
        s"sequence(CAST(floor(lo / $BucketW) AS INT), CAST(floor((hi - 0.001) / $BucketW) AS INT))")))
    val ev = graft.Tables.events(spark, dir)
      .withColumn("bucket", floor($"value" / BucketW).cast("int"))
    ev.join(broadcast(tierDf), Seq("bucket"))
      .where($"value" >= $"lo" && $"value" < $"hi")
      .groupBy($"tier_id", $"lo", $"hi")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .orderBy($"tier_id")
  }

  val joinRangeSql: String =
    """WITH tiers(tier_id, lo, hi) AS (VALUES
      |  (0, 0.0, 10.0), (1, 10.0, 25.0), (2, 25.0, 60.0),
      |  (3, 60.0, 150.0), (4, 150.0, 600.0))
      |SELECT tier_id, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
      |FROM events JOIN tiers ON value >= lo AND value < hi
      |GROUP BY tier_id, lo, hi ORDER BY tier_id""".stripMargin

  /** C15c: NEAREST-direction ASOF (`join_asof_nearest`) — pandas
    * `merge_asof(direction='nearest')`: each click matches its CLOSEST
    * signup in either time direction (ties → backward, the pandas
    * default; an equal-timestamp right row counts as backward with
    * gap 0 via the (ts, tag) sort). Same ONE-shuffle tagged-union
    * shape as C15 — the backward match is `last(…, ignoreNulls)` over
    * the preceding frame and the forward match is `first(…,
    * ignoreNulls)` over the following frame of the SAME sorted pass,
    * so "nearest" costs exactly one window sort, not two joins.
    * Gaps compare in exact integer microseconds.
    */
  def joinAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts")
    val signups = ev.where($"event_type" === "signup")
      .select($"user_id", $"ts", $"event_id".as("signup_id"))
    val lTagged = clicks.withColumn("_tag", lit(1))
      .withColumn("_srow", lit(null).cast("struct<signup_id:bigint,sts:timestamp_ntz>"))
    val rTagged = signups
      .withColumn("_tag", lit(0))
      .withColumn("_srow", struct($"signup_id", $"ts".as("sts")))
      .withColumn("click_id", lit(null).cast("bigint"))
      .select(lTagged.columns.toIndexedSeq.map(col): _*)
    // third sort key: among several right rows at the SAME timestamp,
    // last() must pick a deterministic one (the largest signup_id —
    // mirrored by the oracle's ORDER BY ts DESC, signup_id DESC)
    val wB = Window.partitionBy($"user_id")
      .orderBy($"ts", $"_tag", $"_srow.signup_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy($"user_id")
      .orderBy($"ts", $"_tag", $"_srow.signup_id")
      .rowsBetween(0, Window.unboundedFollowing)
    val us = unix_micros($"ts".cast("timestamp"))
    lTagged.union(rTagged)
      .withColumn("_prev", last($"_srow", ignoreNulls = true).over(wB))
      .withColumn("_next", first($"_srow", ignoreNulls = true).over(wF))
      .where($"_tag" === 1)
      .withColumn("_pgap", us - unix_micros($"_prev.sts".cast("timestamp")))
      .withColumn("_ngap", unix_micros($"_next.sts".cast("timestamp")) - us)
      .select($"click_id", $"user_id",
        when($"_prev".isNull && $"_next".isNull, lit(null).cast("bigint"))
          .when($"_next".isNull || ($"_prev".isNotNull && $"_pgap" <= $"_ngap"),
            $"_prev.signup_id")
          .otherwise($"_next.signup_id").as("signup_id"),
        when($"_prev".isNull && $"_next".isNull, lit(null).cast("string"))
          .when($"_next".isNull || ($"_prev".isNotNull && $"_pgap" <= $"_ngap"),
            lit("backward"))
          .otherwise(lit("forward")).as("direction"),
        when($"_prev".isNull && $"_next".isNull, lit(null).cast("bigint"))
          .when($"_next".isNull || ($"_prev".isNotNull && $"_pgap" <= $"_ngap"),
            $"_pgap")
          .otherwise($"_ngap").as("gap_us"))
      .orderBy($"click_id")
  }

  val joinAsofNearestSql: String =
    """WITH clicks AS (
      |  SELECT event_id AS click_id, user_id, ts FROM events
      |  WHERE event_type = 'click'),
      |signups AS (
      |  SELECT user_id, ts, event_id AS signup_id FROM events
      |  WHERE event_type = 'signup'),
      |m AS (
      |  SELECT c.click_id, c.user_id,
      |    (SELECT s.signup_id FROM signups s
      |     WHERE s.user_id = c.user_id AND s.ts <= c.ts
      |     ORDER BY s.ts DESC, s.signup_id DESC LIMIT 1) AS prev_id,
      |    (SELECT epoch_us(c.ts) - epoch_us(s.ts) FROM signups s
      |     WHERE s.user_id = c.user_id AND s.ts <= c.ts
      |     ORDER BY s.ts DESC, s.signup_id DESC LIMIT 1) AS pgap,
      |    (SELECT s.signup_id FROM signups s
      |     WHERE s.user_id = c.user_id AND s.ts > c.ts
      |     ORDER BY s.ts, s.signup_id LIMIT 1) AS next_id,
      |    (SELECT epoch_us(s.ts) - epoch_us(c.ts) FROM signups s
      |     WHERE s.user_id = c.user_id AND s.ts > c.ts
      |     ORDER BY s.ts, s.signup_id LIMIT 1) AS ngap
      |  FROM clicks c)
      |SELECT click_id, user_id,
      |  CASE WHEN prev_id IS NULL AND next_id IS NULL THEN NULL
      |       WHEN next_id IS NULL OR (prev_id IS NOT NULL AND pgap <= ngap)
      |         THEN prev_id ELSE next_id END AS signup_id,
      |  CASE WHEN prev_id IS NULL AND next_id IS NULL THEN NULL
      |       WHEN next_id IS NULL OR (prev_id IS NOT NULL AND pgap <= ngap)
      |         THEN 'backward' ELSE 'forward' END AS direction,
      |  CASE WHEN prev_id IS NULL AND next_id IS NULL THEN NULL
      |       WHEN next_id IS NULL OR (prev_id IS NOT NULL AND pgap <= ngap)
      |         THEN pgap ELSE ngap END AS gap_us
      |FROM m ORDER BY click_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_asof" -> joinAsof _,
    "join_asof_tol" -> joinAsofTolerance _,
    "join_asof_nearest" -> joinAsofNearest _,
    "join_range" -> joinRange _)

  val oracleSql: Map[String, String] = Map(
    "join_asof" -> joinAsofSql,
    "join_asof_tol" -> joinAsofToleranceSql,
    "join_asof_nearest" -> joinAsofNearestSql,
    "join_range" -> joinRangeSql)
}
