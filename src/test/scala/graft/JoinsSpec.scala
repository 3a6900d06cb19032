package graft

import graft.operators.Joins

/** ASOF join semantics beyond the oracle-checked query: whole-row
  * atomicity with NULL fields, and collision rejection.
  */
class JoinsSpec extends SparkSpecBase {

  test("asofLeft attaches one whole right row — NULL fields are not backfilled") {
    import spark.implicits._
    val left = Seq((1L, 30L, "L1")).toDF("k", "ts", "payload")
    // newer right row has aux=NULL; a per-column carry would stitch
    // (id=B, aux=x) — a row that never existed
    val right = Seq(
      (1L, 10L, "A", Option("x")),
      (1L, 20L, "B", Option.empty[String]))
      .toDF("k", "ts", "rid", "aux")
    val got = Joins.asofLeft(left, right, "k", "ts", Seq("rid", "aux")).collect().head
    assert(got.getAs[String]("rid") === "B")
    assert(got.isNullAt(got.fieldIndex("aux")), "aux must stay NULL from row B")
  }

  test("asofLeft with no prior right row yields nulls") {
    import spark.implicits._
    val left = Seq((1L, 5L)).toDF("k", "ts")
    val right = Seq((1L, 10L, "A")).toDF("k", "ts", "rid")
    val got = Joins.asofLeft(left, right, "k", "ts", Seq("rid")).collect().head
    assert(got.isNullAt(got.fieldIndex("rid")))
  }

  test("asofLeft rejects rightCols colliding with left columns") {
    import spark.implicits._
    val left = Seq((1L, 5L, "v")).toDF("k", "ts", "rid")
    val right = Seq((1L, 1L, "A")).toDF("k", "ts", "rid")
    intercept[IllegalArgumentException](
      Joins.asofLeft(left, right, "k", "ts", Seq("rid")))
  }

  test("nearest ASOF: direction choice, backward tie, and gap-0 equal timestamps") {
    // drive the graded query's exact pipeline through a synthetic
    // events table: clicks at controlled distances from signups,
    // including an exact midpoint tie (→ backward, the pandas
    // default) and an equal-timestamp signup (→ backward, gap 0)
    import spark.implicits._
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    def ts(s: Long) = java.sql.Timestamp.valueOf(base.plusSeconds(s))
    val rows = Seq(
      // user 1: signup@100, signup@300; clicks at 150 (near prev),
      // 280 (near next), 200 (exact midpoint → backward)
      (10L, ts(100), 1L, "signup", 0.0, "{}"),
      (11L, ts(300), 1L, "signup", 0.0, "{}"),
      (12L, ts(150), 1L, "click", 0.0, "{}"),
      (13L, ts(280), 1L, "click", 0.0, "{}"),
      (14L, ts(200), 1L, "click", 0.0, "{}"),
      // user 2: click exactly AT the signup ts → backward, gap 0
      (20L, ts(500), 2L, "signup", 0.0, "{}"),
      (21L, ts(500), 2L, "click", 0.0, "{}"),
      // user 3: click before any signup → forward only
      (30L, ts(900), 3L, "signup", 0.0, "{}"),
      (31L, ts(800), 3L, "click", 0.0, "{}"),
      // user 4: no signup at all → null match
      (41L, ts(50), 4L, "click", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("asofnear").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Joins.joinAsofNearest(spark, dir).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4))))).toMap
    assert(got(12L) === ((Some(10L), Some("backward"), Some(50000000L))))
    assert(got(13L) === ((Some(11L), Some("forward"), Some(20000000L))))
    assert(got(14L) === ((Some(10L), Some("backward"), Some(100000000L))),
      "exact midpoint must break toward backward")
    assert(got(21L) === ((Some(20L), Some("backward"), Some(0L))),
      "equal timestamp is a backward match with gap 0")
    assert(got(31L) === ((Some(30L), Some("forward"), Some(100000000L))))
    assert(got(41L) === ((None, None, None)))
  }
}
