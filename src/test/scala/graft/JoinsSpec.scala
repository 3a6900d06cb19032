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
}
