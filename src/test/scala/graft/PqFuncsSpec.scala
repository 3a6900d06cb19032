package graft

import org.apache.spark.sql.functions._
import graft.functions.PqFuncs

/** The native argmin/argmax kernels must be drop-in replacements for
  * the HOF struct-ordering shapes they replaced — same winners, same
  * tie-breaks (lowest cid), same NaN rule (nan-safe: NaN greatest),
  * same null on empty candidate lists.
  */
class PqFuncsSpec extends SparkSpecBase {
  import spark.implicits._

  private def candsDf(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("cid", "cent")
      .agg(collect_list(struct($"cid", $"cent")).as("cs"))

  test("argmaxCos matches array_max(struct(cos, -cid, cid)) incl. ties and NaN") {
    val cands = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(2.0, 0.0, 0.0, 0.0)),   // same cosine as cid 0 (tie -> lower cid)
      (2L, Seq(0.0, 0.0, 0.0, 0.0)),   // zero norm -> NaN cosine (nan-safe greatest)
      (3L, Seq(0.0, 1.0, 0.0, 0.0)))
    for ((emb, expect) <- Seq(
        (Seq(1.0, 0.0, 0.0, 0.0), 2L),  // NaN wins the max
        (Seq(0.0, 2.0, 0.0, 0.0), 2L))) {
      val df = Seq(emb).toDF("embedding").crossJoin(candsDf(cands))
      val got = df.select(PqFuncs.argmaxCos($"embedding", $"cs").as("cid"))
        .head().getLong(0)
      val hof = df.select(array_max(transform($"cs", c => struct(
          graft.functions.VecFuncs.vcos($"embedding", c.getField("cent")).as("s"),
          (-c.getField("cid")).as("nc"),
          c.getField("cid").as("cid")))).getField("cid").as("cid"))
        .head().getLong(0)
      assert(got == hof && got == expect, s"emb=$emb got=$got hof=$hof")
    }
    // tie on cosine between cid 0 and 1 (parallel cents): lowest cid wins
    val df = Seq(Seq(3.0, 0.0, 0.0, 0.0)).toDF("embedding")
      .crossJoin(candsDf(cands.filterNot(_._1 == 2L)))
    assert(df.select(PqFuncs.argmaxCos($"embedding", $"cs")).head().getLong(0) == 0L)
  }

  test("argminL2 matches array_min(struct(d2, cid)) incl. tie to lowest cid") {
    val cands = Seq(
      (5L, Seq(1.0, 1.0)),
      (2L, Seq(-1.0, -1.0)),  // same d2 from origin as cid 5 -> cid 2 wins
      (9L, Seq(0.5, 0.5)))
    val df = Seq(Seq(0.0, 0.0)).toDF("svec").crossJoin(candsDf(cands))
    val got = df.select(PqFuncs.argminL2($"svec", $"cs")).head().getLong(0)
    import graft.functions.VecFuncs.vdot
    val hof = df.select(array_min(transform($"cs", c => struct(
        (vdot($"svec", $"svec") - lit(2.0) * vdot($"svec", c.getField("cent")) +
          vdot(c.getField("cent"), c.getField("cent"))).as("d2"),
        c.getField("cid").as("cid")))).getField("cid"))
      .head().getLong(0)
    assert(got == hof && got == 9L)
    // empty candidate list -> null (the array_min(empty) propagation)
    val empty = Seq(Seq(0.0, 0.0)).toDF("svec")
      .withColumn("cs", expr(
        "CAST(array() AS ARRAY<STRUCT<cid: BIGINT, cent: ARRAY<DOUBLE>>>)"))
    assert(empty.select(PqFuncs.argminL2($"svec", $"cs")).head().isNullAt(0))
  }

  test("pqEncodeCol matches the per-subspace HOF argmin on a real slice") {
    // 2 subspaces x subDim 2, 3 candidates per subspace
    val cb = Seq(
      (0, 0L, Seq(0.0, 0.0)), (0, 1L, Seq(1.0, 1.0)), (0, 2L, Seq(5.0, 5.0)),
      (1, 0L, Seq(2.0, 2.0)), (1, 1L, Seq(-1.0, 0.0)), (1, 2L, Seq(0.0, 0.0)))
      .toDF("sub", "cid", "cent")
    val cbs = cb.groupBy($"sub")
      .agg(collect_list(struct($"cid", $"cent")).as("cs"))
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(sub, cs))), s -> s.cs)")
        .as("cbs"))
    val df = Seq((Seq(0.9, 1.1, -0.6, 0.1)), (Seq(4.0, 6.0, 2.0, 2.0)))
      .toDF("embedding").crossJoin(broadcast(cbs))
    val native = df.select(PqFuncs.pqEncodeCol($"embedding", $"cbs", 2).as("cds"))
      .collect().map(_.getSeq[Long](0))
    import graft.functions.VecFuncs.vdot
    val hof = df.select(transform(sequence(lit(0), lit(1)), sub => {
        val sv = slice($"embedding", sub * lit(2) + lit(1), lit(2))
        array_min(transform(element_at($"cbs", sub + lit(1)), c => struct(
          (vdot(sv, sv) - lit(2.0) * vdot(sv, c.getField("cent")) +
            vdot(c.getField("cent"), c.getField("cent"))).as("d2"),
          c.getField("cid").as("cid")))).getField("cid")
      }).as("cds")).collect().map(_.getSeq[Long](0))
    assert(native.toSeq == hof.toSeq)
    assert(native.head == Seq(1L, 1L) && native(1) == Seq(2L, 0L))
  }
}
