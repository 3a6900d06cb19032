package graft

import org.apache.spark.sql.functions._

import graft.flow.FlowAnalytics

/** B26–B28 + C26 invariants the oracle replay can't see: the EWMA
  * really is the truncated exponential recurrence (driver-side
  * recompute), interval merging reaches the true coalesced cover
  * (driver-side sweep-line), the HLL overlap estimates hold their
  * bounds, and CDC compaction replays to the same state as a
  * driver-side last-writer-wins map.
  */
class FlowOpsSpec extends SparkSpecBase {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("EWMA forecast matches a driver-side truncated recurrence at sf0.001") {
    import spark.implicits._
    val hourly = FlowAnalytics.asFlows(spark, sf0001)
      .groupBy($"pr", date_trunc("hour", $"ts").as("h"))
      .agg(graft.Tables.dsum($"value").as("vol"))
      .collect().map(r => (r.getString(0), r.getAs[Any](1).toString, r.getDouble(2)))
    val byPr = hourly.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expected = byPr.flatMap { case (pr, rows) =>
      rows.indices.flatMap { t =>
        // same left-associative term order as the engine and oracle
        var num = 0.0; var den = 0.0; var nBase = 0
        for (j <- 1 to FlowAnalytics.EwmaLags) {
          val w = FlowAnalytics.EwmaWeights(j - 1)
          if (t - j >= 0) { num += w * rows(t - j)._3; den += w; nBase += 1 }
          else num += 0.0
        }
        if (nBase >= 12) {
          val f = r6(num / den)
          Some((pr, rows(t)._2) -> ((rows(t)._3, f, r6(rows(t)._3 / f))))
        } else None
      }
    }
    val got = FlowAnalytics.ewmaForecast(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getAs[Any](1).toString) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == expected.keySet)
    for ((k, (vol, f, ratio)) <- expected) {
      val (gv, gf, gr) = got(k)
      assert(gv == vol && gf == f && gr == ratio, s"mismatch at $k")
    }
  }

  test("interval merge matches a driver-side sweep-line at sf0.001") {
    import spark.implicits._
    val iv = FlowAnalytics.asFlows(spark, sf0001)
      .select($"user_id", $"ts".cast("timestamp").cast("long").as("s"),
        pmod($"event_id", lit(300)).as("dm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(1) + r.getLong(2) + 60))
    val expected = iv.groupBy(_._1).map { case (u, xs) =>
      val sorted = xs.map(x => (x._2, x._3)).sortBy(identity)
      // sweep-line coalescing with the same 900 s tolerance
      val periods = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case (Nil, (s, e)) => List((s, e, 1L))
        case ((ps, pe, n) :: rest, (s, e)) =>
          if (s > pe + FlowAnalytics.MergeGapS) (s, e, 1L) :: (ps, pe, n) :: rest
          else (ps, math.max(pe, e), n + 1) :: rest
      }
      u -> ((periods.size.toLong, periods.map(p => p._2 - p._1).sum,
        periods.map(p => p._2 - p._1).max, periods.map(_._3).max))
    }
    val got = FlowAnalytics.intervalMerge(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
  }

  test("distinct overlap holds its sketch bounds at sf0.001") {
    val row = FlowAnalytics.distinctOverlap(spark, sf0001).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Boolean]("within_bound"),
      "HLL inclusion-exclusion estimate outside its declared bound")
    // the exact side is internally consistent: |A∩B| = |A|+|B|-|A∪B|
    val (a, b, u, i) = (row(0).getLong(0), row(0).getLong(1),
      row(0).getLong(2), row(0).getLong(3))
    assert(i == a + b - u)
  }

  test("CDC latest-wins compaction replays to a driver-side state map at sf0.001") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .where(pmod($"user_id", lit(10)) === 0)
      .select($"user_id", get_json_object($"props", "$.k").cast("long").as("k"),
        $"ts".cast("timestamp").cast("long"), $"event_id", $"value",
        $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))
    val expected = ev.groupBy(e => (e._1, e._2)).flatMap { case (key, xs) =>
      val last = xs.maxBy(e => (e._3, e._4))
      if (last._6 == "error") None else Some(key -> ((last._4, last._5)))
    }
    val got = graft.queries.Relational.cdcLatestUpsert(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == expected)
  }
}
