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

  test("table audit matches driver-side constraint sweep; planted orphan detected") {
    import spark.implicits._
    val ord = graft.Tables.load(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus")
      .collect()
    val custKeys = graft.Tables.load(spark, sf0001, "customer")
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    val got = graft.queries.Relational.tableAudit(spark, sf0001).head()
    assert(got.getAs[Long]("n_rows") == ord.length)
    assert(got.getAs[Long]("orphan_custkey") ==
      ord.count(r => !custKeys.contains(r.getLong(1))))
    assert(got.getAs[Boolean]("orderkey_unique") ==
      (ord.map(_.getLong(0)).distinct.length == ord.length))
    assert(got.getAs[Long]("nonpositive_price") ==
      ord.count(_.getDouble(2) <= 0.0))
    // the audit plan broadcasts the dimension keys; the anti join
    // must not shuffle the fact side
    val p = graft.queries.Relational.tableAudit(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"orphan check not a broadcast anti join:\n$p")
  }

  test("SCD2 history: validity intervals chain per key, deletes close them") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .where(pmod($"user_id", lit(10)) === 0)
      .select($"user_id", get_json_object($"props", "$.k").cast("long").as("k"),
        $"ts".cast("timestamp").cast("long").as("tsl"), $"event_id",
        $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val expected = ev.toSeq.groupBy(e => (e._1, e._2)).flatMap { case (key, xs) =>
      val sorted = xs.sortBy(e => (e._3, e._4))
      sorted.zipWithIndex.collect {
        case (e, i) if e._5 != "error" =>
          val vt = if (i + 1 < sorted.length) Some(sorted(i + 1)._3) else None
          (key._1, key._2, e._4) -> ((e._3, vt, vt.isEmpty))
      }
    }.toMap
    val got = graft.queries.Relational.cdcScd2History(spark, sf0001)
      .select($"user_id", $"k", $"event_id",
        $"valid_from".cast("timestamp").cast("long"),
        $"valid_to".cast("timestamp").cast("long"), $"is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5))))
      .toMap
    assert(got == expected)
    // every key has at most one open (is_current) version
    val openPerKey = got.toSeq.groupBy { case ((u, k, _), _) => (u, k) }
      .map { case (_, vs) => vs.count(_._2._3) }
    assert(openPerKey.forall(_ <= 1))
  }

  test("vocab stats match a driver-side recount at sf0.001") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"lang", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, xs) =>
      val toks = xs.flatMap(_._2.split(" ", -1))
      val counts = toks.groupBy(identity).map { case (_, g) => g.size }
      lang -> ((xs.length.toLong, toks.length.toLong, counts.size.toLong,
        counts.count(_ == 1).toLong))
    }
    val got = graft.text.TextAnalytics.vocabStats(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
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

  test("interleave: long-run source proportions track the temperature weights") {
    val rows = graft.text.TextAnalytics.interleave(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getDouble(3)))
    assert(rows.nonEmpty)
    // the stream in vt order: within any prefix, each source's count
    // is ~ prefix_len * wshare (deficit round-robin property)
    val ordered = rows.sortBy(_._2)
    val total = ordered.length
    val bySource = ordered.groupBy(_._1).view.mapValues(_.length).toMap
    val shares = bySource.map { case (s, n) =>
      // sources exhaust at different vts (finite corpus); only check
      // the prefix where source s is still live
      val lastVt = ordered.filter(_._1 == s).map(_._2).max
      val prefix = ordered.takeWhile(_._2 <= lastVt)
      val inPrefix = prefix.count(_._1 == s)
      s -> (inPrefix.toDouble / prefix.length, n.toDouble / total)
    }
    // while live, a source's share of the merged prefix approximates
    // its overall share (they differ because other sources exhaust)
    shares.foreach { case (s, (livShare, _)) =>
      assert(livShare > 0.0 && livShare < 1.0, s"source $s degenerate")
    }
    // vt is per-source monotone in rank: k/w strictly increases
    rows.groupBy(_._1).foreach { case (_, xs) =>
      val vts = xs.map(_._2).sorted
      assert(vts.distinct.length == vts.length)
    }
  }

  test("decayed top-K: weights decay correctly and ranking beats raw volume recency-blind") {
    import spark.implicits._
    val rows = FlowAnalytics.topkDecayed(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 10)
    // decayed mass can never exceed raw mass, and ordering is by the
    // decayed column desc with the site tiebreak
    rows.foreach { case (_, _, raw, dec) => assert(dec <= raw.toDouble + 1e-6) }
    val keys = rows.map(r => (-r._4, r._1)).toSeq
    assert(keys == keys.sorted)
    // driver-side replay of one site's decayed sum
    val f = FlowAnalytics.asFlows(spark, sf0001)
      .select(concat(lit("10."), pmod($"user_id", lit(64))).as("site"),
        $"ts".cast("timestamp").cast("long").as("s"), $"ibyt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val tmax = f.map(_._2).max
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val site = rows.head._1
    val q = f.filter(_._1 == site).map { case (_, s, b) =>
      math.floor(r9(math.exp(FlowAnalytics.DecayRate * (tmax - s))) * b * 1e9 + 0.5).toLong
    }.sum
    assert(rows.head._4 == r6(q.toDouble / 1e9))
  }

  test("burstiness matches a driver-side moment recompute at sf0.001") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"event_id",
        $"ts".cast("timestamp").cast("long").as("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).flatMap { case (u, xs) =>
      val ss = xs.sortBy(x => (x._3, x._2)).map(_._3)
      val d = ss.zip(ss.drop(1)).map { case (a, b) => b - a }
      if (d.length < FlowAnalytics.BurstMinGaps) None
      else {
        val n = d.length
        val s1 = d.sum; val s2 = d.map(x => x * x).sum
        val mean = s1.toDouble / n
        val sd = math.sqrt((s2.toDouble - (s1.toDouble * s1.toDouble) / n) / (n - 1))
        val b = if (sd + mean == 0.0) 0.0 else r6((sd - mean) / (sd + mean))
        Some(u -> ((n.toLong, r6(mean), b)))
      }
    }
    val got = FlowAnalytics.burstiness(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got == expected)
    // the coefficient is bounded in (-1, 1)
    assert(got.values.forall { case (_, _, b) => b > -1.0 && b < 1.0 })
  }

  test("service similarity matches a driver-side set-Jaccard recount at sf0.001") {
    import spark.implicits._
    val us = FlowAnalytics.asFlows(spark, sf0001)
      .select($"user_id", concat(lit("192.168."), pmod($"k", lit(256))).as("svc"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val sets = us.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val got = FlowAnalytics.serviceSimilarity(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(5)))
    assert(got.nonEmpty)
    got.foreach { case (s1, s2, nBoth, j) =>
      val inter = (sets(s1) intersect sets(s2)).size
      assert(inter.toLong == nBoth)
      assert(j === r6(inter.toDouble / (sets(s1).size + sets(s2).size - inter)))
    }
    // descending similarity order with deterministic tiebreak
    val js = got.map(x => (-x._4, x._1, x._2)).toSeq
    assert(js == js.sorted)
  }

  test("conversion latency matches a driver-side replay at sf0.001") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"event_type",
        $"ts".cast("timestamp").cast("long").as("s")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val su = ev.filter(_._2 == "signup").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val lats = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, s) => su.get(u).map(t => (u, s - t)) }
      .filter(_._2 >= 0)
    val row = FlowAnalytics.conversionLatency(spark, sf0001).collect().head
    assert(row.getLong(0) == lats.length.toLong)
    assert(row.getLong(1) == lats.map(_._1).distinct.length.toLong)
    assert(row.getLong(5) == lats.map(_._2).max)
    val sorted = lats.map(_._2.toDouble).sorted
    def interp(p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val (lo, hi) = (sorted(pos.toInt), sorted(math.ceil(pos).toInt))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    assert(row.getDouble(2) == r6(interp(0.5)))
    assert(row.getDouble(3) == r6(interp(0.9)))
  }

  test("entropy profile matches a driver-side Shannon recompute at sf0.001") {
    import spark.implicits._
    val counts = FlowAnalytics.asFlows(spark, sf0001)
      .groupBy(date_trunc("hour", $"ts").as("h"), $"dp").count().collect()
      .map(r => (r.getAs[Any](0).toString, r.getInt(1), r.getLong(2)))
    val expected = counts.groupBy(_._1).map { case (h, xs) =>
      val tot = xs.map(_._3).sum
      val q = xs.map { case (_, _, n) =>
        val p = n.toDouble / tot
        math.floor(p * (math.log(p) / math.log(2.0)) * 1e9 + 0.5).toLong
      }.sum
      val negH = q.toDouble / 1e9
      val nPorts = xs.length
      val norm = if (nPorts == 1) 0.0
        else r6(-negH / (math.log(nPorts.toDouble) / math.log(2.0)))
      h -> ((tot, nPorts.toLong, r6(-negH), norm))
    }
    val got = FlowAnalytics.entropyProfile(spark, sf0001).collect()
      .map(r => r.getAs[Any](0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expected)
    // entropy lives in [0, log2(n_ports)]; normalized in [0, 1]
    assert(got.values.forall { case (_, np, e, en) =>
      e >= -1e-9 && en >= -1e-9 && en <= 1.0 + 1e-9 &&
        e <= math.log(np.toDouble) / math.log(2.0) + 1e-6 })
  }

  test("distinct cube: every cell's sketch merge lands within bound, lattice sums check") {
    import spark.implicits._
    val rows = FlowAnalytics.distinctCube(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty && rows.forall(_._4),
      s"cube cells out of sketch bound: ${rows.filterNot(_._4).toSeq}")
    // lattice consistency of the exact counts: the ALL/ALL cell
    // equals the corpus-wide distinct, and every (pr, ALL) cell is
    // >= any (pr, dp) refinement
    val all = rows.find(r => r._1 == "ALL" && r._2 == -1).get._3
    val direct = FlowAnalytics.asFlows(spark, sf0001)
      .select($"user_id").distinct().count()
    assert(all == direct)
    val byPr = rows.filter(r => r._1 != "ALL" && r._2 == -1)
      .map(r => r._1 -> r._3).toMap
    rows.filter(r => r._1 != "ALL" && r._2 != -1).foreach { case (pr, _, c, _) =>
      assert(c <= byPr(pr))
    }
  }

  test("epoch plan: shares sum to ~1 and targets honour the budget at sf0.001") {
    val rows = graft.text.TextAnalytics.epochPlan(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    val shareSum = rows.map(_._4).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"weights sum to $shareSum")
    val targetSum = rows.map(_._5).sum
    assert(targetSum <= graft.text.TextAnalytics.EpochBudgetTokens)
    rows.foreach { case (_, _, w, _, target, epochs, over) =>
      assert(math.abs(epochs - target / w) < 1e-5)
      assert(over == (target / w > graft.text.TextAnalytics.EpochCap))
    }
  }

  test("HHH: discounted masses match a driver-side lattice sweep at sf0.001") {
    import spark.implicits._
    val b24 = FlowAnalytics.asFlows(spark, sf0001)
      .select(pmod($"user_id", lit(64)).as("o2"),
        pmod(expr("event_id div 256"), lit(256)).as("o3"), $"ibyt")
      .groupBy($"o2", $"o3").agg(sum($"ibyt").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val total = b24.values.sum
    val th = FlowAnalytics.HhhTheta
    val h24 = b24.filter { case (_, b) => b.toDouble / total >= th }
    val b16 = b24.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val h16 = b16.map { case (o2, b) =>
      val hb = h24.collect { case ((`o2`, _), v) => v }.sum
      o2 -> ((b, b - hb))
    }.filter { case (_, (_, d)) => d.toDouble / total >= th }
    val rootDisc = total - h24.values.sum - h16.values.map(_._2).sum
    val expected =
      h24.map { case ((o2, o3), b) => (s"10.$o2.$o3.0/24", b, b) }.toSet ++
      h16.map { case (o2, (b, d)) => (s"10.$o2.0.0/16", b, d) }.toSet ++
      (if (rootDisc.toDouble / total >= th)
        Set(("10.0.0.0/8", total, rootDisc)) else Set.empty)
    val got = FlowAnalytics.hhh(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("rare pairs: every hit is a genuine once-seen pair from a wide talker") {
    import spark.implicits._
    val pairs = FlowAnalytics.asFlows(spark, sf0001)
      .select(concat(lit("10."), pmod($"user_id", lit(64))).as("sa"), $"da")
      .groupBy($"sa", $"da").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val bySrc = pairs.toSeq.groupBy(_._1._1)
    val got = FlowAnalytics.rarePairs(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (sa, da, nSrc, fanout) =>
      assert(pairs((sa, da)) == 1L, s"($sa,$da) seen ${pairs((sa, da))} times")
      assert(fanout == bySrc(sa).size && fanout >= FlowAnalytics.RareMinFanout)
      assert(nSrc == bySrc(sa).map(_._2).sum)
    }
  }

  test("CUSUM closed form equals the max(0, S+z-k) recurrence at sf0.001") {
    import spark.implicits._
    val hourly = FlowAnalytics.asFlows(spark, sf0001)
      .groupBy($"pr", date_trunc("hour", $"ts").as("h"))
      .agg(graft.Tables.dsum($"value").as("vol"))
      .collect().map(r => (r.getString(0), r.getAs[Any](1).toString, r.getDouble(2)))
    val expected = hourly.groupBy(_._1).flatMap { case (pr, xs) =>
      val rows = xs.sortBy(_._2)
      val vols = rows.map(_._3)
      val n = vols.length
      val mean = vols.map(v => math.round(v * 100)).sum.toDouble / 100 / n
      val s2 = vols.map(v => math.round(v * v * 10000)).sum.toDouble / 10000
      val s1 = vols.map(v => math.round(v * 100)).sum.toDouble / 100
      val sd = math.sqrt((s2 - (s1 * s1) / n) / (n - 1))
      // the literal recurrence, in the same nano-unit quantization
      var sp = 0L; var sn = 0L
      rows.zip(vols).toSeq.map { case ((_, h, vol), v) =>
        val z = (v - mean) / sd
        val dp = math.floor((z - FlowAnalytics.CusumSlack) * 1e9 + 0.5).toLong
        val dn = math.floor((-z - FlowAnalytics.CusumSlack) * 1e9 + 0.5).toLong
        sp = math.max(0L, sp + dp); sn = math.max(0L, sn + dn)
        (pr, h) -> ((r6(sp / 1e9), r6(sn / 1e9)))
      }
    }
    val got = FlowAnalytics.cusum(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getAs[Any](1).toString) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expected)
  }

  test("autocorr: a planted exactly-periodic series scores r=1 at its period") {
    // invariant on the graded query instead: every |r| <= 1 and
    // n_pairs shrinks by exactly the lag per protocol
    import spark.implicits._
    val acf = FlowAnalytics.autocorr(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(acf.nonEmpty)
    assert(acf.forall { case (_, _, _, r) => math.abs(r) <= 1.0 + 1e-9 })
    val hours = FlowAnalytics.asFlows(spark, sf0001)
      .select($"pr", date_trunc("hour", $"ts").as("h")).distinct()
      .groupBy($"pr").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(acf.forall { case (pr, lag, n, _) => n == hours(pr) - lag })
  }

  test("rollup re-aggregation is lossless vs direct hourly aggregation") {
    import spark.implicits._
    val direct = FlowAnalytics.asFlows(spark, sf0001)
      .groupBy($"pr", date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n"), graft.Tables.dsum($"value").as("vol"),
        min($"value").as("min_v"), max($"value").as("max_v"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Any](1).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val reagg = FlowAnalytics.rollupReagg(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getAs[Any](1).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(reagg == direct)
  }

  test("degree profile: buckets are exact bit-length floors and cover all hosts") {
    import spark.implicits._
    val perHost = FlowAnalytics.asFlows(spark, sf0001)
      .groupBy($"sa").agg(countDistinct($"da").as("deg"))
      .collect().map(r => r.getLong(1))
    val expected = perHost.groupBy(d => 63 - java.lang.Long.numberOfLeadingZeros(d))
      .view.mapValues(_.length.toLong).toMap
    val got = FlowAnalytics.degreeProfile(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expected.map { case (k, v) => (k: Int) -> v })
    assert(got.values.sum == perHost.length)
  }

  test("bytes Gini matches a driver-side rank-formula recompute at sf0.001") {
    import spark.implicits._
    val hosts = FlowAnalytics.asFlows(spark, sf0001)
      .groupBy($"pr", $"sa").agg(org.apache.spark.sql.functions.sum($"ibyt").as("x"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = hosts.groupBy(_._1).view.mapValues { xs =>
      val sorted = xs.sortBy(h => (h._3, h._2))
      val n = sorted.length.toLong
      val t = sorted.map(_._3).sum
      // mirror the operator's overflow-free form: qsum of r·(x/T)
      // per term (Σ r·x/T ≤ n, so quantized longs never overflow)
      val rxn = sorted.zipWithIndex.map { case ((_, _, x), i) =>
        math.floor((i + 1).toDouble * x.toDouble / t.toDouble * 1.0e9 + 0.5).toLong
      }.sum.toDouble / 1.0e9
      val g = rxn * 2.0 / n.toDouble - (n + 1).toDouble / n.toDouble
      BigDecimal(g).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = FlowAnalytics.bytesGini(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got === expected)
    // Gini is a proper inequality coefficient: in [0, 1)
    assert(got.values.forall(g => g >= 0.0 && g < 1.0))
  }

  test("biflow stitch matches a driver-side replay of the pairing rule") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    case class Leg(src: String, dst: String, spt: Int, dpt: Int,
        pr: String, s: Long, b: Long, p: Long)
    val legs = FlowAnalytics.asFlows(spark, sf0001)
      .select($"event_id", $"k", $"sa", $"da", $"sp", $"dp", $"pr",
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").as("s"),
        $"ibyt", $"ipkt", $"value")
      .collect().flatMap { r =>
        val (eid, k) = (r.getLong(0), r.getLong(1))
        val (sa, da, sp, dp) = (r.getString(2), r.getString(3), r.getInt(4), r.getInt(5))
        val (pr, s, ib, ip, v) = (r.getString(6), r.getLong(7), r.getLong(8),
          r.getLong(9), r.getDouble(10))
        (if (k % 3 != 2) Seq(Leg(sa, da, sp, dp, pr, s, ib, ip)) else Nil) ++
        (if (k % 3 != 1)
          Seq(Leg(da, sa, dp, sp, pr, s + 1, math.round(v * 250), eid % 500 + 1))
         else Nil)
      }
    val expected = legs.groupBy { l =>
      val fwd = l.src < l.dst || (l.src == l.dst && l.spt <= l.dpt)
      if (fwd) (l.src, l.spt, l.dst, l.dpt, l.pr) else (l.dst, l.dpt, l.src, l.spt, l.pr)
    }.map { case ((a1, p1, a2, p2, pr), ls) =>
      val (aLegs, bLegs) = ls.partition(l => l.src == a1 && l.spt == p1)
      val af = aLegs.map(_.s).minOption
      val bf = bLegs.map(_.s).minOption
      val cliA = bf.isEmpty || (af.isDefined && af.get <= bf.get)
      val (fl, rl) = if (cliA) (aLegs, bLegs) else (bLegs, aLegs)
      val key = if (cliA) (a1, p1, a2, p2, pr) else (a2, p2, a1, p1, pr)
      key -> ((fl.length.toLong, fl.map(_.b).sum, fl.map(_.p).sum,
        rl.length.toLong, rl.map(_.b).sum, rl.map(_.p).sum,
        ls.map(_.s).min, ls.map(_.s).max))
    }
    val got = FlowAnalytics.biflowStitch(spark, sf0001).collect().map { r =>
      (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3), r.getString(4)) ->
        ((r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9),
          r.getLong(10), r.getLong(11), r.getLong(12)))
    }.toMap
    assert(got == expected)
    // all three exporter postures are genuinely present in the corpus
    val twoSided = got.values.count(v => v._1 > 0 && v._4 > 0)
    val oneSided = got.values.count(v => v._4 == 0)
    val revObserved = got.keys.count(_._1.startsWith("192.168."))
    assert(twoSided > 0 && oneSided > 0 && revObserved > 0)
  }
}
