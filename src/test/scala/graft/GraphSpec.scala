package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** B19: PageRank invariants the oracle replay can't see — mass
  * conservation and the teleport floor, i.e. that the rounds compute
  * an actual damped random walk, not just replayable arithmetic.
  */
class GraphSpec extends SparkSpecBase {

  test("k-truss: planted K5 / triangle / bridge decompose to 5 / 3 / 2") {
    import spark.implicits._
    val k5 = for { i <- 1 to 5; j <- (i + 1) to 5 } yield (i.toLong, j.toLong)
    val tri = Seq((10L, 11L), (10L, 12L), (11L, 12L))
    val bridge = Seq((5L, 10L))
    val edges = (k5 ++ tri ++ bridge).toDF("u", "v")
    val got = graft.graph.GraphOps.ktruss(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.size === 14)
    k5.foreach { e => assert(got(e) === 5, s"K5 edge $e") }
    tri.foreach { e => assert(got(e) === 3, s"triangle edge $e") }
    assert(got((5L, 10L)) === 2, "bridge")
  }

  test("k-truss: empty input keeps the (u, v, trussness) schema") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    val got = graft.graph.GraphOps.ktruss(empty)
    assert(got.columns.toSeq === Seq("u", "v", "trussness"))
    assert(got.select($"u", $"v", $"trussness").count() === 0L)
  }

  test("ktruss4: planted K5 survives with support 3; triangle and bridge peel") {
    import spark.implicits._
    val k5 = for { i <- 1 to 5; j <- (i + 1) to 5 } yield (i.toLong, j.toLong)
    val tri = Seq((10L, 11L), (10L, 12L), (11L, 12L))  // support 1 < 2
    val bridge = Seq((5L, 10L))                        // support 0
    val edges = (k5 ++ tri ++ bridge).toDF("u", "v")
    val got = graft.graph.GraphOps.ktruss4Of(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the 4-truss of this graph is exactly K5; every K5 edge closes 3
    // triangles within the truss
    assert(got === k5.map(_ -> 3L).toMap)
  }

  test("ktruss4: peel round budget throws rather than truncating") {
    import spark.implicits._
    // a chain of triangles peels one edge-layer per round: with a
    // 1-round budget the peel cannot reach the (empty) fixpoint
    val chain = (0 until 6).flatMap { i =>
      val a = i.toLong * 2; Seq((a, a + 1), (a, a + 2), (a + 1, a + 2))
    }
    val e = intercept[IllegalStateException] {
      graft.graph.GraphOps.ktruss4Of(chain.toDF("u", "v"), maxRounds = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  private lazy val full = {
    // same recurrence as the query, but keep ALL nodes (the graded
    // query returns top-25 only)
    import org.apache.spark.sql.SparkSession
    val fn = (s: SparkSession, d: String) => GraphOps.flowPagerank(s, d)
    fn(spark, sf0001)
  }

  test("rank mass is conserved and every node clears the teleport floor") {
    import spark.implicits._
    val flows = graft.flow.FlowAnalytics.asFlows(spark, sf0001)
    val edges = flows.select($"sa".as("src"), $"da".as("dst"))
      .union(flows.select($"da".as("src"), $"sa".as("dst"))).distinct()
    val n = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node"))).distinct().count()
    val floor = (1.0 - GraphOps.Damping) / n
    val top = full.collect()
    assert(top.length == GraphOps.TopN)
    // undirected link set → no dangling nodes → total mass stays 1
    // up to the 9-dp per-node rounding; top-25 must each be ≥ floor
    // (teleport) and ≤ 1
    top.foreach { r =>
      val pr = r.getAs[Double]("pagerank")
      assert(pr >= floor - 1e-9, s"rank below teleport floor: $r (floor $floor)")
      assert(pr < 1.0, s"rank above total mass: $r")
    }
    // the top-ranked node must beat the uniform rank — otherwise the
    // walk did nothing
    assert(top.head.getAs[Double]("pagerank") > 1.0 / n,
      "top rank did not exceed the uniform distribution")
  }

  test("HITS: score vectors are unit-norm and the top authority is a " +
      "high-in-degree dst") {
    import spark.implicits._
    val out = GraphOps.flowHits(spark, sf0001).collect()
    assert(out.length == 2 * GraphOps.HitsTopN)
    val (auths, hubs) = out.partition(_.getString(0) == "authority")
    assert(auths.length == GraphOps.HitsTopN && hubs.length == GraphOps.HitsTopN)
    // namespaces must not leak across roles
    auths.foreach(r => assert(r.getString(1).startsWith("192.168."), r.toString))
    hubs.foreach(r => assert(r.getString(1).startsWith("10."), r.toString))
    // normalization: top-10 squared mass must be ≤ 1 (full vector is
    // unit-norm; the graded query only exposes the top slice)
    Seq(auths, hubs).foreach { part =>
      val mass = part.map(r => math.pow(r.getDouble(2), 2)).sum
      assert(mass <= 1.0 + 1e-6 && mass > 0, s"squared mass $mass out of range")
    }
    // mutual reinforcement: the top authority must have above-median
    // in-degree (authority ≈ weighted in-degree after one round;
    // later rounds reweight by hub quality but must not surface a
    // poorly-connected dst)
    val flows = graft.flow.FlowAnalytics.asFlows(spark, sf0001)
    val indeg = flows.select($"sa", $"da").distinct()
      .groupBy($"da").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val degs = indeg.values.toSeq.sorted
    val median = degs(degs.size / 2)
    val topDeg = indeg(auths.head.getString(1))
    info(s"top authority in-degree $topDeg vs median $median")
    assert(topDeg > median,
      s"top authority has in-degree $topDeg, not above median $median")
  }

  test("bipartite LPA: small-SF communities are exactly user+service stars") {
    import spark.implicits._
    val out = GraphOps.flowCommunities(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= GraphOps.LpaTopN)
    // after round 1 every label is a user label (services vote first)
    out.foreach(r => assert(r.getString(0).startsWith("u:"),
      s"community label is not a user label: ${r.getString(0)}"))
    // at sf0.001 user_id < 256, so the da namespace partitions by
    // user: every community must be exactly one user plus their
    // distinct services — compare the full top-N size profile
    val flows = graft.flow.FlowAnalytics.asFlows(spark, sf0001)
    val expected = flows
      .select($"user_id", $"da").distinct()
      .groupBy($"user_id").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("nda"))
      .collect().map(_.getLong(1) + 1)
      .sorted.reverse.take(GraphOps.LpaTopN).toSeq
    val sizes = out.map(_.getLong(1)).toSeq
    info(s"top community sizes: ${sizes.take(5)} (expected ${expected.take(5)})")
    assert(sizes == expected,
      s"community sizes diverged from the star profile: $sizes vs $expected")
  }

  test("triangles: planted K4 + path counts exactly, coefficient in [0,1]") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node: deg 3, 3 triangles, coefficient 1)
    // plus a path 5-6-7 (no triangles; node 6 deg 2, coefficient 0)
    // — includes the degree-tie orientation case (all K4 degrees equal)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L)).toDF("u", "v")
    val got = GraphOps.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    (1L to 4L).foreach { n =>
      assert(got(n) == ((3L, 3L, 1.0)), s"K4 node $n: ${got(n)}")
    }
    assert(got(5L) == ((1L, 0L, 0.0)) && got(7L) == ((1L, 0L, 0.0)))
    assert(got(6L) == ((2L, 0L, 0.0)))
  }

  test("triangles: graded query matches a brute-force recount at sf0.001") {
    import spark.implicits._
    import graft.functions.StrFuncs.md5_prefix
    val li = graft.Tables.load(spark, sf0001, "lineitem")
    val op = li.select($"l_orderkey".as("ok"), $"l_partkey".as("p"))
      .where(md5_prefix(concat(lit("tri:"), $"p".cast("string")), 7)
        % GraphOps.TriSampleMod === 0)
      .distinct()
    val edgePairs = op.join(op.withColumnRenamed("p", "q"), "ok")
      .where($"p" < $"q")
      .select($"p".as("u"), $"q".as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // driver-side brute force over the (small) sf0.001 edge set
    val adj = edgePairs.foldLeft(Map.empty[Long, Set[Long]]) {
      case (m, (u, v)) =>
        m.updated(u, m.getOrElse(u, Set.empty) + v)
          .updated(v, m.getOrElse(v, Set.empty) + u)
    }
    val triPerNode = adj.map { case (n, nbrs) =>
      val s = nbrs.toSeq
      n -> s.combinations(2).count { case Seq(a, b) =>
        edgePairs.contains((math.min(a, b), math.max(a, b)))
      }.toLong
    }
    val got = GraphOps.graphTriangles(spark, sf0001).collect()
    assert(got.length == GraphOps.TriTopN)
    got.foreach { r =>
      val (node, deg, tri) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(adj(node).size.toLong == deg, s"deg mismatch at $node")
      assert(triPerNode(node) == tri,
        s"triangle count mismatch at $node: got $tri want ${triPerNode(node)}")
      val c = r.getDouble(3)
      assert(c >= 0.0 && c <= 1.0, s"clustering out of range at $node: $c")
    }
    // the top-20 must really be the global top by (triangles desc, node)
    val expectTop = triPerNode.toSeq
      .sortBy { case (n, t) => (-t, n) }.take(GraphOps.TriTopN).map(_._2)
    assert(got.map(_.getLong(2)).toSeq == expectTop,
      "top-20 triangle counts are not the global maxima")
  }

  test("personalized PageRank: seeds hold the teleport floor, mass stays near seeds") {
    import spark.implicits._
    val flows = graft.flow.FlowAnalytics.asFlows(spark, sf0001)
    val seedSet = flows.where($"flg" === ".A.R..")
      .groupBy($"da").agg(count(lit(1)).as("e"))
      .orderBy($"e".desc, $"da").limit(GraphOps.PprSeeds)
      .collect().map(_.getString(0)).toSet
    assert(seedSet.size == GraphOps.PprSeeds)
    val top = GraphOps.flowPagerankPers(spark, sf0001).collect()
    assert(top.length == GraphOps.TopN)
    val byNode = top.map(r => r.getString(0) -> r.getDouble(1)).toMap
    // every rank is a probability mass: [0, 1]
    byNode.values.foreach(p => assert(p >= 0.0 && p < 1.0))
    // each seed keeps at least its own teleport share
    val floor = (1.0 - GraphOps.Damping) / GraphOps.PprSeeds
    seedSet.foreach { s =>
      assert(byNode.contains(s), s"seed $s fell out of the top ranks")
      assert(byNode(s) >= floor - 1e-9, s"seed $s below teleport floor")
    }
    // the walk propagates: non-seed nodes carry positive rank
    assert(top.exists(r => !seedSet(r.getString(0)) && r.getDouble(1) > 0),
      "no rank mass escaped the seed set")
  }

  test("hubs outrank leaves: top nodes are dst-side concentrators") {
    // da values collide across flows (192.168.k%256.user%256) while
    // sa values are nearly unique per event — the walk must surface
    // the high-degree da side at the top
    val top = full.collect().map(_.getString(0))
    val daShare = top.count(_.startsWith("192.168.")).toDouble / top.length
    info(f"dst-side share of top-${GraphOps.TopN}: $daShare%.2f")
    assert(daShare > 0.8,
      s"expected dst-side hubs to dominate the top ranks, got $daShare")
  }

  test("modularity: contributions reconcile from published counts and Q is strongly positive") {
    val rows = GraphOps.modularity(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (_, ec, dc, m, contrib, _) =>
      val t = dc.toDouble / (2.0 * m)
      assert(contrib == r6(ec.toDouble / m - t * t))
      assert(ec <= dc, "internal edges exceed community degree mass")
    }
    // LPA on the bipartite user–service stars finds real structure:
    // Q well above the random-null 0
    val q = rows.head._6
    info(f"modularity Q = $q%.4f")
    assert(rows.forall(_._6 == q))
    assert(q > 0.2 && q <= 1.0, s"implausible modularity $q")
  }

  test("assortativity matches a driver-side Pearson recompute at sf0.001") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edges = graft.flow.FlowAnalytics.asFlows(spark, sf0001)
      .select(concat(lit("10."), pmod($"user_id", lit(64))).as("src"),
        concat(lit("192.168."), pmod($"k", lit(256))).as("dst"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val xd = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val yd = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val xy = edges.map { case (s, d) => (xd(s), yd(d)) }
    val m = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum.toDouble, xy.map(_._2).sum.toDouble)
    val sxx = xy.map(p => p._1 * p._1).sum.toDouble
    val syy = xy.map(p => p._2 * p._2).sum.toDouble
    val sxy = xy.map(p => p._1 * p._2).sum.toDouble
    val r = (m * sxy - sx * sy) /
      math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    val row = GraphOps.assortativity(spark, sf0001).collect().head
    assert(row.getLong(0) == xy.length.toLong)
    assert(math.abs(row.getDouble(1) - r) < 1e-6)
    // the bipartite site->service graph is a meaningful topology:
    // the coefficient is a real number in [-1, 1]
    assert(row.getDouble(1) >= -1.0 && row.getDouble(1) <= 1.0)
  }

  test("incremental PageRank: warm-start beats a cold start at the same round budget") {
    // the operator's reason to exist, measured: after IncrRounds
    // rounds on the full graph, the warm-started vector must sit
    // strictly closer (L1 over the top-N intersection universe) to
    // the converged full walk than a cold uniform start given the
    // same budget. Uses the graded outputs only — flow_pagerank is
    // the converged reference, flow_pagerank_incr the warm result.
    import spark.implicits._
    val converged = GraphOps.flowPagerank(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val warm = GraphOps.flowPagerankIncr(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // cold baseline at the same budget: rebuild B19's walk truncated
    // to IncrRounds via the public pieces — run the full query's
    // recurrence by hand on collected edges (sf0.001: tiny)
    val flows = graft.flow.FlowAnalytics.asFlows(spark, sf0001)
    val e = flows.select($"sa", $"da").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    val und = (e ++ e.map(p => (p._2, p._1))).distinct
    val outdeg = und.groupBy(_._1).view.mapValues(_.length).toMap
    val nodes = und.flatMap(p => Seq(p._1, p._2)).distinct
    val n = nodes.length
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var cold = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to GraphOps.IncrRounds) {
      val contrib = und.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        math.floor(cold(s) * GraphOps.Damping / outdeg(s) * 1e9 + 0.5).toLong
      }.sum / 1e9).toMap
      cold = nodes.map(v => v ->
        r9((1.0 - GraphOps.Damping) / n + contrib.getOrElse(v, 0.0))).toMap
    }
    val keys = converged.keySet
    def l1(m: Map[String, Double]) =
      keys.toSeq.map(k => math.abs(m.getOrElse(k, 0.0) - converged(k))).sum
    assert(l1(warm) < l1(cold),
      s"warm-start L1 ${l1(warm)} must beat cold L1 ${l1(cold)} at ${GraphOps.IncrRounds} rounds")
  }
}
