package graft

import org.apache.spark.sql.functions._
import graft.graph.{GraphOps, GraphSearch}

/** B23–B25 invariants the oracle replay can't see: BFS really
  * computes MIN hop distances (brute-force recheck), k-core peeling
  * reaches the true fixed point (planted graph + brute recheck), and
  * the link-Jaccard scores are the exact neighborhood statistics.
  */
class GraphSearchSpec extends SparkSpecBase {

  test("BFS: hop histogram matches a driver-side BFS at sf0.001") {
    import spark.implicits._
    val flows = graft.flow.FlowAnalytics.asFlows(spark, sf0001)
    val edgePairs = flows
      .select(concat(lit("u:"), $"user_id").as("u"), $"da").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    val adj = edgePairs.foldLeft(Map.empty[String, Set[String]]) {
      case (m, (s, d)) =>
        m.updated(s, m.getOrElse(s, Set.empty) + d)
          .updated(d, m.getOrElse(d, Set.empty) + s)
    }
    val seeds = adj.toSeq
      .sortBy { case (n, nbrs) => (-nbrs.size, n) }
      .take(GraphSearch.BfsSeeds).map(_._1)
    // driver-side layered BFS
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds.toSet
    var hop = 0
    while (frontier.nonEmpty) {
      hop += 1
      val next = frontier.flatMap(adj).diff(dist.keySet)
      dist = dist ++ next.map(_ -> hop)
      frontier = next
    }
    val expected = adj.keys.toSeq.map(n => dist.getOrElse(n, -1))
      .groupBy(identity).map { case (h, xs) => (h, xs.size.toLong) }
    val got = GraphSearch.bfsHops(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expected, s"histogram diverged: $got vs $expected")
    // seeds occupy hop 0 exactly; every node is accounted for
    assert(got(0) == GraphSearch.BfsSeeds.toLong)
    assert(got.values.sum == adj.size.toLong)
  }

  test("k-core: planted K5 survives k=4 peeling, chain and star peel away") {
    import spark.implicits._
    // K5 on {1..5}; a chain 10-11-12-13; a star centered at 20 with 6
    // leaves (degree 6 but every leaf degree 1 → whole star peels);
    // a pendant 6 hanging off the K5 (peels, K5 unaffected)
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val chain = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    val star = (21L to 26L).map(l => (20L, l))
    val pendant = Seq((5L, 6L))
    val edges = (k5 ++ chain ++ star ++ pendant).toDF("u", "v")
    val got = GraphSearch.kcoreOf(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 5L).map(_ -> 4L).toMap,
      s"expected exactly K5 with degree 4 each, got $got")
  }

  test("k-core: graded query matches driver-side peeling at sf0.001") {
    import spark.implicits._
    val edgePairs = GraphOps.coOrderEdges(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var edges = edgePairs
    var stable = false
    while (!stable) {
      val deg = edges.toSeq.flatMap { case (u, v) => Seq(u, v) }
        .groupBy(identity).map { case (n, xs) => (n, xs.size) }
      val keep = deg.filter(_._2 >= GraphSearch.KcoreK).keySet
      val next = edges.filter { case (u, v) => keep(u) && keep(v) }
      stable = next.size == edges.size
      edges = next
    }
    val expectedDeg = edges.toSeq.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (n, xs) => (n, xs.size.toLong) }
    val expectTop = expectedDeg.toSeq
      .sortBy { case (n, d) => (-d, n) }.take(GraphSearch.KcoreTopN)
    val got = GraphSearch.kcore(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expectTop, s"k-core top diverged: $got vs $expectTop")
  }

  test("link Jaccard: exact neighborhood stats at sf0.001, no existing edges") {
    import spark.implicits._
    val edgePairs = GraphOps.coOrderEdges(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edgePairs.foldLeft(Map.empty[Long, Set[Long]]) {
      case (m, (u, v)) =>
        m.updated(u, m.getOrElse(u, Set.empty) + v)
          .updated(v, m.getOrElse(v, Set.empty) + u)
    }
    val got = GraphSearch.linkJaccard(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (u, v, common, j) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(u < v, s"pair not canonical: $r")
      assert(!edgePairs((u, v)), s"scored an existing edge: $r")
      val inter = adj(u).intersect(adj(v)).size
      val union = adj(u).union(adj(v)).size
      assert(inter.toLong == common, s"common mismatch at ($u,$v): $r vs $inter")
      assert(common >= GraphSearch.LjMinCommon)
      // HALF_UP like Spark's round()
      val expectJ = BigDecimal(inter.toDouble / union)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j == expectJ, s"jaccard mismatch at ($u,$v): $j vs $expectJ")
    }
    // the returned slice must be the global top by (ROUNDED jaccard,
    // u, v) — the query orders on the rounded score, so ties the
    // rounding creates must break by pair id here too
    val all = (for {
      u <- adj.keys; v <- adj.keys if u < v && !edgePairs((u, v))
      inter = adj(u).intersect(adj(v)).size
      if inter >= GraphSearch.LjMinCommon
    } yield (u, v,
      BigDecimal(inter.toDouble / adj(u).union(adj(v)).size)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSeq.sortBy { case (u, v, j) => (-j, u, v) }
      .take(GraphSearch.LjTopN)
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      all.map { case (u, v, _) => (u, v) },
      "top slice is not the global maximum set")
  }

  test("SSSP: distance histogram matches a driver-side Dijkstra at sf0.001") {
    import spark.implicits._
    def md5w(src: String, dst: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$src>$dst".getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString.take(7)
      java.lang.Long.parseLong(hex, 16) % 4 + 1
    }
    val flows = graft.flow.FlowAnalytics.asFlows(spark, sf0001)
    val pairs = flows
      .select(concat(lit("u:"), $"user_id").as("u"), $"da").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
      .map { case (s, d) => (s, d, md5w(s, d)) }
    val adj = edges.groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3))).toMap
    val seeds = adj.toSeq
      .sortBy { case (n, out) => (-out.size, n) }
      .take(GraphSearch.SsspSeeds).map(_._1)
    // driver-side Dijkstra from the multi-source super-node
    val dist = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
    val pq = scala.collection.mutable.PriorityQueue(
      seeds.map(s => (0L, s)): _*)(Ordering.by(x => -x._1))
    while (pq.nonEmpty) {
      val (d0, n) = pq.dequeue()
      if (dist(n) == d0)
        for ((m, w) <- adj.getOrElse(n, Array.empty[(String, Long)]))
          if (!dist.contains(m) || d0 + w < dist(m)) {
            dist(m) = d0 + w; pq.enqueue((d0 + w, m))
          }
    }
    val expected = adj.keys.toSeq.map(n => dist.getOrElse(n, -1L))
      .groupBy(identity).map { case (d, xs) => (d, xs.size.toLong) }
    val got = GraphSearch.sssp(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("sampled closeness: Eppstein–Wang estimate within the Hoeffding " +
      "bound of an exact all-pairs recompute at sf0.001") {
    import spark.implicits._
    val flows = graft.flow.FlowAnalytics.asFlows(spark, sf0001)
    val edgePairs = flows
      .select(concat(lit("u:"), $"user_id").as("u"), $"da").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    val adj = edgePairs.foldLeft(Map.empty[String, Set[String]]) {
      case (m, (s, d)) =>
        m.updated(s, m.getOrElse(s, Set.empty) + d)
          .updated(d, m.getOrElse(d, Set.empty) + s)
    }
    def bfsFrom(s: String): Map[String, Int] = {
      var dist = Map(s -> 0); var frontier = Set(s); var hop = 0
      while (frontier.nonEmpty) {
        hop += 1
        val next = frontier.flatMap(adj).diff(dist.keySet)
        dist = dist ++ next.map(_ -> hop); frontier = next
      }
      dist
    }
    // the query's universe: the component of the top-degree hub
    val hub = adj.toSeq.sortBy { case (v, nb) => (-nb.size, v) }.head._1
    val nodes = bfsFrom(hub).keySet.toSeq.sorted
    val n = nodes.size
    assert(n > GraphSearch.CloseSampleTopN,
      "giant component too small to exercise the top-N cut")
    // exact all-pairs distances within the component (fine at sf0.001)
    val exact = nodes.map(v => v -> bfsFrom(v)).toMap
    val diameter = nodes.map(v => exact(v).values.max).max
    val trueAvg = nodes.map(v => v -> exact(v).values.sum.toDouble / (n - 1)).toMap

    val k = GraphSearch.CloseSampleSeeds
    // derandomized uniform sample: first k nodes in (md5, node) order,
    // exactly the query's rule
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    val seeds = nodes.sortBy(v => (md5hex(v), v)).take(k)

    val got = GraphSearch.closenessSampled(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length <= GraphSearch.CloseSampleTopN)
    // estimator internals replay: sum_dist is the exact seed-distance
    // sum, est_avg = n/(k(n-1))·sum, closeness = inverse
    got.foreach { case (v, sumDist, estAvg, cEst) =>
      val expSum = seeds.map(s => exact(s)(v).toLong).sum
      assert(sumDist == expSum, s"$v: sum_dist $sumDist != $expSum")
      val exp = n.toDouble * sumDist / (k.toDouble * (n - 1))
      assert(math.abs(estAvg - BigDecimal(exp).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      assert(math.abs(cEst * estAvg - 1.0) < 1e-6)
    }
    // Eppstein–Wang / Hoeffding guarantee: with k samples, every
    // node's estimated average distance is within ε·Δ of the truth
    // w.p. ≥ 1 − 1/n for ε = sqrt(ln(2n²)/(2k)). The sample here is
    // deterministic (md5-order), so we assert the bound OUTRIGHT —
    // it must hold for every output node on this corpus
    val eps = math.sqrt(math.log(2.0 * n * n) / (2.0 * k))
    val bound = eps * diameter
    got.foreach { case (v, _, estAvg, _) =>
      assert(math.abs(estAvg - trueAvg(v)) <= bound,
        s"$v: |${estAvg} - ${trueAvg(v)}| > ε·Δ = $bound (ε=$eps, Δ=$diameter)")
    }
    // and the output really is the global top by estimated closeness
    val gotNodes = got.map(_._1).toSeq
    assert(gotNodes == gotNodes.sorted(Ordering.by((v: String) =>
      (got.find(_._1 == v).get._2, v))).toSeq)
  }

  test("betweenness: all-sources run on a planted path is exact Brandes") {
    import spark.implicits._
    // path a-b-c-d-e: directed-dependency betweenness (both
    // directions summed) is b=6, c=8, d=6, endpoints 0
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val eSrc = path.toDF("src", "dst")
      .unionAll(path.map(_.swap).toDF("src", "dst"))
    val seeds = Seq("a", "b", "c", "d", "e").toDF("seed")
    val nFrame = Seq(5L).toDF("n")
    val got = GraphSearch.betweennessOf(eSrc, seeds, nFrame, k = 5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got("b") === ((6000000000L, 6.0)))
    assert(got("c") === ((8000000000L, 8.0)))
    assert(got("d") === ((6000000000L, 6.0)))
    assert(got("a")._1 === 0L)
    assert(got("e")._1 === 0L)
  }

  test("sampled betweenness: bc_q replays the quantized Brandes sweep " +
      "exactly and the estimate is Hoeffding-close to exact at sf0.001") {
    import spark.implicits._
    val flows = graft.flow.FlowAnalytics.asFlows(spark, sf0001)
    val edgePairs = flows
      .select(concat(lit("u:"), $"user_id").as("u"), $"da").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    val adj = edgePairs.foldLeft(Map.empty[String, Set[String]]) {
      case (m, (s, d)) =>
        m.updated(s, m.getOrElse(s, Set.empty) + d)
          .updated(d, m.getOrElse(d, Set.empty) + s)
    }
    def bfsFrom(s: String): Map[String, Int] = {
      var dist = Map(s -> 0); var frontier = Set(s); var hop = 0
      while (frontier.nonEmpty) {
        hop += 1
        val next = frontier.flatMap(adj).diff(dist.keySet)
        dist = dist ++ next.map(_ -> hop); frontier = next
      }
      dist
    }
    val hub = adj.toSeq.sortBy { case (v, nb) => (-nb.size, v) }.head._1
    val nodes = bfsFrom(hub).keySet.toSeq.sorted
    val n = nodes.size
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    val k = GraphSearch.BtwSeeds
    val seeds = nodes.sortBy(v => (md5hex(v), v)).take(k)

    // Brandes from one source: (real-valued δ, q9-quantized δ) — the
    // quantized variant replicates the query's exact parse tree
    def brandes(s: String): (Map[String, Double], Map[String, Long]) = {
      val dist = bfsFrom(s)
      val maxH = dist.values.max
      val layers = (0 to maxH).map(h => dist.filter(_._2 == h).keySet)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      for (h <- 1 to maxH; v <- layers(h))
        sigma(v) = adj(v).filter(p => dist.get(p).contains(h - 1))
          .map(sigma).sum
      val delta = scala.collection.mutable.Map[String, Double]()
      val deltaQ = scala.collection.mutable.Map[String, Long]()
      for (h <- maxH to 1 by -1; v <- layers(h)) {
        val succs = adj(v).filter(w => dist.get(w).contains(h + 1))
        delta(v) = succs.toSeq.map(w =>
          sigma(v).toDouble / sigma(w) * (1.0 + delta(w))).sum
        deltaQ(v) = succs.toSeq.map(w =>
          math.floor(sigma(v).toDouble / sigma(w).toDouble
            * (1.0e9 + deltaQ(w).toDouble) + 0.5).toLong).sum
      }
      (delta.toMap, deltaQ.toMap)
    }
    val sampled = seeds.map(brandes)
    val bcQ = sampled.flatMap(_._2.toSeq).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val exactAll = nodes.map(brandes).flatMap(_._1.toSeq).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap

    val got = GraphSearch.betweennessSampled(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty && got.length <= GraphSearch.BtwTopN)
    got.foreach { case (v, q, est) =>
      // exact replay of the quantized sweep
      assert(q === bcQ.getOrElse(v, 0L), s"$v: bc_q $q != replay")
      val exp = n.toDouble / k * (q.toDouble / 1.0e9)
      assert(math.abs(est - BigDecimal(exp).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      // Hoeffding over the k sampled per-source dependencies, each in
      // [0, n-2]: |n/k·Σ_sample δ − Σ_all δ| ≤ n·ε·(n−2) w.p. ≥ 1−1/n
      // for ε = sqrt(ln(2n²)/(2k)); the md5 sample is deterministic,
      // so assert the bound outright
      val eps = math.sqrt(math.log(2.0 * n * n) / (2.0 * k))
      assert(math.abs(est - exactAll.getOrElse(v, 0.0)) <=
        n * eps * (n - 2),
        s"$v: |$est - ${exactAll.getOrElse(v, 0.0)}| > Hoeffding bound")
    }
    // output ordering: bc_q desc, node asc
    val keys = got.map { case (v, q, _) => (-q, v) }.toSeq
    assert(keys == keys.sorted)
  }
}
