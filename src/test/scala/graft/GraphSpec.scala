package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** B19: PageRank invariants the oracle replay can't see — mass
  * conservation and the teleport floor, i.e. that the rounds compute
  * an actual damped random walk, not just replayable arithmetic.
  */
class GraphSpec extends SparkSpecBase {

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
}
