package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.flow.FlowAnalytics

/** B19: graph analytics over the flow topology — PageRank on the
  * src-IP → dst-IP graph (`flow_pagerank`), the standard "which hosts
  * matter" ranking for network triage (a high-rank dst is a hub that
  * many well-connected sources talk to; the damping walk discounts
  * one-hop noise that plain fan-in counting over-rewards).
  *
  * The 100 TB shape — this is the canonical ITERATIVE join workload:
  *  - the edge table is built ONCE (distinct + out-degree) and
  *    materialized; every iteration joins it against the current rank
  *    table on src and re-aggregates by dst. Ranks are node-sized
  *    (corpus-scale for a graph), so per-iteration state is a real
  *    distributed table, not a broadcast — unlike [[graft.ann.Pca]]
  *    where the iterate is constant-size.
  *  - on a cluster the edge table would be bucketed by src so the
  *    per-iteration shuffle is one-sided (ranks only); contributions
  *    combine map-side (decimal partial sums) before the dst shuffle.
  *  - each round's rank table is checkpointed: the next round reads a
  *    materialized table instead of replaying every prior round (the
  *    same staging policy as D15's cluster propagation).
  *
  * Semantics: fixed [[Iters]] synchronous rounds of
  * r(v) = (1-d)/N + d·Σ_{u→v} r(u)/outdeg(u), uniform init 1/N,
  * dangling mass dropped (the common batch simplification — ranks
  * then sum to < 1; rankings are unaffected at fixed iteration
  * count). Derandomized for the DuckDB oracle like D27: per-edge
  * contributions rounded to 9 dp and summed as DECIMAL(28,9)
  * (order-free), and the damping factor carries 9 generic decimal
  * places — textbook 0.85 would park every 9-dp contribution of a
  * rank/outdeg quotient on an exact .5 tie at probability ~1e-2,
  * exactly where Spark's shortest-repr HALF_UP and DuckDB's scaled
  * binary rounding disagree.
  */
object GraphOps {

  /** ≈0.85 with 9 generic decimal places (tie-avoidance above). */
  val Damping = 0.850000019
  val Iters = 5
  val TopN = 25

  private def rsum(c: Column) =
    sum(round(c, 9).cast(DecimalType(28, 9))).cast("double")

  private def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  def flowPagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val flows = FlowAnalytics.asFlows(spark, dir)
    // model request+reply: each flow contributes both directions —
    // src and dst namespaces are disjoint (10.* vs 192.168.*), so a
    // directed-only graph would leave every dst dangling and the walk
    // would fix after two rounds; the undirected link set makes rank
    // genuinely recirculate
    val edges = flows.select($"sa".as("src"), $"da".as("dst"))
      .union(flows.select($"da".as("src"), $"sa".as("dst")))
      .distinct()
    val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg), built once, reused by every round
    val srcEdges = materialize(edges.join(outdeg, "src"))
    val nodes = materialize(
      edges.select($"src".as("node"))
        .union(edges.select($"dst".as("node"))).distinct())
    val nframe = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(nframe))
      .select($"node", (lit(1.0) / $"n").as("pr"))
    for (_ <- 1 to Iters) {
      val contribs = srcEdges.join(ranks, $"src" === $"node")
        .select($"dst", ($"pr" * lit(Damping) / $"outdeg").as("p"))
        .groupBy($"dst").agg(rsum($"p").as("s"))
      ranks = materialize(
        nodes.join(contribs, $"node" === $"dst", "left")
          .crossJoin(broadcast(nframe))
          .select($"node", round(
            (lit(1.0) - lit(Damping)) / $"n" +
              coalesce($"s", lit(0.0)), 9).as("pr")))
    }
    ranks.orderBy($"pr".desc, $"node").limit(TopN)
      .select($"node", $"pr".as("pagerank"))
  }

  val flowPagerankSql: String = {
    def roundCte(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS MATERIALIZED (
         |  SELECT e.dst,
         |    CAST(sum(CAST(round(r.pr * CAST($Damping AS DOUBLE) / e.outdeg, 9)
         |      AS DECIMAL(28, 9))) AS DOUBLE) AS s
         |  FROM se e JOIN $prev r ON r.node = e.src GROUP BY e.dst),
         |r$i AS MATERIALIZED (
         |  SELECT n.node,
         |    round((CAST(1 AS DOUBLE) - CAST($Damping AS DOUBLE)) / (SELECT n FROM nn)
         |      + coalesce(c.s, CAST(0 AS DOUBLE)), 9) AS pr
         |  FROM nodes n LEFT JOIN c$i c ON c.dst = n.node)""".stripMargin
    }
    val rounds = (1 to Iters).map(roundCte).mkString(",\n")
    FlowAnalytics.flowsCte.replace("WITH flows AS (", "WITH flows AS MATERIALIZED (") +
      s""", edges AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT sa AS src, da AS dst FROM flows
         |    UNION ALL SELECT da AS src, sa AS dst FROM flows)),
         |outdeg AS MATERIALIZED (
         |  SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |se AS MATERIALIZED (
         |  SELECT e.src, e.dst, o.outdeg FROM edges e JOIN outdeg o USING (src)),
         |nodes AS MATERIALIZED (
         |  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
         |r0 AS MATERIALIZED (
         |  SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM nodes),
         |$rounds
         |SELECT node, pr AS pagerank FROM r$Iters
         |ORDER BY pr DESC, node LIMIT $TopN""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "flow_pagerank" -> flowPagerank _)

  val oracleSql: Map[String, String] = Map(
    "flow_pagerank" -> flowPagerankSql)
}
