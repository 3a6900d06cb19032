package graft.graph

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.flow.FlowAnalytics

/** B23–B25: graph traversal + structure queries that complete the
  * graph family — multi-source BFS (reachability/hop radius), k-core
  * decomposition (density peeling), and neighborhood-Jaccard link
  * prediction. Each brings an execution shape the B19–B22 set does
  * not have: BFS is a DELTA iteration (per-round work proportional to
  * the frontier, not the graph), k-core is a monotone PEELING loop
  * (the working set only shrinks), and link Jaccard is an exact
  * all-pairs wedge aggregation over the color-sampled graph.
  */
object GraphSearch {

  // Checkpoint with AQE off so the staged leaf keeps its hash
  // partitioning (see Staging.preservePartitioning) — the peel /
  // frontier loops re-join staged state on its own key every round.
  private def materialize(df: DataFrame): DataFrame =
    graft.Staging.preservePartitioning(df.sparkSession) {
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()
    }

  private def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.optimizedPlan.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Free a superseded peel/frontier round (same policy as the dedup
    * pipelines: cached blocks and, on the reliable-checkpoint path,
    * the durable files — Spark's cleaner only removes those behind a
    * non-default flag).
    */
  private def release(dfs: DataFrame*): Unit =
    dfs.foreach { df =>
      backingRdd(df).foreach { rdd =>
        rdd.unpersist(blocking = true)
        rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
        }
      }
    }

  /** The undirected user↔service contact graph's base tables, staged
    * per (session, dir) + lake exactly like GraphOps' edge tables: in
    * production the graph is BUILT once per corpus snapshot and
    * queried many times — BFS, closeness (exact + sampled) and SSSP
    * all read the same persisted tables; rebuilding them per query
    * was a harness artifact (measured: the edge build dominated each
    * of the four consumers' bench cost).
    */
  private val sessionStage = new graft.Staging.SessionCache()

  private def contactEdges(spark: SparkSession, dir: String): DataFrame =
    sessionStage.getOrBuild(spark, dir, "search_ue_edges", Seq("src")) {
      import spark.implicits._
      val ue = FlowAnalytics.asFlows(spark, dir)
        .select(concat(lit("u:"), $"user_id").as("src"), $"da".as("dst"))
      materialize(ue.union(ue.select($"dst".as("src"), $"src".as("dst")))
        .distinct().repartition($"src"))
    }

  /** Degrees double as the node universe (undirected ⇒ every node
    * appears as src).
    */
  private def contactDeg(spark: SparkSession, dir: String): DataFrame =
    sessionStage.getOrBuild(spark, dir, "search_ue_deg", Seq("node")) {
      import spark.implicits._
      materialize(contactEdges(spark, dir)
        .groupBy($"src".as("node")).agg(count(lit(1)).as("deg")))
    }

  /** Drop the staged contact-graph tables for `(spark, dir)`. */
  def invalidate(spark: SparkSession, dir: String): Unit =
    sessionStage.invalidate(spark, dir)

  // ---------------------------------------------------------------- B23 BFS

  /** B23: multi-source BFS over the undirected user↔service contact
    * graph (`graph_bfs_hops`) — hop distance from the [[BfsSeeds]]
    * highest-degree nodes to every node, reported as a hop histogram
    * (unreached = -1). The triage question behind it: lateral-movement
    * blast radius — how many accounts and services sit within k hops
    * of the most-shared services. (The sa↔da graph is the WRONG
    * subject here: sa values are event-unique, so that graph is a
    * union of depth-≤2 stars; the user↔service graph is the one with
    * real multi-hop structure — users share services, services link
    * users — the same contact graph B21's communities partition.)
    *
    * The 100 TB shape is the textbook FRONTIER (delta) iteration, the
    * one iterative pattern B19–B22 don't exercise:
    *  - each round joins ONLY the newly-discovered frontier against
    *    the staged hash(src) edge table — per-round cost is
    *    O(edges touched by the frontier), and every node is expanded
    *    exactly once, so the WHOLE traversal costs O(E) total, unlike
    *    PageRank's fixed full-graph cost per round;
    *  - the frontier is small → AQE broadcasts it into the edge join
    *    (no edge-side shuffle ever — the edge table is staged
    *    pre-partitioned once);
    *  - visited-set membership is a left-anti join against the union
    *    of materialized PER-LAYER leaves (each a LogicalRDD — no
    *    recompute, no single growing table rewritten per round).
    * Converges when the frontier empties; [[BfsHopCap]] is both the
    * runaway backstop (throws — a silent cap would mislabel deep
    * nodes) and the oracle's recursion bound, so Spark and the replay
    * agree by construction on any graph they don't throw on.
    */
  val BfsSeeds = 5
  val BfsHopCap = 16

  def bfsHops(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the hop histogram is a converged per-snapshot measurement
    // (deterministic top-degree seeds) — staged session+lake like the
    // centrality tables; re-sorted on read
    val hist = sessionStage.getOrBuild(spark, dir, "bfs_hops_hist") {
      materialize(bfsHopsOf(spark, dir))
    }
    hist.orderBy($"hops")
  }

  private def bfsHopsOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // undirected user↔service contacts: same link set as B21's LPA
    val eSrc = contactEdges(spark, dir)
    val deg = contactDeg(spark, dir)
    val seeds = deg.orderBy($"deg".desc, $"node").limit(BfsSeeds)
    var frontier = materialize(seeds.select($"node", lit(0).as("hop")))
    val layers = ArrayBuffer(frontier)
    var hop = 0
    var done = frontier.count() == 0L
    while (!done) {
      hop += 1
      if (hop > BfsHopCap)
        throw new IllegalStateException(
          s"bfsHops frontier still live after $BfsHopCap hops — raise the cap " +
            "(the oracle recursion bound must move with it)")
      val seen = layers.map(_.select($"node")).reduce(_ unionAll _)
      val next = materialize(
        eSrc.join(frontier.select($"node".as("src")), "src")
          .select($"dst".as("node")).distinct()
          .join(seen, Seq("node"), "left_anti")
          .select($"node", lit(hop).as("hop")))
      if (next.count() == 0L) { release(next); done = true }
      else { layers += next; frontier = next }
    }
    val reached = layers.map(l => l.select($"node", $"hop")).reduce(_ unionAll _)
    deg.join(reached, Seq("node"), "left")
      .select(coalesce($"hop", lit(-1)).as("hops"))
      .groupBy($"hops").agg(count(lit(1)).as("n_nodes"))
      .orderBy($"hops")
  }

  val bfsHopsSql: String =
    FlowAnalytics.flowsCte.replace(
      "WITH flows AS (", "WITH RECURSIVE flows AS MATERIALIZED (") +
      s""", edges AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT 'u:' || user_id AS src, da AS dst FROM flows
         |    UNION ALL SELECT da AS src, 'u:' || user_id AS dst FROM flows)),
         |deg AS MATERIALIZED (
         |  SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
         |seeds AS MATERIALIZED (
         |  SELECT node FROM deg ORDER BY deg DESC, node LIMIT $BfsSeeds),
         |reach(node, hop) AS (
         |  SELECT node, 0 FROM seeds
         |  UNION
         |  SELECT e.dst, r.hop + 1 FROM reach r JOIN edges e ON e.src = r.node
         |  WHERE r.hop < $BfsHopCap),
         |mh AS MATERIALIZED (
         |  SELECT node, min(hop) AS hop FROM reach GROUP BY node)
         |SELECT coalesce(mh.hop, -1) AS hops, count(*) AS n_nodes
         |FROM deg d LEFT JOIN mh ON mh.node = d.node
         |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------- B49 closeness

  /** B49: seeded closeness + harmonic centrality
    * (`graph_closeness`) — "how central are the hubs, numerically":
    * for each of the [[BfsSeeds]] top-degree seeds, exact closeness
    * C = (r−1)/Σd and harmonic H = Σ 1/d over its BFS ball. The
    * per-SEED sweep is the production shape for centrality at scale —
    * exact all-nodes closeness is O(V·E) and nobody runs it; sampled
    * seed sets (here: the degree top-K) are the standard estimator
    * (Eppstein–Wang). Execution is B23's delta iteration with the
    * frontier keyed by (seed, node): per-round work proportional to
    * the union of the K frontiers, every join on the staged hash(src)
    * edge table.
    *
    * Determinism: distances are exact integers; Σd and the reach
    * count are integer aggregates; closeness is ONE rounded division.
    * Harmonic sums 1/d in FIXED-POINT integer arithmetic —
    * count_d · (10⁹ div d) summed as longs (the truncation is part of
    * the metric's definition here, identical in both engines) — so no
    * float addition order exists at all.
    */
  /** Per-seed layered BFS over the staged symmetric edge table:
    * returns the union of materialized per-layer leaves as
    * (seed, node, hop) minimum hop distances (hop 0 = the seed
    * itself). The B23 frontier/delta iteration run once per seed
    * stripe — shared by B49's exact seeded sweep and B49b's
    * Eppstein–Wang all-nodes estimator.
    */
  private def seededBfs(eSrc: DataFrame, seeds: DataFrame,
      what: String): DataFrame = {
    import eSrc.sparkSession.implicits._
    var frontier = materialize(seeds.select($"seed", $"seed".as("node"), lit(0).as("hop")))
    val layers = ArrayBuffer(frontier)
    var hop = 0
    var done = frontier.count() == 0L
    while (!done) {
      hop += 1
      if (hop > BfsHopCap)
        throw new IllegalStateException(
          s"$what frontier still live after $BfsHopCap hops — raise the cap " +
            "(the oracle recursion bound must move with it)")
      val seen = layers.map(_.select($"seed", $"node")).reduce(_ unionAll _)
      val next = materialize(
        eSrc.join(frontier.select($"seed", $"node".as("src")), "src")
          .select($"seed", $"dst".as("node")).distinct()
          .join(seen, Seq("seed", "node"), "left_anti")
          .select($"seed", $"node", lit(hop).as("hop")))
      if (next.count() == 0L) { release(next); done = true }
      else { layers += next; frontier = next }
    }
    layers.map(_.select($"seed", $"node", $"hop")).reduce(_ unionAll _)
  }

  def closeness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // converged per-snapshot measurement (deterministic top-degree
    // seeds) — staged session+lake like the sampled-closeness /
    // betweenness / BFS-histogram tables; re-sorted on read because a
    // lake round-trip drops ordering
    val scores = sessionStage.getOrBuild(spark, dir, "closeness_seeded") {
      val eSrc = contactEdges(spark, dir)
      val seeds = contactDeg(spark, dir)
        .orderBy($"deg".desc, $"node").limit(BfsSeeds)
        .select($"node".as("seed"))
      val reached = seededBfs(eSrc, seeds, "closeness").select($"seed", $"hop")
      materialize(reached.where($"hop" > 0)
        .groupBy($"seed", $"hop").agg(count(lit(1)).as("nd"))
        .groupBy($"seed")
        .agg(sum($"nd").as("n_reached"),
          sum($"hop" * $"nd").as("sum_dist"),
          sum($"nd" * expr("CAST(1000000000 AS BIGINT) div hop")).as("harmonic_q9"))
        .select($"seed", $"n_reached", $"sum_dist", $"harmonic_q9",
          round($"n_reached".cast("double") / $"sum_dist".cast("double"), 9)
            .as("closeness_r")))
    }
    scores.orderBy($"seed")
  }

  val closenessSql: String =
    FlowAnalytics.flowsCte.replace(
      "WITH flows AS (", "WITH RECURSIVE flows AS MATERIALIZED (") +
      s""", edges AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT 'u:' || user_id AS src, da AS dst FROM flows
         |    UNION ALL SELECT da AS src, 'u:' || user_id AS dst FROM flows)),
         |deg AS MATERIALIZED (
         |  SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
         |seeds AS MATERIALIZED (
         |  SELECT node AS seed FROM deg ORDER BY deg DESC, node LIMIT $BfsSeeds),
         |reach(seed, node, hop) AS (
         |  SELECT seed, seed, 0 FROM seeds
         |  UNION
         |  SELECT r.seed, e.dst, r.hop + 1 FROM reach r JOIN edges e ON e.src = r.node
         |  WHERE r.hop < $BfsHopCap),
         |mh AS MATERIALIZED (
         |  SELECT seed, node, min(hop) AS hop FROM reach GROUP BY seed, node),
         |hd AS (
         |  SELECT seed, hop, count(*) AS nd FROM mh WHERE hop > 0
         |  GROUP BY seed, hop)
         |SELECT seed, CAST(sum(nd) AS BIGINT) AS n_reached,
         |  CAST(sum(hop * nd) AS BIGINT) AS sum_dist,
         |  CAST(sum(nd * (1000000000 // hop)) AS BIGINT) AS harmonic_q9,
         |  round(CAST(CAST(sum(nd) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(sum(hop * nd) AS BIGINT) AS DOUBLE), 9) AS closeness_r
         |FROM hd GROUP BY seed ORDER BY seed""".stripMargin

  // ------------------------------------- B49b sampled all-pairs closeness

  /** B49b: sampled ALL-NODES closeness (`graph_closeness_sampled`) —
    * the Eppstein–Wang estimator (Eppstein & Wang 2001, "Fast
    * approximation of centrality"): run BFS from k uniformly sampled
    * seeds and estimate EVERY node's average distance as
    * d̂(v) = n/(k(n−1)) · Σᵢ d(sᵢ, v), closeness ĉ(v) = 1/d̂(v).
    * Exact all-pairs closeness is O(V·E) and nobody runs it at
    * 100 TB; k = O(log n / ε²) sampled sweeps estimate every node
    * within ε·Δ with high probability (Hoeffding over the k
    * independent per-seed distances — the bound spec pins the
    * guarantee against an exact recompute). B49 answers "how central
    * are the hubs, exactly"; this answers "rank ALL nodes by
    * centrality, approximately" at k·O(E) total cost.
    *
    * The estimator is defined on a CONNECTED graph, so the subject is
    * the GIANT COMPONENT — the component of the top-degree hub, found
    * by one extra single-seed BFS sweep (the standard practice; the
    * contact graph's minor components are event noise). n is the
    * component size and seeds sample from the component, so every
    * component node is reached by all k seeds by construction.
    *
    * Derandomized sampling: seeds are the first [[CloseSampleSeeds]]
    * component nodes in (md5(node), node) order — the repo's standard
    * hash-order uniform sample, identical in both engines. All
    * aggregates are exact integers; the two estimator divisions are
    * single rounded IEEE ops on exact operands. Output is the
    * top-[[CloseSampleTopN]] most-central nodes (sum_dist asc =
    * closeness desc, node tiebreak).
    */
  val CloseSampleSeeds = 8
  val CloseSampleTopN = 50

  def closenessSampled(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // converged per-snapshot measurement (md5-deterministic seeds) —
    // staged session+lake like the betweenness table; output re-sorts
    // because a lake round-trip drops ordering
    val scores = sessionStage.getOrBuild(spark, dir, "closeness_scores") {
      val eSrc = contactEdges(spark, dir)
      val hub = contactDeg(spark, dir).orderBy($"deg".desc, $"node").limit(1)
        .select($"node".as("seed"))
      // the giant component is corpus-snapshot material like the edges
      val comp = sessionStage.getOrBuild(spark, dir, "search_ue_comp", Seq("node")) {
        materialize(
          seededBfs(eSrc, hub, "closenessSampled-component").select($"node")
            .repartition($"node"))
      }
      val nFrame = comp.agg(count(lit(1)).as("n"))
      val seeds = comp.orderBy(md5($"node"), $"node").limit(CloseSampleSeeds)
        .select($"node".as("seed"))
      val kD = lit(CloseSampleSeeds.toDouble)
      materialize(seededBfs(eSrc, seeds, "closenessSampled")
        .groupBy($"node")
        .agg(count(lit(1)).as("n_seen"), sum($"hop").as("sum_dist"))
        .where($"n_seen" === CloseSampleSeeds)
        .crossJoin(broadcast(nFrame))
        .select($"node", $"sum_dist",
          round(($"n".cast("double") * $"sum_dist".cast("double")) /
            (kD * ($"n" - 1).cast("double")), 9).as("est_avg_dist_r"),
          round((kD * ($"n" - 1).cast("double")) /
            ($"n".cast("double") * $"sum_dist".cast("double")), 9)
            .as("closeness_est_r"))
        .orderBy($"sum_dist", $"node")
        .limit(CloseSampleTopN))
    }
    scores.orderBy($"sum_dist", $"node")
  }

  val closenessSampledSql: String =
    FlowAnalytics.flowsCte.replace(
      "WITH flows AS (", "WITH RECURSIVE flows AS MATERIALIZED (") +
      s""", edges AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT 'u:' || user_id AS src, da AS dst FROM flows
         |    UNION ALL SELECT da AS src, 'u:' || user_id AS dst FROM flows)),
         |deg AS MATERIALIZED (
         |  SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
         |hub AS (SELECT node FROM deg ORDER BY deg DESC, node LIMIT 1),
         |creach(node, hop) AS (
         |  SELECT node, 0 FROM hub
         |  UNION
         |  SELECT e.dst, c.hop + 1 FROM creach c JOIN edges e ON e.src = c.node
         |  WHERE c.hop < $BfsHopCap),
         |comp AS MATERIALIZED (SELECT DISTINCT node FROM creach),
         |nn AS (SELECT count(*) AS n FROM comp),
         |seeds AS MATERIALIZED (
         |  SELECT node AS seed FROM comp
         |  ORDER BY md5(node), node LIMIT $CloseSampleSeeds),
         |reach(seed, node, hop) AS (
         |  SELECT seed, seed, 0 FROM seeds
         |  UNION
         |  SELECT r.seed, e.dst, r.hop + 1 FROM reach r JOIN edges e ON e.src = r.node
         |  WHERE r.hop < $BfsHopCap),
         |mh AS MATERIALIZED (
         |  SELECT seed, node, min(hop) AS hop FROM reach GROUP BY seed, node),
         |ag AS (
         |  SELECT node, CAST(sum(hop) AS BIGINT) AS sum_dist
         |  FROM mh GROUP BY node HAVING count(*) = $CloseSampleSeeds)
         |SELECT node, sum_dist,
         |  round((CAST(n AS DOUBLE) * CAST(sum_dist AS DOUBLE))
         |    / ($CloseSampleSeeds.0 * CAST(n - 1 AS DOUBLE)), 9) AS est_avg_dist_r,
         |  round(($CloseSampleSeeds.0 * CAST(n - 1 AS DOUBLE))
         |    / (CAST(n AS DOUBLE) * CAST(sum_dist AS DOUBLE)), 9) AS closeness_est_r
         |FROM ag CROSS JOIN nn
         |ORDER BY sum_dist, node LIMIT $CloseSampleTopN""".stripMargin

  // --------------------------------- B49c sampled betweenness (Brandes)

  /** B49c: sampled betweenness centrality (`graph_betweenness`) — the
    * missing centrality next to closeness/harmonic/PageRank/HITS:
    * which nodes sit ON the shortest paths (chokepoints, brokers),
    * not merely near everything. Exact betweenness is Brandes 2001 at
    * O(V·E) — nobody runs it at 100 TB; the standard estimator
    * (Brandes & Pich 2007) runs Brandes' two-phase sweep from k
    * sampled sources and scales by n/k, an unbiased estimate with a
    * Hoeffding tail over the k independent per-source dependencies
    * (the bound spec pins this against an exact recompute).
    *
    * Same subject and machinery as B49b: the contact graph's
    * top-hub component (staged artifact shared with
    * `graph_closeness_sampled`), md5-order derandomized seeds.
    * Phase 1 is the σ-BFS — B23's frontier/delta iteration carrying
    * shortest-path COUNTS (σ(v) = Σ σ(pred)); phase 2 walks the BFS
    * DAG top-down accumulating Brandes' dependency
    * δ(v) = Σ_{w∈succ(v)} σ(v)/σ(w) · (1 + δ(w)). Both phases cost
    * O(k·E) total; every join runs against the staged hash(src) edge
    * table with broadcast-sized frontiers.
    *
    * Determinism: σ is an exact integer aggregate; δ is kept in
    * q9 FIXED-POINT longs — each dependency term is one double
    * divide/multiply-add on exact operands, quantized per TERM
    * ([[graft.Tables.qsum]]'s contract), so no float accumulation
    * order exists in either engine and the oracle replays the exact
    * recurrence. The estimate n/k · δΣ/10⁹ is one rounded expression
    * on exact integers.
    */
  val BtwSeeds = 8
  val BtwTopN = 30
  /** Forward-unroll bound: throws beyond (the oracle unrolls exactly
    * this many levels; component depth measured ≤ 4 at sf0.1). */
  val BtwMaxHop = 8

  /** Phase-1 σ-BFS: per-layer frames (seed, node, sigma), index =
    * hop. Like [[seededBfs]] but carrying path counts, and layers
    * stay SEPARATE so phase 2 can walk the DAG level by level.
    */
  private def sigmaBfs(eSrc: DataFrame, seeds: DataFrame,
      maxHop: Int, what: String): ArrayBuffer[DataFrame] = {
    import eSrc.sparkSession.implicits._
    var frontier = materialize(
      seeds.select($"seed", $"seed".as("node"), lit(1L).as("sigma")))
    val layers = ArrayBuffer(frontier)
    var hop = 0
    var done = frontier.count() == 0L
    while (!done) {
      hop += 1
      if (hop > maxHop)
        throw new IllegalStateException(
          s"$what frontier still live after $maxHop hops — raise the cap " +
            "(the oracle unroll must move with it)")
      val seen = layers.map(_.select($"seed", $"node")).reduce(_ unionAll _)
      val next = materialize(
        eSrc.join(frontier.select($"seed", $"node".as("src"), $"sigma"), "src")
          .select($"seed", $"dst".as("node"), $"sigma")
          .join(seen, Seq("seed", "node"), "left_anti")
          .groupBy($"seed", $"node").agg(sum($"sigma").as("sigma")))
      if (next.count() == 0L) { release(next); done = true }
      else {
        // fresh-stats leaf: the σ layer feeds both the next round's
        // expansion AND the growing `seen` union — inherited
        // checkpoint stats would double their exponent per hop
        // ([[org.apache.spark.sql.graftbridge.Bridge.freshStatsLeaf]])
        val clean = org.apache.spark.sql.graftbridge.Bridge.freshStatsLeaf(next)
        layers += clean; frontier = clean
      }
    }
    layers
  }

  /** Brandes two-phase sweep from `seeds` over symmetric `eSrc`;
    * returns (node, bc_q, bc_est_r) for non-source intermediates.
    * Exposed for the planted-graph / exact-recheck spec.
    */
  private[graft] def betweennessOf(eSrc: DataFrame, seeds: DataFrame,
      nFrame: DataFrame, k: Int, maxHop: Int = BtwMaxHop): DataFrame = {
    import eSrc.sparkSession.implicits._
    val layers = sigmaBfs(eSrc, seeds, maxHop, "betweennessSampled")
    val top = layers.length - 1
    val kD = lit(k.toDouble)
    if (top == 0) {
      // seeds with no edges: nothing is intermediate
      return layers(0).select($"node", lit(0L).as("bc_q"),
        lit(0.0).as("bc_est_r")).limit(0)
    }
    // phase 2: δ per layer in q9 longs, deepest first (no successors)
    val deltas = new Array[DataFrame](top + 1)
    deltas(top) = materialize(
      layers(top).select($"seed", $"node", lit(0L).as("dq")))
    for (h <- (top - 1) to 1 by -1) {
      val lw = layers(h + 1)
        .join(deltas(h + 1), Seq("seed", "node"))
        .select($"seed", $"node".as("w"),
          $"sigma".as("sigma_w"), $"dq".as("dq_w"))
      val dep = layers(h)
        .join(eSrc.select($"src".as("node"), $"dst".as("w")), "node")
        .join(lw, Seq("seed", "w"))
        .select($"seed", $"node",
          // σv/σw · (1 + δw), in q9: one divide + one multiply-add on
          // exact operands, quantized per term — order-free sum
          floor($"sigma".cast("double") / $"sigma_w".cast("double")
            * (lit(1.0e9) + $"dq_w".cast("double")) + lit(0.5))
            .cast("long").as("t"))
        .groupBy($"seed", $"node").agg(sum($"t").as("dq"))
      deltas(h) = materialize(
        layers(h).select($"seed", $"node")
          .join(dep, Seq("seed", "node"), "left")
          .select($"seed", $"node", coalesce($"dq", lit(0L)).as("dq")))
    }
    val bc = (1 to top).map(deltas(_)).reduce(_ unionAll _)
      .groupBy($"node").agg(sum($"dq").as("bc_q"))
    bc.crossJoin(broadcast(nFrame))
      .select($"node", $"bc_q",
        round($"n".cast("double") / kD
          * ($"bc_q".cast("double") / lit(1.0e9)), 6).as("bc_est_r"))
      .orderBy($"bc_q".desc, $"node").limit(BtwTopN)
  }

  def betweennessSampled(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the sampled-centrality table is a converged per-corpus-snapshot
    // measurement (seeds are md5-deterministic): staged session+lake
    // like the rank vectors; the output re-sorts because a lake
    // round-trip drops ordering
    val scores = sessionStage.getOrBuild(spark, dir, "btw_scores") {
      val eSrc = contactEdges(spark, dir)
      val hub = contactDeg(spark, dir).orderBy($"deg".desc, $"node").limit(1)
        .select($"node".as("seed"))
      val comp = sessionStage.getOrBuild(spark, dir, "search_ue_comp", Seq("node")) {
        materialize(
          seededBfs(eSrc, hub, "betweenness-component").select($"node")
            .repartition($"node"))
      }
      val nFrame = comp.agg(count(lit(1)).as("n"))
      val seeds = comp.orderBy(md5($"node"), $"node").limit(BtwSeeds)
        .select($"node".as("seed"))
      materialize(betweennessOf(eSrc, seeds, nFrame, BtwSeeds))
    }
    scores.orderBy($"bc_q".desc, $"node")
  }

  val betweennessSampledSql: String = {
    val R = BtwMaxHop
    // forward unroll: σ-BFS levels l1..lR with accumulated seen sets
    def fwd(h: Int): String = {
      val prevSeen = if (h == 1) "l0" else s"seen${h - 1}"
      val prev = s"l${h - 1}"
      s"""l$h AS MATERIALIZED (
         |  SELECT l.seed, e.dst AS node, CAST(sum(l.sigma) AS BIGINT) AS sigma
         |  FROM $prev l JOIN edges e ON e.src = l.node
         |  LEFT JOIN $prevSeen s ON s.seed = l.seed AND s.node = e.dst
         |  WHERE s.node IS NULL GROUP BY 1, 2),
         |seen$h AS MATERIALIZED (
         |  SELECT seed, node FROM $prevSeen UNION ALL SELECT seed, node FROM l$h)""".stripMargin
    }
    // backward unroll: δ levels dR..d1 over the BFS DAG
    def bwd(h: Int): String =
      s"""w$h AS (
         |  SELECT l.seed, l.node AS w, l.sigma AS sigma_w, d.dq AS dq_w
         |  FROM l${h + 1} l JOIN d${h + 1} d ON d.seed = l.seed AND d.node = l.node),
         |dep$h AS (
         |  SELECT l.seed, l.node,
         |    CAST(sum(CAST(floor(CAST(l.sigma AS DOUBLE) / CAST(x.sigma_w AS DOUBLE)
         |      * (CAST(1000000000 AS DOUBLE) + CAST(x.dq_w AS DOUBLE))
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS dq
         |  FROM l$h l JOIN edges e ON e.src = l.node
         |  JOIN w$h x ON x.seed = l.seed AND x.w = e.dst
         |  GROUP BY 1, 2),
         |d$h AS MATERIALIZED (
         |  SELECT l.seed, l.node, coalesce(dep.dq, 0) AS dq
         |  FROM l$h l LEFT JOIN dep$h dep
         |    ON dep.seed = l.seed AND dep.node = l.node)""".stripMargin
    val fwds = (1 to R).map(fwd).mkString(",\n")
    val bwds = ((R - 1) to 1 by -1).map(bwd).mkString(",\n")
    val union = (1 to R).map(h => s"SELECT node, dq FROM d$h")
      .mkString(" UNION ALL ")
    FlowAnalytics.flowsCte.replace(
      "WITH flows AS (", "WITH RECURSIVE flows AS MATERIALIZED (") +
      s""", edges AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT 'u:' || user_id AS src, da AS dst FROM flows
         |    UNION ALL SELECT da AS src, 'u:' || user_id AS dst FROM flows)),
         |deg AS MATERIALIZED (
         |  SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
         |hub AS (SELECT node FROM deg ORDER BY deg DESC, node LIMIT 1),
         |creach(node, hop) AS (
         |  SELECT node, 0 FROM hub
         |  UNION
         |  SELECT e.dst, c.hop + 1 FROM creach c JOIN edges e ON e.src = c.node
         |  WHERE c.hop < $BfsHopCap),
         |comp AS MATERIALIZED (SELECT DISTINCT node FROM creach),
         |nn AS (SELECT count(*) AS n FROM comp),
         |seeds AS MATERIALIZED (
         |  SELECT node AS seed FROM comp
         |  ORDER BY md5(node), node LIMIT $BtwSeeds),
         |l0 AS MATERIALIZED (
         |  SELECT seed, seed AS node, CAST(1 AS BIGINT) AS sigma FROM seeds),
         |$fwds,
         |d$R AS MATERIALIZED (
         |  SELECT seed, node, CAST(0 AS BIGINT) AS dq FROM l$R),
         |$bwds,
         |bc AS (
         |  SELECT node, CAST(sum(dq) AS BIGINT) AS bc_q
         |  FROM ($union) GROUP BY node)
         |SELECT node, bc_q,
         |  round(CAST(n AS DOUBLE) / CAST($BtwSeeds AS DOUBLE)
         |    * (CAST(bc_q AS DOUBLE) / CAST(1000000000 AS DOUBLE)), 6) AS bc_est_r
         |FROM bc CROSS JOIN nn
         |ORDER BY bc_q DESC, node LIMIT $BtwTopN""".stripMargin
  }

  // -------------------------------------------------------------- B24 k-core

  /** B24: k-core decomposition (`graph_kcore`) — the maximal subgraph
    * in which every node keeps at least [[KcoreK]] neighbors, on the
    * same color-sampled part co-order graph as B22's triangles. The
    * k-core is the standard dense-nucleus extractor: basket analysis
    * reads it as the stable co-purchase core, host-graph triage as
    * the mesh that survives when scanners and one-off edges peel away.
    *
    * Execution shape: monotone PEELING — drop every node with degree
    * < k, recompute degrees on the surviving edges, repeat to a fixed
    * point. Each round is one degree aggregation (hash shuffle on
    * node) plus two semi-joins filtering the edge list; the working
    * set only SHRINKS, so unlike PageRank's constant per-round cost
    * the loop gets cheaper as it runs. Convergence is a count
    * compare: the next edge set is a subset of the current one, so
    * equal counts ⇔ identical sets — no set-diff job. Converges or
    * THROWS at [[KcoreMaxRounds]] (a silent cap would report a
    * too-large core); the oracle unrolls exactly [[KcoreMaxRounds]]
    * rounds, and peeling is idempotent at the fixed point, so the
    * replay matches any run that doesn't throw.
    */
  val KcoreK = 4
  val KcoreMaxRounds = 12
  val KcoreTopN = 30

  /** Peel `edges0` ((u, v), u < v, deduped) to its [[KcoreK]]-core;
    * returns each surviving node with its in-core degree. Exposed for
    * the planted-graph spec.
    */
  private[graft] def kcoreOf(edges0: DataFrame, k: Int = KcoreK): DataFrame = {
    import edges0.sparkSession.implicits._
    var edges = materialize(edges0)
    // carried across rounds: next ⊆ edges, so comparing next's count
    // to the PREVIOUS round's (already-paid) count is the same
    // fixed-point test without re-counting the current edge set —
    // one fewer job per peel round
    var edgeCount = edges.count()
    var converged = false
    var iter = 0
    while (!converged) {
      iter += 1
      if (iter > KcoreMaxRounds) {
        release(edges)
        throw new IllegalStateException(
          s"kcore did not reach a fixed point within $KcoreMaxRounds peel rounds — " +
            "raise KcoreMaxRounds (the oracle unroll must move with it)")
      }
      val deg = edges.select($"u".as("node")).unionAll(edges.select($"v".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
      val keep = deg.where($"deg" >= k).select($"node")
      val next = materialize(
        edges
          .join(keep.select($"node".as("u")), Seq("u"), "left_semi")
          .join(keep.select($"node".as("v")), Seq("v"), "left_semi")
          .select($"u", $"v"))
      val nextCount = next.count()
      converged = nextCount == edgeCount
      edgeCount = nextCount
      release(edges)
      edges = next
    }
    edges.select($"u".as("node")).unionAll(edges.select($"v".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
  }

  def kcore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    kcoreOf(GraphOps.coOrderEdgesStaged(spark, dir))
      .orderBy($"deg".desc, $"node").limit(KcoreTopN)
  }

  val kcoreSql: String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "e0" else s"e${i - 1}"
      s"""d$i AS MATERIALIZED (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT u AS node FROM $prev UNION ALL SELECT v FROM $prev)
         |  GROUP BY node),
         |k$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $KcoreK),
         |e$i AS MATERIALIZED (
         |  SELECT u, v FROM $prev
         |  WHERE u IN (SELECT node FROM k$i) AND v IN (SELECT node FROM k$i))""".stripMargin
    }
    val rounds = (1 to KcoreMaxRounds).map(round).mkString(",\n")
    s"""WITH op AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
       |  WHERE ('0x' || substr(md5('tri:' || l_partkey), 1, 7))::BIGINT
       |    % ${GraphOps.TriSampleMod} = 0),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT a.p AS u, b.p AS v
       |  FROM op a JOIN op b ON a.ok = b.ok AND a.p < b.p),
       |$rounds
       |SELECT node, count(*) AS deg FROM (
       |  SELECT u AS node FROM e$KcoreMaxRounds
       |  UNION ALL SELECT v FROM e$KcoreMaxRounds)
       |GROUP BY node ORDER BY deg DESC, node LIMIT $KcoreTopN""".stripMargin
  }

  // ------------------------------------------------------ B25 link Jaccard

  /** B25: neighborhood-Jaccard link prediction
    * (`graph_link_jaccard`) — for part pairs NOT yet co-ordered,
    * score |Γ(u) ∩ Γ(v)| / |Γ(u) ∪ Γ(v)| and return the top
    * candidates: the classic "you may also like" / missing-link
    * ranking, run on the same color-sampled co-order graph as B22.
    *
    * Exact all-pairs common-neighbor counting is inherently a wedge
    * aggregation — every common neighbor s of (y, z) is one wedge
    * y–s–z, so the cost is Σ deg(s)², and NO orientation trick
    * applies (unlike triangles, the pair (y, z) must see common
    * neighbors on EVERY side of the degree order). The scale lever is
    * therefore the same node-color sample the triangle estimator
    * uses: thinning NODES bounds Σ deg² at any data scale, and the
    * candidate ranking stays exact on the induced subgraph. The
    * wedge aggregation itself is one hash shuffle on (y, z) with
    * map-side combine; existing edges leave by an anti-join before
    * any degree arithmetic, and [[LjMinCommon]] prunes the long tail
    * of one-wedge pairs inside the same aggregate.
    */
  val LjMinCommon = 3
  val LjTopN = 30

  def linkJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = GraphOps.coOrderEdgesStaged(spark, dir)
    // hash(u)-staged symmetric adjacency: the wedge self-join's two
    // sides and the degree rollup all read the same pre-partitioned
    // leaf, so none of the three re-shuffles the adjacency
    val adj = GraphOps.coOrderAdjStaged(spark, dir)
    val deg = adj.groupBy($"u".as("node")).agg(count(lit(1)).as("deg"))
    val common = adj.select($"u".as("s"), $"v".as("y"))
      .join(adj.select($"u".as("s"), $"v".as("z")), "s")
      .where($"y" < $"z")
      .groupBy($"y", $"z").agg(count(lit(1)).as("common"))
      .where($"common" >= LjMinCommon)
    common
      .join(edges.select($"u".as("y"), $"v".as("z")), Seq("y", "z"), "left_anti")
      .join(deg.select($"node".as("y"), $"deg".as("dy")), "y")
      .join(deg.select($"node".as("z"), $"deg".as("dz")), "z")
      .select($"y".as("u"), $"z".as("v"), $"common",
        round($"common".cast("double") / ($"dy" + $"dz" - $"common"), 9)
          .as("jaccard"))
      .orderBy($"jaccard".desc, $"u", $"v").limit(LjTopN)
  }

  val linkJaccardSql: String =
    s"""WITH op AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
       |  WHERE ('0x' || substr(md5('tri:' || l_partkey), 1, 7))::BIGINT
       |    % ${GraphOps.TriSampleMod} = 0),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT a.p AS u, b.p AS v
       |  FROM op a JOIN op b ON a.ok = b.ok AND a.p < b.p),
       |adj AS MATERIALIZED (
       |  SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
       |deg AS MATERIALIZED (
       |  SELECT u AS node, count(*) AS deg FROM adj GROUP BY u),
       |common AS MATERIALIZED (
       |  SELECT a.v AS y, b.v AS z, count(*) AS common
       |  FROM adj a JOIN adj b ON a.u = b.u AND a.v < b.v
       |  GROUP BY a.v, b.v HAVING count(*) >= $LjMinCommon),
       |cand AS MATERIALIZED (
       |  SELECT c.y, c.z, c.common FROM common c
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM edges e WHERE e.u = c.y AND e.v = c.z))
       |SELECT c.y AS u, c.z AS v, c.common,
       |  round(CAST(c.common AS DOUBLE) / (dy.deg + dz.deg - c.common), 9)
       |    AS jaccard
       |FROM cand c
       |JOIN deg dy ON dy.node = c.y
       |JOIN deg dz ON dz.node = c.z
       |ORDER BY jaccard DESC, u, v LIMIT $LjTopN""".stripMargin

  // -------------------------------------------------------------- B26g SSSP

  /** Seeds / round backstop for [[sssp]]. The cap counts the
    * confirming (no-improvement) round too, and the oracle unrolls
    * exactly [[SsspRoundCap]] min-plus rounds, so Spark and the
    * replay agree by construction on any graph Spark doesn't throw
    * on (extra oracle rounds past the fixpoint are no-ops).
    */
  val SsspSeeds = 3
  val SsspRoundCap = 16

  /** B26g: weighted multi-source shortest paths (`graph_sssp`) —
    * min-plus distance from the [[SsspSeeds]] highest-degree service
    * hubs over the same user↔service contact graph as B23, with a
    * deterministic md5-derived edge weight in 1..4 (both engines
    * derive it from the same hex prefix, so the weighting needs no
    * side table). The triage read: weighted blast radius — hop count
    * alone treats a rare contact like a daily one; the weight stands
    * in for the link cost a real deployment would carry on the edge.
    *
    * Execution shape: DELTA-relaxation Bellman-Ford, the weighted
    * generalization of B23's frontier iteration — each round joins
    * ONLY the nodes whose distance improved last round against the
    * staged hash(src) edge table, takes the min-plus candidate per
    * dst (partial-aggregated map-side), and left-joins the running
    * distance table to keep strict improvements. Work per round is
    * O(edges out of the improved set); rounds ≤ weighted diameter,
    * not V−1, because only genuine improvements re-enter the
    * frontier. AQE broadcasts the (small) frontier into the edge
    * join, so the edge table never re-shuffles; per-layer leaves are
    * materialized and superseded state is released, same lifecycle
    * as BFS/k-core.
    */
  def sssp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the min-plus distance histogram is a converged per-snapshot
    // measurement (deterministic top-degree seeds) — staged
    // session+lake like the BFS hop histogram; re-sorted on read
    val hist = sessionStage.getOrBuild(spark, dir, "sssp_hist") {
      materialize(ssspOf(spark, dir))
    }
    hist.orderBy($"dist")
  }

  private def ssspOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.StrFuncs.md5_prefix
    // weights derive map-only from the staged contact edges (the
    // partitioning survives withColumn), staged as their own artifact
    val wEdges = sessionStage.getOrBuild(spark, dir, "search_ue_wedges", Seq("src")) {
      materialize(contactEdges(spark, dir)
        .withColumn("w",
          md5_prefix(concat($"src", lit(">"), $"dst"), 7) % 4 + 1))
    }
    val seeds = contactDeg(spark, dir)
      .orderBy($"deg".desc, $"node").limit(SsspSeeds)
    var dist = materialize(seeds.select($"node", lit(0L).as("dist")))
    var frontier = dist
    var round = 0
    var done = false
    while (!done) {
      round += 1
      if (round > SsspRoundCap)
        throw new IllegalStateException(
          s"sssp still improving after $SsspRoundCap rounds — raise the cap " +
            "(the oracle's unrolled round count must move with it)")
      val cand = wEdges
        .join(frontier.select($"node".as("src"), $"dist".as("fd")), "src")
        .groupBy($"dst".as("node")).agg(min($"fd" + $"w").as("nd"))
      val improved = materialize(
        cand.join(dist.select($"node", $"dist".as("od")), Seq("node"), "left")
          .where($"od".isNull || $"nd" < $"od")
          .select($"node", $"nd".as("dist")))
      if (improved.count() == 0L) { release(improved); done = true }
      else {
        val next = materialize(
          dist.join(improved.select($"node"), Seq("node"), "left_anti")
            .unionByName(improved))
        if (frontier ne dist) release(frontier)
        release(dist)
        dist = next
        frontier = improved
      }
    }
    contactDeg(spark, dir).join(dist, Seq("node"), "left")
      .select(coalesce($"dist", lit(-1L)).as("dist"))
      .groupBy($"dist").agg(count(lit(1)).as("n_nodes"))
      .orderBy($"dist")
  }

  /** B26g oracle: [[SsspRoundCap]] UNROLLED min-plus rounds (the
    * k-core pattern — each CTE is node-sized, so the replay is K
    * cheap joins, not a recursive path enumeration whose row count
    * would grow with the number of distinct (dist, hop) pairs).
    */
  val ssspSql: String = {
    val base = FlowAnalytics.flowsCte +
      s""", ue AS MATERIALIZED (
         |  SELECT DISTINCT 'u:' || user_id AS src, da AS dst FROM flows),
         |edges AS MATERIALIZED (
         |  SELECT src, dst,
         |    1 + (('0x' || substr(md5(src || '>' || dst), 1, 7))::BIGINT % 4) AS w
         |  FROM (SELECT src, dst FROM ue UNION SELECT dst, src FROM ue)),
         |deg AS MATERIALIZED (
         |  SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
         |seeds AS MATERIALIZED (
         |  SELECT node FROM deg ORDER BY deg DESC, node LIMIT $SsspSeeds),
         |d0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS dist FROM seeds)""".stripMargin
    val rounds = (1 to SsspRoundCap).map { i =>
      s""",
         |d$i AS MATERIALIZED (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.dst, d.dist + e.w FROM d${i - 1} d
         |    JOIN edges e ON e.src = d.node)
         |  GROUP BY node)""".stripMargin
    }.mkString
    base + rounds +
      s"""
         |SELECT coalesce(d.dist, -1) AS dist, count(*) AS n_nodes
         |FROM deg g LEFT JOIN d$SsspRoundCap d ON d.node = g.node
         |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_closeness" -> closeness _,
    "graph_closeness_sampled" -> closenessSampled _,
    "graph_betweenness" -> betweennessSampled _,
    "graph_bfs_hops" -> bfsHops _,
    "graph_kcore" -> kcore _,
    "graph_sssp" -> sssp _,
    "graph_link_jaccard" -> linkJaccard _)

  val oracleSql: Map[String, String] = Map(
    "graph_closeness" -> closenessSql,
    "graph_closeness_sampled" -> closenessSampledSql,
    "graph_betweenness" -> betweennessSampledSql,
    "graph_bfs_hops" -> bfsHopsSql,
    "graph_kcore" -> kcoreSql,
    "graph_sssp" -> ssspSql,
    "graph_link_jaccard" -> linkJaccardSql)
}
