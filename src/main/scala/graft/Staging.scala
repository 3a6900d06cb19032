package graft

/** Shared round-staging cadence for the iterative operators
  * (PageRank/PPR rounds, Lloyd's k-means rounds, PCA power steps).
  *
  * The policy, measured in round 7 and encoded once here so five
  * hand-expanded copies can't drift: iterative state is checkpointed
  * every SECOND round — an intermediate round is consumed exactly once
  * by the next round, so a two-round lazy segment recomputes nothing
  * while the staging still cuts lineage before the plan can compound
  * (the FULL lazy recurrence blows up analysis/AQE bookkeeping and,
  * where a step is multi-referenced, doubles work per round).
  */
object Staging {

  /** True at rounds where the state must be materialized.
    *
    * `stageFinal` says whether the final round's table is
    * MULTI-consumed downstream (trained centroids/codebooks feed
    * every encoder; a PCA eigenvector feeds rayleigh + deflation +
    * output) and so must be staged — or flows single-consumed into
    * the output query (PageRank's last ranks) and stays lazy.
    */
  def stagePoint(round: Int, iters: Int, stageFinal: Boolean): Boolean =
    if (round == iters) stageFinal else round % 2 == 0

  /** Run `f` (a checkpoint/localCheckpoint action) with AQE disabled
    * on this session, restoring the previous setting after.
    *
    * Why: `Dataset.checkpoint` records the executed plan's
    * outputPartitioning on the staged [[org.apache.spark.sql.execution.LogicalRDD]]
    * leaf — but under AQE the adaptive root advertises
    * `UnknownPartitioning`, so every staged frame re-enters downstream
    * plans partition-less and each iterative round pays an Exchange on
    * state that is ALREADY hash-partitioned on the join key (measured:
    * one avoidable node-table Exchange per PageRank/HITS round). With
    * AQE off for just the staging action the leaf advertises
    * `hashpartitioning(k, n)`, which consumer plans (AQE on or off)
    * satisfy exchange-free. Trade-off: the staging job itself loses
    * AQE coalescing/skew handling — acceptable for round-state tables,
    * whose deterministic partition count is exactly what exchange-free
    * reuse across rounds requires.
    *
    * Session-conf mutation is not concurrency-safe across queries
    * sharing the session; graft's query entry points run sequentially
    * (Bench/Verify/driver contract).
    */
  def preservePartitioning[T](spark: org.apache.spark.sql.SparkSession)(f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }
}
