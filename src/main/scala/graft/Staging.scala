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
}
