package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession.Builder pre-configured the way
  * every graft deployment needs — the SQL extensions (native
  * functions + the CIDR literal-folding optimizer rule) and a UTC
  * session timezone (flow timestamps are wall-clock; a host-local
  * zone silently shifts every window/date bucket).
  *
  * Everything else (master, shuffle partitions, memory) is the
  * caller's: `Graft.builder().master("local[8]").getOrCreate()`.
  */
object Graft {

  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")

  /** [[builder]] plus a RELIABLE checkpoint directory: the iterative
    * operators (cluster closure, ngram postings) truncate lineage via
    * `df.checkpoint()` onto durable storage when the context has a
    * checkpoint dir — the 100 TB path, survives executor loss — and
    * fall back to executor-memory `localCheckpoint()` otherwise.
    * Without this entry point the durable path was only reachable by
    * calling `sparkContext.setCheckpointDir` by hand after session
    * creation.
    *
    * `getOrCreate` is called here because the checkpoint dir lives on
    * the SparkContext, not in the builder's config map.
    */
  def session(checkpointDir: String,
      configure: SparkSession.Builder => SparkSession.Builder = identity): SparkSession = {
    val spark = configure(builder()).getOrCreate()
    spark.sparkContext.setCheckpointDir(checkpointDir)
    // getOrCreate may have returned a PRE-EXISTING session whose
    // creation never saw the builder's configs: extensions only bind
    // at session creation, so late-register the functions (idempotent)
    // and set the timezone through the runtime conf (settable any
    // time) — otherwise a shared-session caller gets 'undefined
    // function' or, worse, host-local-zone window buckets that no
    // longer match the oracle.
    register(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  /** Register the SQL functions on an EXISTING session (extensions
    * only bind at session creation) — for notebook/shared-session
    * environments where the builder path isn't available.
    */
  def register(spark: SparkSession): Unit =
    graft.functions.GraftFunctions.register(spark)
}
