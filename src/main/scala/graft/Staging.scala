package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Staged-artifact parquet layout version: bump when any staged
    * table's SCHEMA changes, so a new library version can never be
    * poisoned by artifacts a previous version published.
    */
  /** Conditional narrow-scan spread for CPU-bound map chains (PQ
    * encode/ADC folds, PNG codec, per-token hashing, char-gram
    * kernels): a one-file scan — the shape every small-SF bench run
    * sees — arrives as ONE partition and serializes the whole chain
    * onto a single task (measured 3.8 s task = 3.8 s wall on 32
    * cores). CONDITIONAL on purpose: when the scan already carries at
    * least half the session's parallelism (any real cluster read),
    * this is a no-op — the family's "the corpus never shuffles for
    * encoding" contracts hold at scale, and the balancing shuffle
    * only ever moves a sub-core-count row set.
    */
  def spreadNarrow(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (estimatedScanPartitions(df) >= p / 2) df else df.repartition(p)
  }

  /** Scan-width estimate for [[spreadNarrow]]'s conditional, WITHOUT
    * `df.rdd` — which would eagerly run full physical planning (and
    * read only the pre-AQE count) at DataFrame-construction time for
    * every call site. The spread inputs are narrow chains over one
    * leaf, so the leaf IS the parallelism: a staged [[org.apache.spark.sql.execution.LogicalRDD]]
    * carries its exact partition count for free, and a file scan's
    * split count is `ceil((bytes + files·openCost) / maxPartitionBytes)`
    * — Spark packs small files to ~maxPartitionBytes per split, so the
    * size-based figure tracks the planner's within the factor-of-2
    * slack the `≥ p/2` test already tolerates. Anything unrecognized
    * (a join, an in-memory relation) is treated as already-wide: the
    * contract at scale is "never an unnecessary shuffle", so the
    * estimate must only ever skip a spread, not invent one.
    */
  private def estimatedScanPartitions(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val conf = df.sparkSession.sessionState.conf
    val maxB = math.max(1L, conf.filesMaxPartitionBytes)
    val openCost = conf.filesOpenCostInBytes
    val leaves = df.queryExecution.analyzed.collectLeaves()
    leaves match {
      case Seq(lr: LogicalRDD) => lr.rdd.getNumPartitions.toLong
      case Seq(rel: LogicalRelation) => rel.relation match {
        case fs: HadoopFsRelation =>
          val files = fs.location.inputFiles.length.toLong
          val bytes = fs.location.sizeInBytes
          val total = bytes + files * openCost
          // mirror Spark's FilePartition.maxSplitBytes: small scans
          // split at bytesPerCore (floored at openCost), not at
          // maxPartitionBytes — without this term the estimate
          // UNDERCOUNTS small scans and spreads an already-wide read
          val parallelism = math.max(1L,
            df.sparkSession.sparkContext.defaultParallelism.toLong)
          val split = math.max(1L, math.min(maxB,
            math.max(openCost, total / parallelism)))
          (total + split - 1) / split
        case _ => Long.MaxValue
      }
      case _ => Long.MaxValue
    }
  }

  private val LakeFormatVersion = 1

  /** Session conf key for the cross-session artifact lake root. When
    * set, [[SessionCache.getOrBuild]] keys every staged artifact by a
    * CONTENT fingerprint of its corpus dir and persists it as parquet
    * under the root — so a new session (or a separate 1000-executor
    * job) reads the published index/model/edge table instead of
    * rebuilding it, and a regenerated corpus automatically misses the
    * stale artifact instead of being served it.
    */
  val LakeConfKey = "spark.graft.stagingLake"

  /** The one SPARK_GRAFT_LAKE env → [[LakeConfKey]] mapping, shared by
    * Bench/Verify/DevTimer: `"off"` disables the lake (empty conf
    * value, which [[SessionCache]] treats as unset), any other value
    * is the lake root verbatim, and unset falls back to `default`.
    * Factored here so no entry point can misread `off` as a literal
    * `./off` lake directory.
    */
  def lakeRootFromEnv(default: String): String =
    sys.env.get("SPARK_GRAFT_LAKE") match {
      case Some("off") => ""
      case Some(p)     => p
      case None        => default
    }

  /** Session conf key: when `"true"`, [[SessionCache.getOrBuild]]
    * FAILS LOUDLY instead of staging a session-lifetime artifact via
    * `localCheckpoint` with no reliable checkpoint dir configured. On
    * that path an entry's lineage is truncated and its blocks live
    * only in executor memory — a later executor loss makes the entry
    * unrecoverable for the rest of the session (the lake layer does
    * not help mid-session: the served entry's blocks are just as
    * memory-resident; recovery requires an explicit
    * [[SessionCache.invalidate]] + rebuild). Production sessions that
    * require durable session-lifetime artifacts set this together
    * with a checkpoint dir (`graft.Graft.session(ckptDir, ...)`);
    * dev/bench sessions leave it unset and accept the
    * rebuild-on-loss posture.
    */
  val RequireDurableConfKey = "spark.graft.staging.requireDurable"

  /** Content fingerprint of a corpus snapshot: 16 hex chars over the
    * sorted (relative path, length, mtime) of every data file under
    * `dir`. Metadata-only — one driver-side recursive listing, no data
    * scan — which is exactly the granularity ingest pipelines change:
    * a rewritten/compacted/appended corpus gets new files or new
    * mtimes, so the fingerprint moves and stale artifacts miss.
    */
  def corpusFingerprint(spark: SparkSession, dir: String): String = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.toString.stripPrefix(root.toString)
      // _SUCCESS / .crc markers churn without content meaning
      if (!name.endsWith("_SUCCESS") && !name.endsWith(".crc"))
        entries += s"$name|${f.getLen}|${f.getModificationTime}"
    }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    md.digest().take(8).map(b => f"$b%02x").mkString
  }

  private def lakeRootOf(spark: SparkSession): Option[String] =
    spark.conf.getOption(LakeConfKey).filter(_.nonEmpty)

  private def artifactPath(lakeRoot: String, key: String, fp: String): Path =
    new Path(lakeRoot,
      s"v$LakeFormatVersion/${key.replaceAll("[^A-Za-z0-9._-]", "_")}/fp=$fp")

  /** Checkpoint-dir-aware lineage cut (same policy as every staging
    * call site: reliable checkpoint on the cluster path, else
    * executor-memory localCheckpoint).
    */
  private[graft] def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Publish a built artifact: write to a temp sibling, then one
    * atomic rename into place — a concurrent publisher loses the
    * rename and deletes its temp; readers only ever see complete
    * directories. Best-effort by contract: a full lake must degrade
    * to session-local staging, never fail the query.
    */
  private def publish(df: DataFrame, dest: Path): Unit = {
    val fs = dest.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val tmp = new Path(dest.getParent,
      s".tmp-${dest.getName}-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      df.write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(tmp, dest)) fs.delete(tmp, true) // lost the race
    } catch {
      case e: Exception =>
        try fs.delete(tmp, true) catch { case _: Exception => () }
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"staging-lake publish failed for $dest: ${e.getMessage}")
    }
  }

  /** Size gate for the driver-local serve fast path: a published
    * artifact whose data files total at most this many bytes (and
    * that no consumer needs hash-partitioned) is collected once and
    * served as a LocalRelation instead of a checkpointed distributed
    * leaf. Trained models (centroid/codebook tables, KBs at any
    * corpus size) are exactly the artifacts a production job ships
    * broadcast anyway; serving them locally removes the checkpoint
    * job AND every downstream BroadcastExchange build job (a
    * LocalTableScan broadcasts without launching a job). Measured on
    * the r14 entry board: first-consumer serves cost multi-second
    * bench entries (ann_topk_ivf_mp 3.6 s warm vs 0.6 s steady) that
    * were mostly these fixed jobs. Corpus-sized artifacts (signature
    * tables, edge lists) exceed the gate and keep the distributed
    * path — the gate reads the actual published bytes, so the
    * decision scales with the data, not with a tuned constant.
    */
  val LocalServeMaxBytes: Long = 8L << 20

  /** Serve a published artifact, restored to the shape the build
    * would have produced: re-keyed on `partitionCols` (a parquet scan
    * loses the build's hash partitioning, and the iterative consumers
    * — PageRank/HITS/LPA rounds — are exchange-free only against a
    * hash-partitioned leaf; one shuffle here buys zero per round) and
    * lineage-cut so every consumer reads the materialized leaf
    * instead of re-scanning the lake. AQE is held off the staging
    * action so the leaf advertises its hashpartitioning (see
    * [[preservePartitioning]]). Small partition-free artifacts take
    * the [[LocalServeMaxBytes]] fast path instead.
    */
  private def serve(spark: SparkSession, path: Path,
      partitionCols: Seq[String]): Option[DataFrame] = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      if (!fs.exists(new Path(path, "_SUCCESS"))) None
      else {
        val raw = spark.read.parquet(path.toString)
        val dataBytes = fs.listStatus(path)
          .filter(f => f.isFile && f.getPath.getName != "_SUCCESS" &&
            !f.getPath.getName.endsWith(".crc"))
          .map(_.getLen).sum
        if (partitionCols.isEmpty && dataBytes <= LocalServeMaxBytes)
          Some(spark.createDataFrame(raw.collectAsList(), raw.schema))
        else {
          val keyed =
            if (partitionCols.isEmpty) raw
            else raw.repartition(partitionCols.map(raw.col): _*)
          Some(preservePartitioning(spark)(materialize(keyed)))
        }
      }
    } catch {
      case e: Exception =>
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"staging-lake read failed for $path (rebuilding): ${e.getMessage}")
        None
    }
  }

  /** Delete artifacts not modified in the last `olderThanMs` under
    * the lake root. Age-based (not current-fingerprint-based) on
    * purpose: one lake serves MANY corpus dirs, and any fingerprint
    * other than "this dir's current one" may be another live corpus's.
    */
  def pruneLake(spark: SparkSession, olderThanMs: Long): Int =
    lakeRootOf(spark).map { root =>
      val rootPath = new Path(root, s"v$LakeFormatVersion")
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(rootPath)) 0
      else {
        val cutoff = System.currentTimeMillis() - olderThanMs
        var n = 0
        fs.listStatus(rootPath).foreach { keyDir =>
          fs.listStatus(keyDir.getPath).foreach { fpDir =>
            if (fpDir.getModificationTime < cutoff) {
              fs.delete(fpDir.getPath, true); n += 1
            }
          }
        }
        n
      }
    }.getOrElse(0)

  /** Snapshot retention, the companion policy to [[pruneLake]]'s TTL:
    * keep only the newest `keep` fingerprint snapshots of every
    * artifact key (by publish mtime) and delete the rest; returns the
    * number of snapshot dirs deleted. At a daily ingest cadence every
    * corpus rewrite publishes a fresh fingerprint per artifact, so an
    * unretained lake grows by one full artifact set per snapshot
    * forever. In-flight publishes (`.tmp-*` dirs) are not snapshots
    * and are never touched — their publisher renames or deletes them;
    * a crashed publisher's leftover is reaped by [[pruneLake]]'s TTL.
    *
    * Safe against in-flight serves BY CONSTRUCTION: [[serve]]
    * materializes the artifact into session-held blocks at read time,
    * so deleting its backing files affects only future cache misses —
    * which rebuild from source and republish (spec-pinned).
    */
  def retainNewestFingerprints(spark: SparkSession, keep: Int): Int = {
    require(keep >= 1, s"retention must keep at least 1 snapshot, got $keep")
    lakeRootOf(spark).map { root =>
      val rootPath = new Path(root, s"v$LakeFormatVersion")
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(rootPath)) 0
      else {
        var n = 0
        fs.listStatus(rootPath).filter(_.isDirectory).foreach { keyDir =>
          fs.listStatus(keyDir.getPath)
            .filter(d => d.isDirectory && !d.getPath.getName.startsWith(".tmp-"))
            .sortBy(d => (-d.getModificationTime, d.getPath.getName))
            .drop(keep)
            .foreach { fpDir => fs.delete(fpDir.getPath, true); n += 1 }
        }
        n
      }
    }.getOrElse(0)
  }

  /** Accounting face of the lake: one row per published artifact
    * snapshot — key, corpus fingerprint, data-file count, bytes,
    * publish mtime, and whether the snapshot is complete (`_SUCCESS`
    * present; an incomplete one is a lost-race leftover the TTL will
    * reap). Driver-side metadata listing only, the same cost class as
    * [[corpusFingerprint]] — no data scan. This is what a retention
    * policy is tuned against: `groupBy(artifact_key)` gives per-key
    * snapshot counts and byte growth per corpus snapshot.
    */
  def lakeReport(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = lakeRootOf(spark).toSeq.flatMap { root =>
      val rootPath = new Path(root, s"v$LakeFormatVersion")
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(rootPath)) Seq.empty
      else fs.listStatus(rootPath).filter(_.isDirectory).toSeq.flatMap { keyDir =>
        fs.listStatus(keyDir.getPath)
          .filter(d => d.isDirectory && !d.getPath.getName.startsWith(".tmp-"))
          .toSeq.map { fpDir =>
            val files = fs.listStatus(fpDir.getPath).filter(_.isFile)
            val dataFiles = files.filter(f =>
              f.getPath.getName != "_SUCCESS" && !f.getPath.getName.endsWith(".crc"))
            (keyDir.getPath.getName,
              fpDir.getPath.getName.stripPrefix("fp="),
              dataFiles.length.toLong,
              dataFiles.map(_.getLen).sum,
              fpDir.getModificationTime,
              files.exists(_.getPath.getName == "_SUCCESS"))
          }
      }
    }
    rows.toDF("artifact_key", "fingerprint", "n_files", "bytes",
        "modified_ms", "complete")
      .orderBy($"artifact_key", $"fingerprint")
  }

  private[graft] def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.optimizedPlan.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Free a materialized intermediate — cached blocks AND, for
    * reliable checkpoints, the files on durable storage (Spark's
    * cleaner only removes those with
    * `spark.cleaner.referenceTracking.cleanCheckpoints`, off by
    * default — leaving them would leak a full table copy per run on
    * the cluster path).
    */
  private[graft] def release(dfs: DataFrame*): Unit =
    dfs.foreach { df =>
      backingRdd(df).foreach { rdd =>
        // blocking: concurrent block removal contends with the next
        // query's materialization writes (measured as multi-second
        // stalls migrating between the dedup pipelines)
        rdd.unpersist(blocking = true)
        rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
        }
      }
    }

  /** Session-shared staging for intermediates that are PERSISTED
    * TABLES in production — signature/band indexes, trained
    * centroids/codebooks, cluster-label tables: written once per
    * corpus snapshot and read by every downstream consumer, never
    * re-derived per query or per ingest batch. Entries are built at
    * most once per (session, input dir, key) and held as materialized
    * leaves for the session's lifetime (all are orders of magnitude
    * under the corpus itself).
    *
    * Lifecycle: the in-memory cache key is the PATH, not a content
    * snapshot — callers that rewrite a corpus dir mid-session must
    * [[invalidate]] or be served the stale artifact (with the lake
    * layer enabled, a NEW session is immune: artifacts are keyed by
    * [[Staging.corpusFingerprint]]). A session-end listener evicts a
    * stopping session's entries so the map never pins stopped
    * `SparkSession`s or their checkpoint files for the JVM's lifetime.
    *
    * Cross-session layer: with [[Staging.LakeConfKey]] set, a cache
    * miss first tries the published artifact for this corpus
    * fingerprint (zero build jobs — the 100 TB shape, where the
    * signature index / trained codebooks / graph edge tables are
    * BUILT once per corpus snapshot and READ by every later job), and
    * a build publishes its result for the next session. Iterative
    * consumers pass `partitionCols` so a lake-served leaf is re-keyed
    * once per session instead of per round.
    *
    * Durability: on the localCheckpoint path (no checkpoint dir set) a
    * staged entry's lineage is truncated and its blocks live only in
    * executor memory — a later executor loss makes that entry
    * unrecoverable for the rest of the session (recovery = [[invalidate]]
    * + rebuild/re-serve). Production sessions holding session-lifetime
    * artifacts should set a reliable checkpoint dir
    * (`graft.Graft.session(ckptDir, ...)`), which every materialize in
    * this codebase switches to automatically — and can ENFORCE that
    * posture with [[Staging.RequireDurableConfKey]], which makes
    * [[getOrBuild]] fail loudly rather than stage memory-only entries.
    */
  private[graft] final class SessionCache {
    private val entries =
      new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
    private val cleanupInstalled =
      java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

    /** Build-at-most-once. NOT `computeIfAbsent`: a build thunk may
      * itself stage a dependency (band_index → doc_sigs), and the JDK
      * forbids map mutation from inside a mapping function
      * (hash-bin-dependent "Recursive update" IllegalStateException);
      * a materializing build is also a full Spark job, far too long to
      * run under a bin lock. Double-checked get → build outside any
      * lock → `putIfAbsent`: a concurrent first caller may rarely
      * build twice, and the loser's copy is released — a bounded
      * duplicate job instead of an unbounded lock hold or a flaky
      * crash.
      */
    def getOrBuild(spark: SparkSession, dir: String, key: String,
        partitionCols: Seq[String] = Nil)(
        build: => DataFrame): DataFrame = {
      val k = (spark, dir, key)
      val cached = entries.get(k)
      if (cached != null) cached
      else {
        // durability gate (see [[Staging.RequireDurableConfKey]]): a
        // session that declares it needs durable staged artifacts must
        // not silently get memory-only localCheckpoint entries
        if (spark.conf.get(RequireDurableConfKey, "false").toBoolean &&
            spark.sparkContext.getCheckpointDir.isEmpty)
          throw new IllegalStateException(
            s"$RequireDurableConfKey=true but no reliable checkpoint dir is " +
            s"set: staged artifact '$key' would live only in executor memory " +
            "(localCheckpoint) and an executor loss would make it " +
            "unrecoverable for the session. Set a checkpoint dir " +
            "(graft.Graft.session(ckptDir, ...)) or unset the conf.")
        installCleanup(spark)
        // Cross-session layer (when spark.graft.stagingLake is set):
        // serve the published artifact for this corpus SNAPSHOT —
        // fingerprint-keyed, so a regenerated corpus misses instead
        // of being served stale — and publish on a build so the NEXT
        // session (or cluster job) reads instead of rebuilding.
        val lake = lakeRootOf(spark).map(root =>
          artifactPath(root, key, corpusFingerprint(spark, dir)))
        val entry = lake.flatMap(serve(spark, _, partitionCols)).getOrElse {
          val built = build
          lake.foreach(publish(built, _))
          built
        }
        val prev = entries.putIfAbsent(k, entry)
        if (prev != null) { release(entry); prev } else entry
      }
    }

    /** Drop every entry for `(spark, dir)` and free its blocks /
      * checkpoint files.
      */
    def invalidate(spark: SparkSession, dir: String): Unit = {
      val it = entries.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 == spark && e.getKey._2 == dir) {
          it.remove()
          release(e.getValue)
        }
      }
    }

    /** Block release at session end is best-effort — executors are
      * going away with the app; reliable-checkpoint FILES are what
      * must not leak, and deleting those is a driver-side FS call.
      */
    private def installCleanup(spark: SparkSession): Unit =
      if (cleanupInstalled.add(spark)) {
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
              cleanupInstalled.remove(spark)
              val it = entries.entrySet().iterator()
              while (it.hasNext) {
                val e = it.next()
                if (e.getKey._1 == spark) {
                  it.remove()
                  try release(e.getValue)
                  catch { case _: Exception => () } // context already down
                }
              }
            }
          })
      }
  }
}
