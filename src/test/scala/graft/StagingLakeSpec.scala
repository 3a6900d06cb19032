package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Cross-session persistent staging (the lake layer): a second session
  * must be SERVED a published artifact — zero rebuild — keyed by corpus
  * content fingerprint, with the staged hash partitioning restored.
  */
class StagingLakeSpec extends SparkSpecBase {

  private def writeCorpus(dir: String): Unit =
    spark.range(200).select(col("id"), (col("id") % 7).as("k"))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")

  test("second session serves the published artifact with zero rebuilds") {
    val corpus = tmpDir("lake_corpus")
    val lake = tmpDir("lake_root")
    writeCorpus(corpus)

    val cache = new Staging.SessionCache()
    var builds = 0
    def build(s: org.apache.spark.sql.SparkSession) = {
      builds += 1
      s.read.parquet(s"$corpus/t.parquet").groupBy("k")
        .agg(count(lit(1)).as("n")).localCheckpoint()
    }

    val s1 = spark.newSession()
    s1.conf.set(Staging.LakeConfKey, lake)
    val a = cache.getOrBuild(s1, corpus, "agg_index")(build(s1))
    assert(builds === 1)
    // same session: in-memory hit, no second build
    cache.getOrBuild(s1, corpus, "agg_index")(build(s1))
    assert(builds === 1)

    // published: the artifact is a complete parquet dir under the lake
    val fp = Staging.corpusFingerprint(s1, corpus)
    val artifact = new java.io.File(s"$lake/v1/agg_index/fp=$fp/_SUCCESS")
    assert(artifact.exists(), s"expected published artifact at $artifact")

    // a NEW session must be served from the lake: the build thunk is
    // never invoked (the corpus is read zero times)
    val s2 = spark.newSession()
    s2.conf.set(Staging.LakeConfKey, lake)
    val served = cache.getOrBuild(s2, corpus, "agg_index")(build(s2))
    assert(builds === 1, "second session rebuilt instead of reading the lake")
    assert(served.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      === a.collect().map(r => (r.getLong(0), r.getLong(1))).sorted)
  }

  test("lake-served artifact restores the staged hash partitioning") {
    val corpus = tmpDir("lake_corpus_p")
    val lake = tmpDir("lake_root_p")
    writeCorpus(corpus)
    val cache = new Staging.SessionCache()
    def build(s: org.apache.spark.sql.SparkSession) =
      Staging.preservePartitioning(s)(
        s.read.parquet(s"$corpus/t.parquet")
          .repartition(col("k")).localCheckpoint())

    val s1 = spark.newSession()
    s1.conf.set(Staging.LakeConfKey, lake)
    cache.getOrBuild(s1, corpus, "edges", Seq("k"))(build(s1))

    val s2 = spark.newSession()
    s2.conf.set(Staging.LakeConfKey, lake)
    val served = cache.getOrBuild(s2, corpus, "edges", Seq("k"))(build(s2))
    // the leaf advertises hashpartitioning(k): an aggregate on k plans
    // with NO shuffle exchange on top of it
    val agg = served.groupBy("k").agg(count(lit(1)))
    val exchanges = agg.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"lake-served leaf lost its partitioning:\n${agg.queryExecution.executedPlan}")
  }

  test("regenerated corpus moves the fingerprint and misses stale artifacts") {
    val corpus = tmpDir("lake_corpus_fp")
    val lake = tmpDir("lake_root_fp")
    writeCorpus(corpus)
    val cache = new Staging.SessionCache()
    var builds = 0
    def build(s: org.apache.spark.sql.SparkSession) = {
      builds += 1
      s.read.parquet(s"$corpus/t.parquet").agg(count(lit(1)).as("n"))
        .localCheckpoint()
    }
    val s1 = spark.newSession()
    s1.conf.set(Staging.LakeConfKey, lake)
    val fp1 = Staging.corpusFingerprint(s1, corpus)
    cache.getOrBuild(s1, corpus, "stats")(build(s1))
    assert(builds === 1)

    // regenerate the corpus in place: content (and file metadata) change
    spark.range(300).select(col("id"), (col("id") % 7).as("k"))
      .write.mode("overwrite").parquet(s"$corpus/t.parquet")
    val fp2 = Staging.corpusFingerprint(s1, corpus)
    assert(fp1 !== fp2, "fingerprint must move when the corpus is rewritten")

    // a fresh session must REBUILD (new fingerprint → lake miss), not
    // be served the stale snapshot's artifact
    val s2 = spark.newSession()
    s2.conf.set(Staging.LakeConfKey, lake)
    val served = cache.getOrBuild(s2, corpus, "stats")(build(s2))
    assert(builds === 2)
    assert(served.head().getLong(0) === 300L)
  }

  test("no lake conf: behavior is session-local (build once per session)") {
    val corpus = tmpDir("lake_corpus_n")
    writeCorpus(corpus)
    val cache = new Staging.SessionCache()
    var builds = 0
    def build(s: org.apache.spark.sql.SparkSession) = {
      builds += 1
      s.read.parquet(s"$corpus/t.parquet").agg(count(lit(1))).localCheckpoint()
    }
    val s1 = spark.newSession()
    cache.getOrBuild(s1, corpus, "x")(build(s1))
    cache.getOrBuild(s1, corpus, "x")(build(s1))
    assert(builds === 1)
    val s2 = spark.newSession()
    cache.getOrBuild(s2, corpus, "x")(build(s2))
    assert(builds === 2) // no lake → a new session rebuilds
  }

  test("requireDurable fails loud on the no-checkpoint-dir path; a " +
      "checkpoint dir satisfies it") {
    val corpus = tmpDir("lake_corpus_rd")
    writeCorpus(corpus)
    val cache = new Staging.SessionCache()
    def build(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(s"$corpus/t.parquet").agg(count(lit(1)).as("n"))
        .localCheckpoint()

    val s1 = spark.newSession()
    s1.conf.set(Staging.RequireDurableConfKey, "true")
    // the checkpoint dir is CONTEXT-global and other suites may have
    // set one — save it, run both branches against a controlled
    // state, restore at the end
    val prevDir = s1.sparkContext.getCheckpointDir
    try {
      s1.sparkContext.setCheckpointDir(null)
      val e = intercept[IllegalStateException] {
        cache.getOrBuild(s1, corpus, "must_be_durable")(build(s1))
      }
      assert(e.getMessage.contains(Staging.RequireDurableConfKey))
      assert(e.getMessage.contains("must_be_durable"))

      // with a reliable checkpoint dir the same request is served
      s1.sparkContext.setCheckpointDir(tmpDir("lake_ckpt_rd"))
      val a = cache.getOrBuild(s1, corpus, "must_be_durable")(build(s1))
      assert(a.head().getLong(0) === 200L)
    } finally prevDir match {
      case Some(d) => s1.sparkContext.setCheckpointDir(d)
      case None => s1.sparkContext.setCheckpointDir(null)
    }
  }

  test("lost localCheckpoint entry: consuming fails; invalidate + " +
      "getOrBuild is the recovery path") {
    val corpus = tmpDir("lake_corpus_loss")
    writeCorpus(corpus)
    val cache = new Staging.SessionCache()
    var builds = 0
    def build(s: org.apache.spark.sql.SparkSession) = {
      builds += 1
      s.read.parquet(s"$corpus/t.parquet").agg(count(lit(1)).as("n"))
        .localCheckpoint()
    }
    val s1 = spark.newSession()
    val a = cache.getOrBuild(s1, corpus, "volatile")(build(s1))
    assert(builds === 1 && a.head().getLong(0) === 200L)

    // simulate executor loss: the entry's memory-only blocks vanish.
    // The truncated-lineage frame is now unrecoverable — exactly the
    // hazard RequireDurableConfKey exists to refuse up front.
    Staging.backingRdd(a).get.unpersist(blocking = true)
    intercept[Exception] { a.count() }

    // recovery contract: invalidate drops the dead entry, the next
    // getOrBuild rebuilds from source
    cache.invalidate(s1, corpus)
    val b = cache.getOrBuild(s1, corpus, "volatile")(build(s1))
    assert(builds === 2)
    assert(b.head().getLong(0) === 200L)
  }

  test("pruneLake removes artifacts older than the cutoff") {
    val corpus = tmpDir("lake_corpus_pr")
    val lake = tmpDir("lake_root_pr")
    writeCorpus(corpus)
    val cache = new Staging.SessionCache()
    val s1 = spark.newSession()
    s1.conf.set(Staging.LakeConfKey, lake)
    cache.getOrBuild(s1, corpus, "old_idx")(
      s1.read.parquet(s"$corpus/t.parquet").limit(5).localCheckpoint())
    // everything is younger than 1h → nothing pruned
    assert(Staging.pruneLake(s1, 3600 * 1000L) === 0)
    // cutoff in the future → the artifact is "old" and goes
    assert(Staging.pruneLake(s1, -1000L) === 1)
    val keyDir = new java.io.File(s"$lake/v1/old_idx")
    assert(!keyDir.exists() || keyDir.list().isEmpty)
  }

  test("retention keeps the newest N fingerprints per key; report accounts for all") {
    val corpus = tmpDir("lake_corpus_rt")
    val lake = tmpDir("lake_root_rt")
    writeCorpus(corpus)
    val cache = new Staging.SessionCache()
    val s1 = spark.newSession()
    s1.conf.set(Staging.LakeConfKey, lake)
    cache.getOrBuild(s1, corpus, "ret_idx")(
      s1.read.parquet(s"$corpus/t.parquet").limit(5).localCheckpoint())
    val liveFp = Staging.corpusFingerprint(s1, corpus)
    // two older snapshots of the same key (yesterday's corpus
    // fingerprints), plus an in-flight publish temp that retention
    // must never touch
    Seq("00000000000000aa" -> 48 * 3600 * 1000L,
        "00000000000000bb" -> 24 * 3600 * 1000L).foreach { case (fp, age) =>
      val p = s"$lake/v1/ret_idx/fp=$fp"
      s1.range(3).write.mode("overwrite").parquet(p)
      new java.io.File(p).setLastModified(System.currentTimeMillis() - age)
    }
    val tmp = new java.io.File(s"$lake/v1/ret_idx/.tmp-fp=cc-inflight")
    tmp.mkdirs()
    // the report sees every snapshot, none of them the temp
    val rep = Staging.lakeReport(s1).collect()
    assert(rep.map(_.getString(1)).sorted.toSeq ===
      Seq("00000000000000aa", "00000000000000bb", liveFp).sorted)
    assert(rep.forall(_.getBoolean(5)), "published snapshots must be complete")
    assert(rep.forall(r => r.getLong(2) > 0 && r.getLong(3) > 0L))
    // keep the newest 1 → the two aged snapshots go, the live one and
    // the in-flight temp stay
    assert(Staging.retainNewestFingerprints(s1, keep = 1) === 2)
    assert(new java.io.File(s"$lake/v1/ret_idx/fp=$liveFp").exists())
    assert(tmp.exists(), "retention deleted an in-flight publish temp")
    assert(Staging.lakeReport(s1).collect().map(_.getString(1)).toSeq
      === Seq(liveFp))
    // idempotent at the floor
    assert(Staging.retainNewestFingerprints(s1, keep = 1) === 0)
    intercept[IllegalArgumentException] {
      Staging.retainNewestFingerprints(s1, keep = 0)
    }
  }

  test("eviction never breaks an in-flight serve; the next miss rebuilds") {
    val corpus = tmpDir("lake_corpus_ev")
    val lake = tmpDir("lake_root_ev")
    writeCorpus(corpus)
    val cache = new Staging.SessionCache()
    var builds = 0
    def build(s: org.apache.spark.sql.SparkSession) = {
      builds += 1
      s.read.parquet(s"$corpus/t.parquet").groupBy(col("k"))
        .agg(count(lit(1)).as("n")).localCheckpoint()
    }
    val s1 = spark.newSession()
    s1.conf.set(Staging.LakeConfKey, lake)
    cache.getOrBuild(s1, corpus, "ev_idx")(build(s1))
    assert(builds === 1)
    // a SECOND session is served from the lake (no rebuild) — this is
    // the in-flight consumer eviction must not break
    val s2 = spark.newSession()
    s2.conf.set(Staging.LakeConfKey, lake)
    val served = cache.getOrBuild(s2, corpus, "ev_idx")(build(s2))
    assert(builds === 1)
    // evict EVERYTHING from the lake while s2 still holds the serve
    assert(Staging.pruneLake(s1, -1000L) >= 1)
    // the served frame was materialized at read time: its blocks are
    // session-held, so the delete is invisible to the consumer...
    assert(served.collect().map(r => (r.getLong(0), r.getLong(1))).length === 7)
    // ...and the same session's cache entry still hits in memory
    cache.getOrBuild(s2, corpus, "ev_idx")(build(s2))
    assert(builds === 1)
    // a THIRD session misses cleanly: rebuild from source + republish
    val s3 = spark.newSession()
    s3.conf.set(Staging.LakeConfKey, lake)
    cache.getOrBuild(s3, corpus, "ev_idx")(build(s3))
    assert(builds === 2, "post-eviction miss did not rebuild")
    val fp = Staging.corpusFingerprint(s3, corpus)
    assert(new java.io.File(s"$lake/v1/ev_idx/fp=$fp/_SUCCESS").exists(),
      "rebuild did not republish")
  }

  test("freshStatsLeaf keeps rows and partitioning but resets inherited stats") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    // a joined-then-checkpointed frame inherits the join's multiplied
    // sizeInBytes as originStats — the compounding input of the
    // iterative-loop planner blowup
    val a = spark.range(200).select($"id".as("k"), ($"id" * 2).as("v"))
    val joined = a.join(a.select($"k", $"v".as("w")), "k").repartition($"k")
    val ck = Staging.preservePartitioning(spark)(joined.localCheckpoint())
    val fresh = Bridge.freshStatsLeaf(ck)
    // rows identical
    assert(fresh.collect().map(_.toSeq).toSet === ck.collect().map(_.toSeq).toSet)
    // the hash(k) partitioning advertisement survives (the property
    // the staged-graph loops rely on to avoid per-round exchanges)
    val leaf = fresh.queryExecution.optimizedPlan
      .collectFirst { case lr: org.apache.spark.sql.execution.LogicalRDD => lr }
    assert(leaf.nonEmpty, "fresh frame is not a LogicalRDD leaf")
    assert(leaf.get.outputPartitioning.toString.contains("hashpartitioning"),
      s"partitioning lost: ${leaf.get.outputPartitioning}")
    // stats reset to the size-independent default leaf estimate —
    // NOT the origin plan's (data-derived, loop-compounding) figure
    val inherited = ck.queryExecution.optimizedPlan.stats.sizeInBytes
    val reset = fresh.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(reset !== inherited,
      s"freshStatsLeaf kept the inherited stats ($inherited)")
    assert(reset === BigInt(spark.sessionState.conf.defaultSizeInBytes),
      s"expected defaultSizeInBytes, got $reset")
    // non-leaf frames pass through untouched
    val plain = a.where($"k" > 10)
    assert(Bridge.freshStatsLeaf(plain) eq plain)
  }
}
