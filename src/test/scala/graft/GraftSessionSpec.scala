package graft

/** Library entry point: pre-configured builder + late registration. */
class GraftSessionSpec extends SparkSpecBase {

  test("Graft.builder pre-wires extensions and UTC timezone") {
    // can't create a second context in-JVM; assert on the builder's
    // effect through a derived session of the (identically-configured)
    // shared one: functions resolve and the rule folds
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(spark.sql("SELECT ip4_aton('1.2.3.4')").head().getLong(0) === 16909060L)
    assert(spark.sql("SELECT vec_cos(array(1.0D, 0.0D), array(1.0D, 0.0D))")
      .head().getDouble(0) === 1.0)
  }

  test("Graft.session wires a reliable checkpoint dir and materialize uses it") {
    import spark.implicits._
    val dir = tmpDir("graft_ckpt")
    // getOrCreate reuses the JVM-shared context; the call's contract is
    // the checkpoint-dir side effect
    val s = Graft.session(dir, _.master("local[4]"))
    assert(s.sparkContext.getCheckpointDir.exists(_.contains(
      java.nio.file.Paths.get(dir).getFileName.toString)))
    // the iterative dedup path must now take df.checkpoint() (durable
    // files under the configured dir), not executor-memory
    // localCheckpoint — the final labels frame stays checkpointed
    val docs = (0L to 4L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (3L, 4L)).toDF("d1", "d2")
    val labels = graft.dedup.Dedup.connectedComponentsTwoPhase(docs, pairs)
    assert(labels.count() === 5)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, s"no reliable checkpoint files written under $dir")
  }

  test("Graft.register exposes functions on a session without extensions") {
    val s2 = spark.newSession() // fresh function registry state
    Graft.register(s2)
    assert(s2.sql("SELECT ip6_ntoa(ip6_aton('2001:0DB8::1'))")
      .head().getString(0) === "2001:db8::1")
    assert(s2.sql("SELECT topk_agg(x, 1) FROM VALUES (1.0D), (3.0D) AS t(x)")
      .head().getSeq[Double](0) === Seq(3.0))
  }
}
