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

  test("Graft.register exposes functions on a session without extensions") {
    val s2 = spark.newSession() // fresh function registry state
    Graft.register(s2)
    assert(s2.sql("SELECT ip6_ntoa(ip6_aton('2001:0DB8::1'))")
      .head().getString(0) === "2001:db8::1")
    assert(s2.sql("SELECT topk_agg(x, 1) FROM VALUES (1.0D), (3.0D) AS t(x)")
      .head().getSeq[Double](0) === Seq(3.0))
  }
}
