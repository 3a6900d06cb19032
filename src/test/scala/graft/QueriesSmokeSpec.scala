package graft

/** Every registered query runs at sf0.001 and yields a stable schema;
  * the flagship entry returns rows (the driver's t1 smoke).
  */
class QueriesSmokeSpec extends SparkSpecBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared oracle has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("every registered query is documented in SURVEY.md section 2") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")))
    val undocumented = SparkEntry.queries.keySet
      .filterNot(name => survey.contains(s"`$name`"))
    assert(undocumented.isEmpty,
      s"queries missing a SURVEY section-2 row: ${undocumented.toSeq.sorted}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("approx sketches stay within error bounds of their exact twins") {
    // rows-only queries (no DuckDB oracle) still get checked: the
    // sketch column must track the exact column computed in the same row
    for (r <- graft.queries.Relational.approxPercentile(spark, sf0001).collect()) {
      val (a50, e50) = (r.getDouble(1), r.getDouble(2))
      val (a99, e99) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(a50 - e50) / e50 < 0.05, s"p50 off: $a50 vs $e50")
      assert(math.abs(a99 - e99) / e99 < 0.05, s"p99 off: $a99 vs $e99")
    }
    for (r <- graft.queries.Relational.approxHll(spark, sf0001).collect()) {
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact).toDouble / exact < 0.1,
        s"HLL off: $approx vs $exact")
    }
  }
}
