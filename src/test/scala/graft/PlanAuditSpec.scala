package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import graft.queries.Relational
import graft.flow.FlowAnalytics
import graft.text.TextAnalytics

/** Physical-plan audit (SURVEY §4): the properties that make these
  * plans survive a 100× scale-up are asserted, not assumed —
  * predicate pushdown into the parquet scan, column pruning, broadcast
  * joins for dimensions, partial aggregation, top-K without total
  * sort, whole-stage codegen on the hot paths.
  */
class PlanAuditSpec extends SparkSpecBase {

  def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q1_agg pushes the shipdate filter into the parquet scan and pre-aggregates") {
    val df = Relational.q1Agg(spark, sf0001)
    df.collect() // materialize so AQE's final plan (with codegen ids) is visible
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushdown:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "no partial aggregation")
    assert(p.contains("codegen id"), "not codegen'd")
  }

  test("q1_agg prunes lineitem to the referenced columns") {
    val p = plan(Relational.q1Agg(spark, sf0001))
    assert(!p.contains("l_orderkey"), s"unpruned scan:\n$p")
    assert(!p.contains("l_partkey"), "unpruned scan")
  }

  test("q3/q5 broadcast every dimension side") {
    assert(plan(Relational.q3JoinAgg(spark, sf0001))
      .contains("BroadcastHashJoin"), "customer not broadcast")
    val p5 = plan(Relational.q5MultiJoin(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p5).length >= 4,
      s"snowflake dims not broadcast:\n$p5")
    assert(!p5.contains("SortMergeJoin"), "unexpected shuffle join in q5")
  }

  test("semi/anti joins plan as join types, not filters") {
    assert(plan(Relational.joinSemi(spark, sf0001)).contains("LeftSemi"))
    assert(plan(Relational.joinAnti(spark, sf0001)).contains("LeftAnti"))
  }

  test("global top-K plans as TakeOrderedAndProject (no total sort)") {
    val p = plan(Relational.orderbyLimit(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), s"full sort planned:\n$p")
  }

  test("text ops prune documents to (doc_id, text)") {
    val p = plan(TextAnalytics.tokenCount(spark, sf0001))
    assert(!p.contains("lang"), s"unpruned documents scan:\n$p")
    assert(!p.contains("source"), "unpruned documents scan")
  }

  test("flow analytics aggregate partially before the shuffle") {
    val p = plan(FlowAnalytics.topTalkers(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"no map-side combine:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "top-N sorted globally")
  }

  test("minhash signature builds from codegen'd aggregates, not interpreted folds") {
    val p = plan(graft.dedup.Dedup.minhash(spark, sf0001))
    // the 64 min-slot aggregates must partial-aggregate (map-side combine)
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"no partial agg:\n$p")
    assert(p.contains("Generate"), "shingles not exploded")
  }

  test("brute-force ANN broadcasts the probe side, not the corpus") {
    val p = plan(graft.ann.Knn.bruteTopK(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probes not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), "corpus-side cartesian planned")
  }

  test("ASOF join is one shuffle on the key (no nested-loop inequality join)") {
    val p = plan(graft.operators.Joins.joinAsof(spark, sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"inequality join planned:\n$p")
    assert(p.contains("Window"), "expected window-based asof carry")
  }

  test("codegen'd IP expressions stay inside WholeStageCodegen") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // non-literal input so constant folding can't pre-evaluate the plan
    val df = spark.range(300)
      .select(concat(lit("10.1.2."), pmod($"id", lit(256))).as("ip"))
      .where(graft.functions.IpFuncs.ip4_in_cidr($"ip", lit("10.0.0.0/8")))
      .select(graft.functions.IpFuncs.ip4_aton($"ip").as("n"))
    val p = plan(df)
    assert(p.contains("codegen id"), s"IP exprs fell out of codegen:\n$p")
    assert(df.collect().map(_.getLong(0)).min === 167838208L) // 10.1.2.0
  }
}
