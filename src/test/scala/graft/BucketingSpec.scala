package graft

import org.apache.spark.sql.execution.ExplainMode
import graft.sinks.{Bucketing, PartitionedParquetSink}

/** Scale-layout specs: bucketed co-located joins and partition-pruned
  * reads of the day-partitioned sink layout.
  */
class BucketingSpec extends SparkSpecBase {

  test("join of co-bucketed tables plans with zero exchanges") {
    import spark.implicits._
    val facts = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("v1"))
    val other = spark.range(1000).select($"id".as("k"), ($"id" * 3).as("v2"))
    Bucketing.writeBucketed(facts, "graft_bucketed_a", "k", 4, Seq("k"))
    Bucketing.writeBucketed(other, "graft_bucketed_b", "k", 4, Seq("k"))
    // disable auto-broadcast: the point is the big-big join shape,
    // where neither side fits in memory and only bucketing avoids the
    // shuffle (broadcast would hide it on toy data)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "graft_bucketed_a", "graft_bucketed_b", "k")
      val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("date-partitioned layout prunes partitions on read") {
    import spark.implicits._
    val out = tmpDir("prune") + "/t"
    val df = Seq(
      ("2024-01-01 10:00:00", 1L), ("2024-01-02 10:00:00", 2L),
      ("2024-01-03 10:00:00", 3L))
      .toDF("ts_s", "v").withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    PartitionedParquetSink.write(df, "ts", out)
    val read = spark.read.parquet(out).where($"date" === "2024-01-02")
    val p = read.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters: [isnotnull(date"), s"no partition pruning:\n$p")
    assert(read.count() === 1)
  }
}
