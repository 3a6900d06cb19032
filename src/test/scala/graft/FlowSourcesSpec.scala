package graft

import java.nio.file.{Files, Paths}
import graft.sinks.PartitionedParquetSink
import graft.sources.FlowSources

/** A10: warehouse date-range reads (pruned) + JSON-lines source. */
class FlowSourcesSpec extends SparkSpecBase {

  test("nflows date-range read prunes to the requested partitions") {
    import spark.implicits._
    val out = tmpDir("wh") + "/nflows"
    val df = Seq(
      ("2024-01-01 10:00:00", "10.0.0.1"), ("2024-01-02 10:00:00", "10.0.0.2"),
      ("2024-01-03 10:00:00", "10.0.0.3"), ("2024-01-04 10:00:00", "10.0.0.4"))
      .toDF("ts_s", "sa").withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    PartitionedParquetSink.write(df, "ts", out)
    val read = FlowSources.nflows(spark, out, "2024-01-02", "2024-01-03")
    val p = read.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters"), s"no pruning:\n$p")
    assert(read.select("sa").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("10.0.0.2", "10.0.0.3"))
  }

  test("jsonl source parses typed flow records and drops junk lines") {
    val dir = tmpDir("jsonl")
    Files.write(Paths.get(dir, "flows.jsonl"),
      ("""{"ts":"2024-05-01 10:00:00.250","te":"2024-05-01 10:00:02.750","td":2.5,"sa":"192.168.1.10","da":"10.0.0.5","sp":52000,"dp":443,"pr":"TCP","flg":".AP.SF","ipkt":10,"ibyt":1024,"ra":"172.16.0.1","flowsrc":"edge"}""" + "\n" +
       """this is not json""" + "\n" +
       """{"ts":"2024-05-02 11:30:00","te":"2024-05-02 11:30:10","td":10.0,"sa":"10.1.2.3","da":"8.8.8.8","sp":123,"dp":123,"pr":"UDP","flg":"......","ipkt":2,"ibyt":160,"ra":"172.16.0.1","flowsrc":"edge"}""").getBytes)
    val df = FlowSources.jsonl(spark, dir)
    assert(df.count() === 2)
    val r = df.orderBy("ts").collect()(0)
    assert(r.getAs[Int]("dp") === 443)
    assert(r.getAs[Long]("ibyt") === 1024L)
    assert(r.getAs[String]("flowsrc") === "edge")
  }
}
