package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler for perf bisection — not part of the
  * library surface.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    val d0 = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val d = d0.union(d0.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" near dup tail marker")).as("text")))
      .withColumn("pfx", substring($"text", 1, 12))
      .withColumn("bucket", expr("length(text) div 32"))
    t("corpus")(d.count())
    val l = d.as("l"); val r = d.as("r")
    val joined = l.join(r,
      $"l.pfx" === $"r.pfx" && $"l.bucket" === $"r.bucket" &&
        $"l.doc_id" < $"r.doc_id")
    t("join_only")(joined.count())
    t("join_lev")(joined
      .withColumn("dist", levenshtein($"l.text", $"r.text", 26).cast("long"))
      .where($"dist" >= 0 && $"dist" <= 25).count())
    t("full")(graft.dedup.Dedup.editDistance(spark, dir).count())
    spark.stop()
  }
}
