package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: session init, codegen compiler, parquet reader
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // deterministic name order: hash-map order varies as queries are
    // added, which made per-query numbers incomparable across rounds
    // (a heavy query's cost depends on how much JVM/codegen history
    // precedes it)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // collect garbage OUTSIDE the timed section: accumulated heap
      // from prior queries otherwise lands as a GC pause inside
      // whichever heavy query happens to trigger it
      System.gc()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAILURE in $name: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      // a failed query reports -1 (unmistakably not a duration) so a
      // regression can't masquerade as a fast run
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
