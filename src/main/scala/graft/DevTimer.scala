package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage timing breakdown for the bench tail — the artifact that
  * separates "the plan regressed" from "the host was loaded": each
  * query runs 3× (run 1 pays any session-staging build; runs 2–3 are
  * steady-state) and every completed Spark stage in the run window is
  * recorded with wall duration, summed task time, and shuffle/input
  * volume. Emits one JSON file (default `TIMING_TAIL.json`).
  *
  * Usage: `runMain graft.DevTimer q1 q2 ...` — or with no args, the
  * queries ≥ 4 s in `BENCH_DETAIL.json` from the last bench run.
  */
object DevTimer {

  private case class StageRow(id: Int, name: String, wallMs: Long,
      taskMs: Long, shufReadMB: Double, shufWriteMB: Double, inputMB: Double)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // default NO lake (pure session staging); set SPARK_GRAFT_LAKE to
      // time the bench's lake-serving path (run 1 = serve, not build)
      .config(Staging.LakeConfKey, Staging.lakeRootFromEnv(default = ""))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stageBuf = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        stageBuf.add(StageRow(si.stageId, si.name.takeWhile(_ != '\n'), wall,
          m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6))
      }
    })

    SparkEntry.entry(spark).count() // untimed warm-up

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else { // default: the ≥4 s tail of the last bench run
        val detail = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BENCH_DETAIL.json")), "UTF-8")
        "\"([a-z0-9_]+)\":([0-9.]+)".r.findAllMatchIn(detail)
          .filter(m => m.group(2).toDouble >= 4.0 && SparkEntry.queries.contains(m.group(1)))
          .map(_.group(1)).toSeq.distinct
      }

    def j(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val out = new StringBuilder("{\n")
    names.zipWithIndex.foreach { case (q, qi) =>
      val runWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
      val runs = (1 to 3).map { run =>
        System.gc()
        stageBuf.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        runWalls += wall
        // listener events are async; give the bus a beat to drain so
        // late stage-completed events land in-window
        Thread.sleep(300)
        val stages = {
          val it = stageBuf.iterator(); val b = Seq.newBuilder[StageRow]
          while (it.hasNext) b += it.next()
          b.result().sortBy(-_.wallMs).take(8) // the stages that matter
        }
        val ss = stages.map(s =>
          s"""{"stage":${s.id},"wall_ms":${s.wallMs},"task_ms":${s.taskMs},""" +
          f""""shuf_read_mb":${s.shufReadMB}%.1f,"shuf_write_mb":${s.shufWriteMB}%.1f,""" +
          f""""input_mb":${s.inputMB}%.1f,"at":${j(s.name)}}""").mkString("[", ",", "]")
        f"""{"run":$run,"wall_s":$wall%.3f,"top_stages":$ss}"""
      }
      // First-consumer attribution, made explicit: run 1 pays any
      // per-session staging build (graph edge tables, signature
      // indexes); steady_s is the min of runs 2–3 (the cost every
      // LATER consumer of the same staged artifact pays), and
      // stage_build_s is the difference — so a bench-to-bench "query
      // regressed" claim can be checked against the steady number
      // instead of whichever query alphabetically paid the build.
      val steady = runWalls.drop(1).min
      out.append(s"  ${j(q)}: {\n" +
        f"""    "first_run_s":${runWalls.head}%.3f,"steady_s":$steady%.3f,""" +
        f""""stage_build_s":${math.max(0.0, runWalls.head - steady)}%.3f,%n""" +
        s"""    "runs": [\n    ${runs.mkString(",\n    ")}\n  ]}""")
      out.append(if (qi < names.size - 1) ",\n" else "\n")
    }
    out.append("}\n")
    val path = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_TIMING_OUT", "TIMING_TAIL.json"))
    java.nio.file.Files.write(path, out.toString.getBytes("UTF-8"))
    println(s"wrote $path (${names.size} queries)")
    spark.stop()
  }
}
