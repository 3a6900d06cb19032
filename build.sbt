ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nfdump2clickhousespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output normally relays through sbt's logger, which
// prefixes every line with "[info] " — that prefix is what kept the
// bench headline JSON unparseable in the driver's captured tail.
// StdoutOutput passes the child's stdout/stderr through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] packs driver + all 32 executor threads into ONE heap;
  // at 8g the bench JVM spent whole seconds per stage in G1 evacuation
  // pauses that stall every task thread at once (stage metrics showed
  // 3s-wall stages carrying 90s+ of summed task time on <1 MB inputs).
  // 24g in a 128 GiB sandbox keeps the measured queries out of the GC
  // band: e.g. ann_topk_ivfpq steady 6.7s -> 1.4s, text_bigram_kn
  // 3.1s -> 1.6s (same host, same code). Still env-overridable for
  // smaller hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // commit + zero the whole heap at JVM start (untimed), not lazily
  // inside whichever early query first allocates into a fresh region:
  // with -Xms unset the first allocation-heavy queries of a run paid
  // the OS page-commit cost as measured query time
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
) ++
  // measurement hook: point java.io.tmpdir (temp streaming
  // checkpoints, spool dirs) somewhere else — e.g. a tmpfs — to A/B
  // the placement of small-file-sync-heavy scratch I/O. Default
  // unchanged.
  sys.env.get("SPARK_GRAFT_TMPDIR").map(d => s"-Djava.io.tmpdir=$d").toSeq ++
  // measurement hook: extra JVM flags (e.g. "-Xlog:gc") for GC/JIT
  // attribution runs. Default unchanged.
  sys.env.get("SPARK_GRAFT_XJVM").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
