package graft.flow

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.sys.process.{Process, ProcessLogger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** nfdump binary invocation (SURVEY §2 A12): the reference's first
  * pipeline step is `nfdump -r <nfcapd file> -o csv -q` shelled per
  * captured file, with the CSV parsed from a temp file. This wrapper
  * reproduces that exec + tempfile lifecycle in front of the
  * [[NfdumpCsv]] source.
  *
  * Driver-side by design: nfcapd files arrive one-per-rotation-period
  * per collector (a few files/minute), so decode is not the scale
  * problem — the parse/transform/sink stages behind it are, and those
  * run distributed. Each decode writes to `<staging>/.inprogress/` and
  * moves the finished CSV atomically into the staging dir, so a
  * concurrently-running Structured Streaming file source (A6) never
  * observes a half-written file; failures leave nothing visible.
  *
  * `command` is injectable (default `nfdump`) — tests and air-gapped
  * environments substitute a stub executable.
  */
object NfdumpExec {

  final case class DecodeResult(source: Path, staged: Path, lines: Long)

  /** Decode one nfcapd file to `<stagingDir>/<name>.csv` (header line
    * included — [[NfdumpCsv]] reads `header=true` and drops the
    * trailing summary block). Throws on non-zero exit; the partial
    * temp file is removed and nothing becomes visible in stagingDir.
    */
  def decodeFile(nfcapd: Path, stagingDir: Path,
      command: String = "nfdump"): DecodeResult = {
    require(Files.isRegularFile(nfcapd), s"not a file: $nfcapd")
    Files.createDirectories(stagingDir)
    val workDir = stagingDir.resolve(".inprogress")
    Files.createDirectories(workDir)
    val tmp = workDir.resolve(nfcapd.getFileName.toString + ".csv.tmp")
    val out = stagingDir.resolve(nfcapd.getFileName.toString + ".csv")
    val stderr = new StringBuilder
    var lines = 0L
    try {
      val writer = Files.newBufferedWriter(tmp)
      val exit =
        try {
          Process(Seq(command, "-r", nfcapd.toString, "-o", "csv"))
            .run(ProcessLogger(
              line => { writer.write(line); writer.newLine(); lines += 1 },
              err => { stderr.append(err).append('\n'); () }))
            .exitValue()
        } finally writer.close()
      if (exit != 0)
        throw new RuntimeException(
          s"$command exited $exit for $nfcapd: ${stderr.toString.trim}")
      // atomic publish: readers of stagingDir never see partial output
      Files.move(tmp, out, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      DecodeResult(nfcapd, out, lines)
    } finally Files.deleteIfExists(tmp)
  }

  /** The closed, not-yet-staged captures in `inDir` — ONE definition
    * of the skip rules for both sweep variants: only `nfcapd.*` names
    * (the collector's rotation naming); `nfcapd.current*` — the
    * capture nfdump is still writing — is skipped, since decoding a
    * half-written file would stage a truncated CSV whose name then
    * blocks the finished file forever; already-staged names are
    * skipped for idempotence.
    */
  private def closedCaptures(inDir: Path, stagingDir: Path): Seq[Path] = {
    val stream = Files.list(inDir)
    try {
      val files = stream.iterator()
      val out = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (files.hasNext) {
        val f = files.next()
        val name = f.getFileName.toString
        if (Files.isRegularFile(f) && name.startsWith("nfcapd.") &&
            !name.startsWith("nfcapd.current") &&
            !Files.exists(stagingDir.resolve(name + ".csv")))
          out += f
      }
      out.toSeq
    } finally stream.close()
  }

  /** Decode every CLOSED nfcapd file in `inDir` (non-recursive) into
    * `stagingDir` — idempotent, so a watcher can call it on every
    * rotation tick. One failing file does not abort the sweep;
    * failures go to stderr and the file is retried next tick (nothing
    * was staged for it).
    */
  def decodeDir(inDir: Path, stagingDir: Path,
      command: String = "nfdump"): Seq[DecodeResult] =
    closedCaptures(inDir, stagingDir).flatMap { f =>
      try Some(decodeFile(f, stagingDir, command))
      catch {
        case e: Exception =>
          System.err.println(
            s"[nfdump-exec] skipping ${f.getFileName}: ${e.getMessage}")
          None
      }
    }

  /** Executor-distributed variant of [[decodeDir]] for many-collector
    * backfills: the driver lists closed files (a metadata-only sweep,
    * same skip rules), then the per-file exec + atomic staging runs on
    * executors via one `mapPartitions` pass — a 1000-collector
    * backlog decodes at cluster width instead of serializing through
    * the driver loop. Requires `command` and both directories to be
    * reachable from executors (shared storage on a real cluster;
    * trivially true in local mode).
    *
    * Per-file failures stay isolated (logged on the executor, retried
    * next tick). The returned summary is one small metadata row per
    * decoded file — the only thing that crosses back to the driver;
    * the decoded bytes never do.
    */
  def decodeDirDistributed(spark: SparkSession, inDir: Path, stagingDir: Path,
      command: String = "nfdump", parallelism: Int = 0): Seq[DecodeResult] = {
    val todo = closedCaptures(inDir, stagingDir).map(_.toString)
    if (todo.isEmpty) return Seq.empty
    val par = math.min(
      if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism,
      todo.size)
    // java.nio.Path is not Serializable — only strings enter the closure
    val stagingStr = stagingDir.toString
    val cmd = command
    spark.sparkContext.parallelize(todo, par)
      .mapPartitions { it =>
        it.flatMap { f =>
          try {
            val r = decodeFile(Paths.get(f), Paths.get(stagingStr), cmd)
            Iterator.single((f, r.staged.toString, r.lines))
          } catch {
            case e: Exception =>
              System.err.println(s"[nfdump-exec] skipping $f: ${e.getMessage}")
              Iterator.empty
          }
        }
      }
      .collect()
      .toSeq
      .map { case (src, staged, lines) =>
        DecodeResult(Paths.get(src), Paths.get(staged), lines)
      }
      .sortBy(_.source.toString)
  }

  /** Decode + parse: the reference's per-file `nfdump | pandas` leg as
    * one call, returning the typed flow frame over the staged CSVs.
    */
  def readVia(spark: SparkSession, inDir: String, stagingDir: String,
      command: String = "nfdump"): DataFrame = {
    decodeDir(Paths.get(inDir), Paths.get(stagingDir), command)
    NfdumpCsv.read(spark, stagingDir + "/*.csv")
  }
}
