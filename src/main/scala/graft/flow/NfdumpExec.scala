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

  /** Decode every CLOSED nfcapd file in `inDir` (non-recursive) into
    * `stagingDir` — idempotent, so a watcher can call it on every
    * rotation tick.
    *
    * Only `nfcapd.*` names are considered (the collector's rotation
    * naming) and `nfcapd.current*` — the capture nfcapd is still
    * writing — is skipped: decoding a half-written file would stage a
    * truncated CSV whose name then blocks the finished file forever.
    * One failing file does not abort the sweep; failures go to stderr
    * and the file is retried next tick (nothing was staged for it).
    */
  def decodeDir(inDir: Path, stagingDir: Path,
      command: String = "nfdump"): Seq[DecodeResult] = {
    val stream = Files.list(inDir)
    try {
      val files = stream.iterator()
      val out = scala.collection.mutable.ArrayBuffer.empty[DecodeResult]
      while (files.hasNext) {
        val f = files.next()
        val name = f.getFileName.toString
        if (Files.isRegularFile(f) && name.startsWith("nfcapd.") &&
            !name.startsWith("nfcapd.current") &&
            !Files.exists(stagingDir.resolve(name + ".csv")))
          try out += decodeFile(f, stagingDir, command)
          catch {
            case e: Exception =>
              System.err.println(s"[nfdump-exec] skipping $name: ${e.getMessage}")
          }
      }
      out.toSeq
    } finally stream.close()
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
