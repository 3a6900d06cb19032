package graft

import java.nio.file.{Files, Paths}
import graft.flow.{FlowSchema, FlowTransform, NfdumpCsv, NfdumpExec}

/** A1/A2: nfdump CSV parse + nflows transform on inline fixtures. */
class FlowIngestSpec extends SparkSpecBase {

  /** Build a full 48-column nfdump CSV row from a sparse field map. */
  def csvRow(fields: Map[String, String]): String =
    FlowSchema.nfdumpCsvColumns.map(c => fields.getOrElse(c, "0")).mkString(",")

  def writeFixture(dir: String, name: String, rows: Seq[Map[String, String]],
      withSummary: Boolean = true): Unit = {
    val header = FlowSchema.nfdumpCsvColumns.mkString(",")
    val body = rows.map(csvRow)
    // nfdump -o csv appends a summary block with a different column
    // count; the typed reader must drop it, not fail on it.
    val summary = if (withSummary)
      Seq("Summary", "flows,bytes,packets", "2,2048,30") else Seq.empty
    Files.write(Paths.get(dir, name),
      String.join("\n", (header +: body) ++ summary: _*).getBytes)
  }

  val flowA = Map(
    "ts" -> "2024-05-01 10:00:00.250", "te" -> "2024-05-01 10:00:02.750",
    "td" -> "2.500", "sa" -> "192.168.1.10", "da" -> "10.0.0.5",
    "sp" -> "52000", "dp" -> "443", "pr" -> "tcp", "flg" -> ".AP.SF",
    "ipkt" -> "10", "ibyt" -> "1024", "ra" -> "172.16.0.1")
  val flowB = Map(
    "ts" -> "2024-05-02 11:30:00", "te" -> "2024-05-02 11:30:10",
    "td" -> "10.000", "sa" -> "10.1.2.3", "da" -> "8.8.8.8",
    "sp" -> "123", "dp" -> "123", "pr" -> "udp", "flg" -> "......",
    "ipkt" -> "2", "ibyt" -> "160", "ra" -> "172.16.0.1")

  test("typed parse keeps data rows, drops the summary block") {
    val dir = tmpDir("nfcsv")
    writeFixture(dir, "nfcapd.202405011000.csv", Seq(flowA, flowB))
    val df = NfdumpCsv.read(spark, dir)
    assert(df.count() === 2)
    val row = df.orderBy("ts").collect()(0)
    assert(row.getAs[Int]("dp") === 443)
    assert(row.getAs[Long]("ibyt") === 1024L)
    assert(row.getAs[java.sql.Timestamp]("ts").toInstant.toString
      === "2024-05-01T10:00:00.250Z")
  }

  test("quarantine read splits good rows from bad, keeping the raw line") {
    val dir = tmpDir("nfq")
    writeFixture(dir, "nfcapd.csv", Seq(flowA, flowB))
    // append a genuinely corrupt data row (garbage timestamp, right
    // column count) — the case DROPMALFORMED would silently vanish
    val badLine = csvRow(flowA + ("ts" -> "not-a-timestamp", "sa" -> "badrow"))
    val p = Paths.get(dir, "nfcapd.csv")
    Files.write(p, (new String(Files.readAllBytes(p)) + "\n" + badLine).getBytes)
    val (good, quarantined) = NfdumpCsv.readWithQuarantine(spark, dir)
    assert(good.count() === 2)
    assert(good.columns.toSeq === FlowSchema.nfdumpCsvSchema.fieldNames.toSeq)
    val q = quarantined.collect().map(_.getString(0))
    // summary block rows + the corrupt data row, original text intact
    assert(q.exists(l => l != null && l.contains("not-a-timestamp")),
      s"corrupt row not quarantined: ${q.toSeq}")
    assert(q.exists(l => l != null && l.startsWith("Summary")))
    // nothing lost: every input line is either parsed or quarantined
    val n = Files.readAllLines(p).size() - 1 // header
    assert(good.count() + quarantined.count() === n)
  }

  test("toNflows recomputes td, stamps flowsrc, normalizes pr") {
    val dir = tmpDir("nfcsv")
    writeFixture(dir, "nfcapd.csv", Seq(flowA, flowB))
    val out = FlowTransform.toNflows(NfdumpCsv.read(spark, dir), "edge-router")
    assert(out.columns.toSeq === FlowSchema.nflowsColumns)
    val rows = out.orderBy("ts").collect()
    assert(rows(0).getAs[Double]("td") === 2.5)
    assert(rows(1).getAs[Double]("td") === 10.0)
    assert(rows.forall(_.getAs[String]("flowsrc") == "edge-router"))
    assert(rows(0).getAs[String]("pr") === "TCP")
  }

  /** Stub `nfdump` executable: `nfdump -r <file> -o csv` → cats the
    * file (the fixture "nfcapd" files hold the CSV the real binary
    * would decode).
    */
  private def stubNfdump(dir: String, body: String): String = {
    val p = Paths.get(dir, "nfdump-stub")
    Files.write(p, s"#!/bin/sh\n$body\n".getBytes)
    p.toFile.setExecutable(true)
    p.toString
  }

  test("nfdump exec wrapper decodes, stages atomically, is idempotent") {
    val in = tmpDir("nfcapd_in"); val staging = tmpDir("nfcapd_out")
    writeFixture(in, "nfcapd.202405011000", Seq(flowA))
    writeFixture(in, "nfcapd.202405011005", Seq(flowB))
    // the live capture and the stub binary must be SKIPPED by the sweep
    writeFixture(in, "nfcapd.current.1234", Seq(flowA))
    val stub = stubNfdump(in, """cat "$2"""")
    val r1 = NfdumpExec.decodeDir(Paths.get(in), Paths.get(staging), stub)
    assert(r1.map(_.staged.getFileName.toString).sorted === Seq(
      "nfcapd.202405011000.csv", "nfcapd.202405011005.csv"))
    assert(r1.forall(d => Files.exists(d.staged)))
    val df = NfdumpCsv.read(spark, staging + "/*.csv")
    assert(df.count() === 2) // summary rows dropped by the typed parse
    // idempotent: nothing new to decode on the next watcher tick
    assert(NfdumpExec.decodeDir(Paths.get(in), Paths.get(staging), stub).isEmpty)
    // no in-progress residue
    assert(Files.list(Paths.get(staging, ".inprogress")).count() === 0)
  }

  test("nfdump sweep isolates per-file failures and retries next tick") {
    val in = tmpDir("nfcapd_in"); val staging = tmpDir("nfcapd_out")
    writeFixture(in, "nfcapd.bad", Seq(flowA))
    writeFixture(in, "nfcapd.good", Seq(flowB))
    // stub fails only for the 'bad' capture
    val stub = stubNfdump(in,
      """case "$2" in *bad*) echo corrupt >&2; exit 3;; *) cat "$2";; esac""")
    val r1 = NfdumpExec.decodeDir(Paths.get(in), Paths.get(staging), stub)
    assert(r1.map(_.staged.getFileName.toString) === Seq("nfcapd.good.csv"))
    assert(!Files.exists(Paths.get(staging, "nfcapd.bad.csv")))
    // the failed file is retried on the next tick (still not staged)
    val r2 = NfdumpExec.decodeDir(Paths.get(in), Paths.get(staging), stub)
    assert(r2.isEmpty) // good already staged; bad failed again, isolated
  }

  test("distributed nfcapd decode sweeps a backlog across executor partitions") {
    val in = tmpDir("nfcapd_in"); val staging = tmpDir("nfcapd_out")
    for (i <- 0 until 6) writeFixture(in, s"nfcapd.2024050110$i", Seq(flowA))
    writeFixture(in, "nfcapd.current.99", Seq(flowA)) // live capture skipped
    val stub = stubNfdump(in, """case "$2" in *1103*) echo corrupt >&2; exit 3;; *) cat "$2";; esac""")
    val r = NfdumpExec.decodeDirDistributed(spark,
      Paths.get(in), Paths.get(staging), stub, parallelism = 3)
    // 6 closed files minus the one the stub fails on; failure isolated
    assert(r.map(_.staged.getFileName.toString) ===
      Seq(0, 1, 2, 4, 5).map(i => s"nfcapd.2024050110$i.csv"))
    assert(r.forall(d => Files.exists(d.staged)))
    assert(!Files.exists(Paths.get(staging, "nfcapd.20240501103.csv")))
    // idempotent: staged files are skipped, the failed one retried (and
    // fails again — still isolated, still unstaged)
    assert(NfdumpExec.decodeDirDistributed(spark,
      Paths.get(in), Paths.get(staging), stub, parallelism = 3).isEmpty)
    // no in-progress residue from executor-side decodes
    assert(Files.list(Paths.get(staging, ".inprogress")).count() === 0)
  }

  test("nfdump exec failure publishes nothing and surfaces stderr") {
    val in = tmpDir("nfcapd_in"); val staging = tmpDir("nfcapd_out")
    writeFixture(in, "nfcapd.202405011000", Seq(flowA))
    val stub = stubNfdump(in, "echo 'corrupt data file' >&2; exit 3")
    val e = intercept[RuntimeException] {
      NfdumpExec.decodeFile(Paths.get(in, "nfcapd.202405011000"),
        Paths.get(staging), stub)
    }
    assert(e.getMessage.contains("exited 3") && e.getMessage.contains("corrupt data file"))
    assert(!Files.exists(Paths.get(staging, "nfcapd.202405011000.csv")))
    assert(Files.list(Paths.get(staging, ".inprogress")).count() === 0)
  }

  test("empty typed fields become nulls without dropping the row") {
    val dir = tmpDir("nfcsv")
    // ts/te present (required); a NUMERIC field left genuinely empty is
    // the real sparse-CSV risk under DROPMALFORMED — the row must
    // survive with a typed null, not be dropped as malformed
    writeFixture(dir, "nfcapd.csv",
      Seq(flowA + ("ipkt" -> "") + ("ra" -> "")), withSummary = false)
    val df = NfdumpCsv.read(spark, dir).select("ts", "ipkt", "ibyt", "ra")
    val rows = df.collect()
    assert(rows.length === 1, "row with empty numeric field was dropped")
    assert(rows(0).isNullAt(rows(0).fieldIndex("ipkt")), "empty long must read as null")
    assert(rows(0).isNullAt(rows(0).fieldIndex("ra")), "empty string must read as null")
    assert(rows(0).getAs[Long]("ibyt") === 1024L) // populated fields intact
  }

  test("numeric-IP enrichment matches dotted-quad arithmetic") {
    val dir = tmpDir("nfcsv")
    writeFixture(dir, "nfcapd.csv", Seq(flowA))
    val out = FlowTransform.withNumericIps(
      FlowTransform.toNflows(NfdumpCsv.read(spark, dir), "x")).collect()(0)
    assert(out.getAs[Long]("sa_num") ===
      (192L << 24) + (168L << 16) + (1L << 8) + 10L)
    assert(out.getAs[Boolean]("sa_private"))
  }
}
