package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Day-partitioned parquet sink + TTL retention (SURVEY §2 A3/A5).
  *
  * The Spark analog of the reference's ClickHouse MergeTree layout
  * (`PARTITION BY toDate(ts)` + `TTL ts + INTERVAL 90 DAY`): data
  * lands under `date=YYYY-MM-DD/` directories so time-range queries
  * partition-prune, and retention is a metadata-only partition drop —
  * no rewrite of surviving data, which is what makes TTL viable at
  * 100 TB.
  */
object PartitionedParquetSink {

  def write(df: DataFrame, tsCol: String, outDir: String): Unit =
    df.withColumn("date", to_date(col(tsCol)))
      .write
      .partitionBy("date")
      .mode("append")
      .parquet(outDir)

  /** Z-ordered write: range-partition then sort by the 2-D Morton key
    * ([[graft.functions.ZOrder2]]) so each output file covers a small
    * RECTANGLE of (x, y) space — parquet row-group min/max stats
    * become selective on BOTH columns, where a single-column sort
    * skips on that column only (the ClickHouse `ORDER BY (a, b)` /
    * Delta `OPTIMIZE ZORDER` analog). The range partitioner gives
    * files disjoint key ranges; the within-partition sort keeps row
    * groups tight. The key column is dropped before writing — the
    * skipping value lives in the x/y stats themselves.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numFiles: Int, outDir: String): Unit =
    df.withColumn("_zkey", graft.functions.StrFuncs.zorder2(
        col(xCol).cast("long"), col(yCol).cast("long"), bits))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(outDir)

  /** Compact small files inside each `date=` partition — the analog of
    * ClickHouse MergeTree's continuous part merges. A short-trigger
    * streaming sink writes one file per micro-batch per partition
    * forever; without periodic compaction the day-partition read path
    * drowns in file-open overhead at 100 TB.
    *
    * Partitions with at least `minFiles` data files are rewritten to
    * `ceil(bytes / targetBytes)` files. The rewrite goes to a temp dir
    * first, then swaps crash-safely: the live partition is renamed
    * aside to `.compact_old_<name>` BEFORE the tmp dir is renamed into
    * place, so every crash point leaves the data either live or under
    * a recoverable backup — never deleted with the replacement unlinked.
    * `recoverStale` sweeps interrupted swaps on startup. (A table
    * format's atomic commit replaces this on a production lake.)
    * Returns (partition, filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, outDir: String,
      minFiles: Int = 8, targetBytes: Long = 128L * 1024 * 1024): Seq[(String, Int, Int)] = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .flatMap { part =>
        val dataFiles = fs.listStatus(part.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        if (dataFiles.length < minFiles) None
        else {
          val totalBytes = dataFiles.map(_.getLen).sum
          val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
          if (nOut >= dataFiles.length) None
          else {
            val tmp = new Path(root, s".compact_tmp_${part.getPath.getName}")
            spark.read.parquet(part.getPath.toString)
              .coalesce(nOut)
              .write.mode("overwrite").parquet(tmp.toString)
            // drop the _SUCCESS marker so the partition holds data files only
            fs.delete(new Path(tmp, "_SUCCESS"), false)
            // Hadoop FileSystem reports most failures by RETURNING
            // false, not throwing — a silently failed swap would lose
            // the partition (data left under a dot-dir Spark ignores).
            // Crash-safe order: park the live dir aside, promote the
            // rewrite, then drop the backup. A crash between any two
            // steps leaves either the old or the new copy reachable by
            // recoverStale; at no point is the only copy scheduled for
            // deletion.
            // Every FS call's boolean result is checked: Hadoop
            // FileSystem reports most failures by RETURNING false, and
            // an unchecked rename can NEST src inside an
            // unexpectedly-existing dst instead of replacing it.
            val backup = new Path(root, s".compact_old_${part.getPath.getName}")
            if (fs.exists(backup) && !fs.delete(backup, true))
              throw new java.io.IOException(
                s"compact: stale backup $backup could not be removed; " +
                  s"partition untouched, rewrite is at $tmp")
            if (!fs.rename(part.getPath, backup))
              throw new java.io.IOException(
                s"compact: failed to park ${part.getPath} at $backup; partition untouched, rewrite is at $tmp")
            if (!fs.rename(tmp, part.getPath)) {
              val restored = fs.rename(backup, part.getPath)
              throw new java.io.IOException(
                if (restored)
                  s"compact: failed to rename $tmp to ${part.getPath}; original partition restored"
                else
                  s"compact: failed to promote $tmp AND failed to restore $backup — " +
                    s"partition data is intact under $backup; run recoverStale")
            }
            if (!fs.delete(backup, true))
              throw new java.io.IOException(
                s"compact: swap succeeded but backup $backup not deleted; safe to remove manually")
            val after = fs.listStatus(part.getPath)
              .count(f => f.isFile && !f.getPath.getName.startsWith("_"))
            Some((part.getPath.getName, dataFiles.length, after))
          }
        }
      }
  }

  /** Startup sweep after an interrupted `compact` swap. For each stale
    * `.compact_old_<part>` backup: if the live partition dir is missing
    * (crash happened between parking the original and promoting the
    * rewrite) the backup is restored; if the live dir exists the swap
    * completed and the backup is dropped. Orphaned `.compact_tmp_*`
    * dirs are always dropped — they are either pre-swap rewrites
    * (recomputable) or already-promoted copies. Returns
    * (staleDirName, "restored" | "dropped") per dir handled.
    */
  def recoverStale(spark: SparkSession, outDir: String): Seq[(String, String)] = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath).flatMap { p =>
      val n = p.getName
      if (n.startsWith(".compact_old_")) {
        val live = new Path(root, n.stripPrefix(".compact_old_"))
        if (!fs.exists(live)) {
          if (!fs.rename(p, live))
            throw new java.io.IOException(s"recoverStale: failed to restore $p to $live")
          Some(n -> "restored")
        } else {
          fs.delete(p, true)
          Some(n -> "dropped")
        }
      } else if (n.startsWith(".compact_tmp_")) {
        fs.delete(p, true)
        Some(n -> "dropped")
      } else None
    }
  }

  /** Drop `date=` partitions strictly older than `cutoff` (YYYY-MM-DD).
    * Purely filesystem-level, mirroring ClickHouse's TTL partition
    * drops; returns the dropped partition names.
    */
  def expireOlderThan(spark: SparkSession, outDir: String, cutoff: String): Seq[String] = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val dropped = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("date=") && n.stripPrefix("date=") < cutoff
      }
    dropped.foreach(fs.delete(_, true))
    dropped.map(_.getName)
  }
}
