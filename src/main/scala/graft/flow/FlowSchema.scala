package graft.flow

import org.apache.spark.sql.types._

/** Schemas for the nfdump CSV export and the ClickHouse-side `nflows`
  * row model the reference loads into.
  *
  * Reconstructed from the reference's documented pipeline
  * (`nfdump -r <file> -o csv` → column subset → parquet → ClickHouse
  * `nflows` MergeTree table; /root/reference/README.md stub, upstream
  * poorting/nfdump2clickhouse): kept columns are
  * ts te td sa da sp dp pr flg ipkt ibyt (+ opkt obyt ra) and a
  * constant per-watcher `flowsrc` tag.
  */
object FlowSchema {

  /** Full `nfdump -o csv` header (48 data columns; nfdump ≥1.6 layout). */
  val nfdumpCsvColumns: Seq[String] = Seq(
    "ts", "te", "td", "sa", "da", "sp", "dp", "pr", "flg", "fwd",
    "stos", "ipkt", "ibyt", "opkt", "obyt", "in", "out", "sas", "das",
    "smk", "dmk", "dtos", "dir", "nh", "nhb", "svln", "dvln", "ismc",
    "odmc", "idmc", "osmc", "mpls1", "mpls2", "mpls3", "mpls4",
    "mpls5", "mpls6", "mpls7", "mpls8", "mpls9", "mpls10", "cl", "sl",
    "al", "ra", "eng", "exid", "tr")

  /** Read-side CSV schema: everything the converter keeps is typed;
    * columns we drop are read as strings (and pruned before parse by
    * Catalyst column pruning, so typing them would be wasted work).
    */
  val nfdumpCsvSchema: StructType = StructType(nfdumpCsvColumns.map {
    case n @ ("ts" | "te")                   => StructField(n, TimestampType)
    case n @ "td"                            => StructField(n, DoubleType)
    case n @ ("sp" | "dp")                   => StructField(n, IntegerType)
    case n @ ("ipkt" | "ibyt" | "opkt" | "obyt") => StructField(n, LongType)
    case n                                   => StructField(n, StringType)
  })

  /** The `nflows` table shape (ClickHouse MergeTree analog). */
  val nflowsSchema: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("te", TimestampType),
    StructField("td", DoubleType),
    StructField("sa", StringType),
    StructField("da", StringType),
    StructField("sp", IntegerType),
    StructField("dp", IntegerType),
    StructField("pr", StringType),
    StructField("flg", StringType),
    StructField("ipkt", LongType),
    StructField("ibyt", LongType),
    StructField("ra", StringType),
    StructField("flowsrc", StringType)))

  val nflowsColumns: Seq[String] = nflowsSchema.fieldNames.toSeq
}
