package graft.flow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The convert step (SURVEY §2 A2): nfdump CSV frame → `nflows` shape.
  *
  * Mirrors the reference's converter semantics: keep the nflows column
  * subset, recompute duration from the timestamps (the CSV `td` is
  * truncated to ms and the reference recomputes it), normalize the
  * protocol name, and stamp the per-watcher `flowsrc` tag.
  */
object FlowTransform {

  def toNflows(flows: DataFrame, flowsrc: String): DataFrame =
    flows
      .withColumn("td",
        (unix_micros(col("te")) - unix_micros(col("ts"))) / 1e6)
      .withColumn("pr", upper(trim(col("pr"))))
      .withColumn("flowsrc", lit(flowsrc))
      .select(FlowSchema.nflowsColumns.map(col): _*)

  /** Optional enrichment used by the analytics layer: numeric IPs for
    * range/CIDR work without reparsing strings per predicate.
    */
  def withNumericIps(nflows: DataFrame): DataFrame = {
    import graft.functions.IpFuncs._
    nflows
      .withColumn("sa_num", ip4_aton(col("sa")))
      .withColumn("da_num", ip4_aton(col("da")))
      .withColumn("sa_private", ip4_is_private(col("sa")))
  }
}
