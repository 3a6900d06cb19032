package graft.flow

import org.apache.spark.sql.{DataFrame, SparkSession}

/** nfdump CSV source (SURVEY §2 A1).
  *
  * The reference shells out to `nfdump -r <file> -o csv` and parses the
  * result with pandas; here the CSV *is* the source format and Spark's
  * native CSV reader does the typed parse — schema declared up front
  * (no inference pass over 100 TB), malformed rows dropped, and
  * Catalyst prunes unused columns before parse (the CSV reader only
  * materializes fields the query needs).
  *
  * nfdump emits a trailing summary block (`Summary,flows,...`) after
  * the data rows; those rows fail the typed parse and are dropped by
  * DROPMALFORMED, matching the reference's `skipfooter` handling.
  */
object NfdumpCsv {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSS]")
      .schema(FlowSchema.nfdumpCsvSchema)
      .csv(path)
      // DROPMALFORMED only inspects columns the query materializes, so
      // a bare count() would keep summary rows; requiring the
      // timestamps forces their parse and pins row counts regardless
      // of downstream projection.
      .where(org.apache.spark.sql.functions.col("ts").isNotNull &&
             org.apache.spark.sql.functions.col("te").isNotNull)

  /** Streaming variant: same parse over a watched directory
    * (Structured Streaming file source = the watchdog observer).
    */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSS]")
      .option("maxFilesPerTrigger", "64")
      .schema(FlowSchema.nfdumpCsvSchema)
      .csv(dir)
      .where(org.apache.spark.sql.functions.col("ts").isNotNull &&
             org.apache.spark.sql.functions.col("te").isNotNull)
}
