package graft.sinks

import java.sql.{Connection, PreparedStatement, Timestamp}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Batched JDBC sink (SURVEY §2 A4) — the load step of the reference
  * (parquet → ClickHouse insert), generalized to any JDBC endpoint.
  *
  * Executor-side `foreachPartition` writers: one connection per
  * partition, `addBatch`/`executeBatch` every `batchSize` rows, with
  * bounded retry on transient failures. On a 1000-executor cluster
  * each task streams its partition straight into the warehouse — the
  * driver never sees data, so load throughput scales with executors
  * (bounded by `df.rdd.getNumPartitions` concurrent connections —
  * `coalesce` first if the endpoint can't take that many writers).
  *
  * The connection factory is a serializable thunk so specs can inject
  * an in-memory stub Connection (no ClickHouse driver ships in this
  * environment); production use passes
  * `() => DriverManager.getConnection(url, props)`.
  */
object JdbcBatchSink {

  def insertSql(table: String, schema: StructType): String = {
    val cols = schema.fieldNames.mkString(", ")
    val marks = schema.fieldNames.map(_ => "?").mkString(", ")
    s"INSERT INTO $table ($cols) VALUES ($marks)"
  }

  /** JDBC type for typed setNull — untyped `setObject(i, null)` is
    * optional in the JDBC spec and rejected by several drivers.
    */
  private def sqlType(dt: org.apache.spark.sql.types.DataType): Int = dt match {
    case IntegerType   => java.sql.Types.INTEGER
    case LongType      => java.sql.Types.BIGINT
    case DoubleType    => java.sql.Types.DOUBLE
    case FloatType     => java.sql.Types.FLOAT
    case StringType    => java.sql.Types.VARCHAR
    case BooleanType   => java.sql.Types.BOOLEAN
    case TimestampType => java.sql.Types.TIMESTAMP
    case _             => java.sql.Types.OTHER
  }

  private def bind(ps: PreparedStatement, schema: StructType, row: Row): Unit = {
    var i = 0
    while (i < schema.length) {
      val j = i + 1
      if (row.isNullAt(i)) {
        ps.setNull(j, sqlType(schema(i).dataType))
      } else schema(i).dataType match {
        case IntegerType   => ps.setInt(j, row.getInt(i))
        case LongType      => ps.setLong(j, row.getLong(i))
        case DoubleType    => ps.setDouble(j, row.getDouble(i))
        case FloatType     => ps.setFloat(j, row.getFloat(i))
        case StringType    => ps.setString(j, row.getString(i))
        case BooleanType   => ps.setBoolean(j, row.getBoolean(i))
        case TimestampType => ps.setTimestamp(j, row.getAs[Timestamp](i))
        case _             => ps.setObject(j, row.get(i))
      }
      i += 1
    }
  }

  def write(
      df: DataFrame,
      table: String,
      connect: () => Connection,
      batchSize: Int = 10000,
      maxRetries: Int = 3): Unit = {
    val schema = df.schema
    val sql = insertSql(table, schema)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val buf = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
        def flush(): Unit = if (buf.nonEmpty) {
          var attempt = 0
          var done = false
          while (!done) {
            // connect() is inside the retry scope: a transient
            // connection refusal must back off like a failed batch,
            // not kill the task outright.
            try {
              val conn = connect()
              try {
                val ps = conn.prepareStatement(sql)
                try {
                  buf.foreach { r => bind(ps, schema, r); ps.addBatch() }
                  ps.executeBatch()
                  done = true
                } finally ps.close()
              } finally conn.close()
            } catch {
              case e: java.sql.SQLException =>
                attempt += 1
                if (attempt > maxRetries) throw e
                Thread.sleep(100L << attempt)
            }
          }
          buf.clear()
        }
        rows.foreach { r =>
          buf += r
          if (buf.length >= batchSize) flush()
        }
        flush()
      }
    }
  }
}
