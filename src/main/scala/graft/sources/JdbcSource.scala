package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source (SURVEY.md §2.1 "JDBC source"; reference
  * /root/reference/README.md:2,10 — "extract raw data from multiple
  * sources" including the RDBMS side of a PySpark + SQL Server
  * pipeline).
  *
  * Exercised END-TO-END against embedded Derby (which ships on Spark's
  * classpath for the Hive metastore) by the oracled `scan_jdbc` query
  * (graft.ops.Scans.scanJdbc): write via [[graft.sinks.JdbcSink]],
  * partitioned read back through this class, hash-matched against the
  * source table. Against a networked RDBMS only url/driver change.
  *
  * 100 TB note: a JDBC read is single-connection unless partitioned —
  * always set (partitionColumn, lowerBound, upperBound, numPartitions)
  * for a big table, or the whole extract funnels through one task. The
  * `pushDownPredicate` default lets Catalyst send WHERE clauses to the
  * server, so the incremental high-water-mark filter runs RDBMS-side.
  */
final class JdbcSource(
    url: String,
    user: String,
    password: String,
    fetchSize: Int = 10000) {

  def options(table: String): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "user" -> user,
    "password" -> password,
    "fetchsize" -> fetchSize.toString,
    "pushDownPredicate" -> "true")

  /** Partitioned parallel read: ranges of `partitionColumn` split across
    * `numPartitions` concurrent connections. */
  def partitionedOptions(
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): Map[String, String] =
    options(table) ++ Map(
      "partitionColumn" -> partitionColumn,
      "lowerBound" -> lowerBound.toString,
      "upperBound" -> upperBound.toString,
      "numPartitions" -> numPartitions.toString)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.format("jdbc").options(options(table)).load()

  def readPartitioned(
      spark: SparkSession,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .options(partitionedOptions(table, partitionColumn, lowerBound,
        upperBound, numPartitions))
      .load()
}
