package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink abstraction (SURVEY.md §2.1 JDBC sink row; reference
  * /root/reference/README.md:2,10 — "load it into SQL Server").
  *
  * [[ParquetSink]] is the file-lake path; [[JdbcSink]] is exercised
  * end-to-end against embedded Derby (on Spark's own classpath) by the
  * oracled `scan_jdbc` round-trip (graft.ops.Scans.scanJdbc).
  */
trait Sink {
  def write(df: DataFrame, table: String, mode: SaveMode): Unit
}

/** Parquet sink, optionally partitioned (README.md:8 "partitioning
  * data"). 100 TB: partition by a low-cardinality pruning key (date),
  * never by a high-cardinality one (small-files explosion). */
final class ParquetSink(baseDir: String, partitionCols: Seq[String] = Nil)
    extends Sink {
  override def write(df: DataFrame, table: String, mode: SaveMode): Unit = {
    val w = df.write.mode(mode)
    val p = if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
    p.parquet(s"$baseDir/$table")
  }
}

/** JDBC sink via Spark's built-in `jdbc` source. `batchsize` and
  * `numPartitions` bound parallel connections against the RDBMS —
  * "parallel processing" (README.md:8) has to be capped at what the
  * target server tolerates, not at Spark's parallelism. */
final class JdbcSink(
    url: String,
    user: String,
    password: String,
    batchSize: Int = 10000,
    numPartitions: Int = 8)
    extends Sink {

  def options(table: String): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "user" -> user,
    "password" -> password,
    "batchsize" -> batchSize.toString,
    "numPartitions" -> numPartitions.toString,
    "isolationLevel" -> "READ_COMMITTED")

  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.format("jdbc").options(options(table)).mode(mode).save()
}
