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

  /** Idempotent keyed upsert — the load semantics a production RDBMS
    * target actually wants (reference README.md:10 "load it into SQL
    * Server"): re-running the same batch must not duplicate rows the
    * way append does, and must not lose unrelated rows the way
    * overwrite does.
    *
    * Shape: stage-table + server-side MERGE. The batch lands in a
    * staging table through the normal parallel batched-insert path
    * (executors never do per-row upserts — that serializes on row
    * locks), then ONE set-based `MERGE INTO target USING stage` runs
    * in a single driver-side transaction: matched keys update,
    * unmatched insert, and a failure rolls back to the pre-batch
    * state. This is the documented Spark→SQL-Server/Synapse upsert
    * pattern; Derby (≥10.11) speaks the same ANSI MERGE.
    *
    * Identifiers are double-quoted to match Spark's JDBC writer, which
    * creates case-sensitive quoted column names.
    */
  def upsert(df: DataFrame, table: String, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val staging = table + "_stage"
    write(df, staging, SaveMode.Overwrite)
    def q(s: String) = "\"" + s + "\""
    val cols = df.columns.toSeq
    val nonKey = cols.filterNot(keyCols.contains)
    val merge =
      s"""MERGE INTO $table t USING $staging s
         |ON ${keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")}
         |WHEN MATCHED THEN UPDATE SET
         |  ${nonKey.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")}
         |WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})
         |VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})""".stripMargin
    val conn = java.sql.DriverManager.getConnection(url, user, password)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try { st.executeUpdate(merge); conn.commit() }
      finally st.close()
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: Throwable => () }
        throw e
    } finally conn.close()
  }
}
