package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One keyed query from the SURVEY.md §2 inventory: a Spark
  * implementation plus (when ANSI-SQL-expressible) the DuckDB oracle SQL
  * the driver hash-compares against. `oracle = None` → driver records a
  * rows-only check (SURVEY.md §2 legend).
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): Q =
    Q(fn, Some(sql.stripMargin.trim))
  def noOracle(fn: (SparkSession, String) => DataFrame): Q = Q(fn, None)
}
