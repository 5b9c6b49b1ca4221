package graft.core

/** String-building helpers for the DuckDB oracle SQL, mirroring
  * [[Determinism]]'s Spark-side decimal conventions exactly. Any change
  * here must change both sides or hashes drift.
  */
object OracleDsl {
  /** Raw money column → exact decimal. */
  def dec(c: String): String = s"CAST($c AS DECIMAL(12,2))"

  /** Order-independent exact sum of a raw money column, as double. */
  def dsum(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(12,2))) AS DOUBLE)"

  def davg(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT($c) AS DOUBLE)"

  def oneMinus(c: String): String =
    s"CAST(1 - CAST($c AS DECIMAL(4,2)) AS DECIMAL(4,2))"

  def onePlus(c: String): String =
    s"CAST(1 + CAST($c AS DECIMAL(4,2)) AS DECIMAL(4,2))"

  /** lineitem net revenue, exact decimal. */
  val revenue: String = s"${dec("l_extendedprice")} * ${oneMinus("l_discount")}"

  val OrderAll: String = "ORDER BY ALL NULLS FIRST"
}
