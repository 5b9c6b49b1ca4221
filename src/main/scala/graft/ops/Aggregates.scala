package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Determinism, Q, Tables}
import graft.core.Determinism._

/** SURVEY.md §2.4 — aggregations.
  *
  * Reference evidence: transformation + analysis claims in
  * /root/reference/README.md:2,10; approx/vector aggregates are
  * north-star additions (BASELINE.json).
  *
  * 100 TB notes: all groupBys here run as partial (map-side) + final
  * HashAggregate — the shuffle carries one row per (partition × group),
  * not per input row. Group cardinalities are tiny (flags, segments,
  * brands), so the exchange is negligible at any scale. The exact
  * `countDistinct` is the one op whose shuffle grows with data
  * (distinct values must co-locate); `agg_approx_distinct` (HLL) is the
  * constant-memory 100 TB counterpart and should be preferred there.
  */
object Aggregates {

  private def li(s: SparkSession, d: String) = Tables.load(s, d, "lineitem")

  /** TPC-H Q1-shaped pricing summary — also the flagship `entry`. */
  def aggHash(spark: SparkSession, dir: String): DataFrame =
    ordered(
      li(spark, dir)
        .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumExpr(money(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .as("sum_disc_price"),
          dsumExpr(money(col("l_extendedprice")) * oneMinus(col("l_discount"))
            * onePlus(col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")))

  private val aggHashSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY ALL NULLS FIRST"""

  val queries: Map[String, Q] = Map(
    "agg_hash" -> Q(aggHash _, aggHashSql)
  )
}
