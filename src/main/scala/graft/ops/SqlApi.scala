package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Q, Tables}
import graft.core.Determinism._
import graft.core.{OracleDsl => O}

/** The `spark.sql(...)` entry surface (SURVEY.md §1.3 API mapping): the
  * same engine is reachable through registered temp views + ANSI SQL —
  * Catalyst produces the identical plan as the DataFrame spelling, so
  * everything PlanSpec pins (pushdown, broadcast, partial aggregation)
  * holds here too. Query shape: TPC-H Q3 (shipping priority).
  */
object SqlApi {

  def sqlTpchQ3(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem").foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(s"graft_$n")
    }
    ordered(spark.sql(
      s"""SELECT l_orderkey,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE)
         |    AS revenue,
         |  date_format(o_orderdate, 'yyyy-MM-dd') AS o_date,
         |  o_orderpriority
         |FROM graft_customer
         |JOIN graft_orders ON c_custkey = o_custkey
         |JOIN graft_lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin))
  }

  private val sqlTpchQ3Sql =
    s"""SELECT l_orderkey,
       |  CAST(SUM(${O.revenue}) AS DOUBLE) AS revenue,
       |  strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       |  o_orderpriority
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |${O.OrderAll}"""

  val queries: Map[String, Q] = Map(
    "sql_tpch_q3" -> Q(sqlTpchQ3 _, sqlTpchQ3Sql)
  )
}
