package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Q, Tables}
import graft.core.Determinism._
import graft.core.{OracleDsl => O}

/** Round 8: the eleven adapted TPC-H queries SqlApi.scala lacked —
  * Q1, Q6, Q7, Q8, Q9, Q10, Q11, Q15, Q17, Q20, Q22 — completing the
  * full 22-query suite (the other eleven live in `SqlApi`). Adaptations
  * to the synthetic schema (no partsupp table — lineitem is the
  * part↔supplier association; no phone column — nationkey buckets play
  * country codes) are noted per query. Reference provenance: the
  * reference delegates all analytics to the warehouse it loads
  * (`/root/reference/README.md:10` — "load it into SQL Server for
  * querying and analysis"); TPC-H is the public gold standard for that
  * query surface, so the suite is the honest expansion of the declared
  * capability, and each member here exercises one optimizer behavior no
  * other inventory key covers.
  *
  * Determinism discipline throughout (see [[graft.core.Determinism]]):
  * money stays exact DECIMAL through every aggregate with ONE final
  * double cast; derived years are BIGINT on both engines; every result
  * ends in a total ORDER BY.
  */
object TpchSuite {

  private def views(spark: SparkSession, dir: String, ts: String*): Unit =
    ts.foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(s"graft_$n")
    }

  /** TPC-H Q1 (pricing summary report) — the SQL spelling of the
    * flagship scan→filter→hash-agg shape (`agg_hash` is the DataFrame
    * twin with a reduced aggregate list; this is the FULL eight-column
    * Q1 aggregate set incl. the three-decimal-product charge). One scan,
    * map-side partial aggregation into 6 groups; the date cutoff is the
    * only predicate and reaches the parquet scan. At 100 TB this is the
    * canonical "one pass over the fact table" report: the shuffle
    * carries one row per (returnflag, linestatus) per mapper. */
  def sqlTpchQ1(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "lineitem")
    ordered(spark.sql(
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         |    AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
         |    AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
         |    * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2)))
         |    AS DOUBLE) AS sum_charge,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS avg_price,
         |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM graft_lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin))
  }

  private val sqlTpchQ1Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${O.dsum("l_quantity")} AS sum_qty,
       |  ${O.dsum("l_extendedprice")} AS sum_base_price,
       |  ${O.dsumExpr(O.revenue)} AS sum_disc_price,
       |  ${O.dsumExpr(s"${O.revenue} * ${O.onePlus("l_tax")}")}
       |    AS sum_charge,
       |  ${O.dsum("l_quantity")} / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       |  ${O.dsum("l_extendedprice")} / CAST(COUNT(*) AS DOUBLE) AS avg_price,
       |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |${O.OrderAll}"""

  /** TPC-H Q6 (forecasting revenue change) — the PUSHDOWN-ONLY query:
    * no join, no group key; all three predicates (date band, discount
    * band, quantity cap) are scan-pushable and the projection needs two
    * columns, so a correct plan reads a 2-column schema with every
    * filter in PushedFilters and ships ONE partial-agg row per mapper.
    * At 100 TB this is the query where scan efficiency IS the query —
    * pinned in PlanSpec (ReadSchema + pushed date filter). The discount
    * band compares in exact DECIMAL(4,2) so both engines band
    * identically (raw double 0.05/0.07 literals are not exact). */
  def sqlTpchQ6(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "lineitem")
    ordered(spark.sql(
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_lines
         |FROM graft_lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin))
  }

  private val sqlTpchQ6Sql =
    s"""SELECT ${O.dsumExpr(
         s"${O.dec("l_extendedprice")} * CAST(l_discount AS DECIMAL(4,2))")}
       |    AS revenue,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24
       |${O.OrderAll}"""

  /** TPC-H Q7 (volume shipping), adapted: supplier/customer REGIONS
    * play the two trading nations (the synthetic corpus assigns the 10
    * sf0.001 suppliers arbitrary nations, so specific nation pairs can
    * be empty at small SFs; regions are always populated). The operator
    * of interest: a SYMMETRIC DISJUNCTIVE predicate across the two dim
    * chains — (supp=ASIA ∧ cust=EUROPE) ∨ (supp=EUROPE ∧ cust=ASIA)
    * cannot push to either scan alone (each disjunct constrains both
    * sides), but Catalyst derives the IN-superset filter for each side
    * (r_name ∈ {ASIA, EUROPE} prunes both region scans) and evaluates
    * the cross-side disjunction after the broadcast joins; plus a
    * derived-column (year) group key. 100 TB: all four dim hops
    * broadcast; the fact shuffles once, for the aggregate. */
  def sqlTpchQ7(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "supplier", "lineitem", "orders", "customer",
      "nation", "region")
    ordered(spark.sql(
      s"""SELECT supp_region, cust_region, l_year,
         |  CAST(SUM(volume) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_lines
         |FROM (
         |  SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
         |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |    CAST(l_extendedprice AS DECIMAL(12,2))
         |      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
         |      AS volume
         |  FROM graft_supplier
         |  JOIN graft_lineitem ON s_suppkey = l_suppkey
         |  JOIN graft_orders ON o_orderkey = l_orderkey
         |  JOIN graft_customer ON c_custkey = o_custkey
         |  JOIN graft_nation sn ON s_nationkey = sn.n_nationkey
         |  JOIN graft_region sr ON sn.n_regionkey = sr.r_regionkey
         |  JOIN graft_nation cn ON c_nationkey = cn.n_nationkey
         |  JOIN graft_region cr ON cn.n_regionkey = cr.r_regionkey
         |  WHERE ((sr.r_name = 'ASIA' AND cr.r_name = 'EUROPE')
         |      OR (sr.r_name = 'EUROPE' AND cr.r_name = 'ASIA'))
         |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |) shipping
         |GROUP BY supp_region, cust_region, l_year""".stripMargin))
  }

  private val sqlTpchQ7Sql =
    s"""SELECT supp_region, cust_region, l_year,
       |  ${O.dsumExpr("volume")} AS revenue,
       |  COUNT(*) AS n_lines
       |FROM (
       |  SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
       |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |    ${O.revenue} AS volume
       |  FROM supplier
       |  JOIN lineitem ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |  JOIN region sr ON sn.n_regionkey = sr.r_regionkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region cr ON cn.n_regionkey = cr.r_regionkey
       |  WHERE ((sr.r_name = 'ASIA' AND cr.r_name = 'EUROPE')
       |      OR (sr.r_name = 'EUROPE' AND cr.r_name = 'ASIA'))
       |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |) shipping
       |GROUP BY supp_region, cust_region, l_year
       |${O.OrderAll}"""

  /** TPC-H Q8 (national market share), adapted (regions play nations,
    * p_type = 'PROMO' plays the part-type filter): EUROPE suppliers'
    * share of PROMO-part revenue delivered to ASIA customers, per order
    * year. The shape Q14 lacks: the ratio-of-conditional-sums is
    * PER GROUP (one ratio per year), so both the numerator CASE-sum and
    * the denominator ride the same grouped aggregate — one pass, one
    * shuffle of one row per (mapper × year). Decimals stay exact until
    * the final per-group double division (identical on both engines). */
  def sqlTpchQ8(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "part", "supplier", "lineitem", "orders", "customer",
      "nation", "region")
    ordered(spark.sql(
      s"""SELECT o_year,
         |  CAST(SUM(CASE WHEN supp_region = 'EUROPE' THEN volume
         |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
         |  COUNT(*) AS n_lines
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    CAST(l_extendedprice AS DECIMAL(12,2))
         |      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
         |      AS volume,
         |    sr.r_name AS supp_region
         |  FROM graft_part
         |  JOIN graft_lineitem ON p_partkey = l_partkey
         |  JOIN graft_supplier ON s_suppkey = l_suppkey
         |  JOIN graft_orders ON l_orderkey = o_orderkey
         |  JOIN graft_customer ON o_custkey = c_custkey
         |  JOIN graft_nation cn ON c_nationkey = cn.n_nationkey
         |  JOIN graft_region cr ON cn.n_regionkey = cr.r_regionkey
         |  JOIN graft_nation sn ON s_nationkey = sn.n_nationkey
         |  JOIN graft_region sr ON sn.n_regionkey = sr.r_regionkey
         |  WHERE cr.r_name = 'ASIA' AND p_type = 'PROMO'
         |) all_nations
         |GROUP BY o_year""".stripMargin))
  }

  private val sqlTpchQ8Sql =
    s"""SELECT o_year,
       |  ${O.dsumExpr(
         "CASE WHEN supp_region = 'EUROPE' THEN volume " +
           "ELSE CAST(0 AS DECIMAL(12,2)) END")}
       |    / ${O.dsumExpr("volume")} AS mkt_share,
       |  COUNT(*) AS n_lines
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    ${O.revenue} AS volume,
       |    sr.r_name AS supp_region
       |  FROM part
       |  JOIN lineitem ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region cr ON cn.n_regionkey = cr.r_regionkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |  JOIN region sr ON sn.n_regionkey = sr.r_regionkey
       |  WHERE cr.r_name = 'ASIA' AND p_type = 'PROMO'
       |) all_nations
       |GROUP BY o_year
       |${O.OrderAll}"""

  /** TPC-H Q9 (product type profit), adapted: no partsupp, so supply
    * cost = 10% of the part's retail price per unit (a fixed declared
    * cost model — exact decimal arithmetic both engines replay);
    * profit = net revenue − cost·quantity, grouped by supplier nation ×
    * order year. Exercises: LIKE-filter pushdown on the dim scan
    * (p_name LIKE '%gear%' prunes parts before the join), a 5-table
    * join with MIXED-SIDE decimal arithmetic (fact price × dim cost in
    * one expression), and a two-derived-key aggregate. The decimal
    * difference stays exact through SUM — one double cast at the end. */
  def sqlTpchQ9(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "part", "supplier", "lineitem", "orders", "nation")
    ordered(spark.sql(
      s"""SELECT nation, o_year,
         |  CAST(SUM(amount) AS DOUBLE) AS sum_profit,
         |  COUNT(*) AS n_lines
         |FROM (
         |  SELECT n_name AS nation,
         |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    CAST(l_extendedprice AS DECIMAL(12,2))
         |      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
         |    - CAST(p_retailprice AS DECIMAL(12,2))
         |      * CAST(l_quantity AS DECIMAL(12,2))
         |      * CAST(0.10 AS DECIMAL(4,2)) AS amount
         |  FROM graft_part
         |  JOIN graft_lineitem ON p_partkey = l_partkey
         |  JOIN graft_supplier ON s_suppkey = l_suppkey
         |  JOIN graft_orders ON o_orderkey = l_orderkey
         |  JOIN graft_nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%gear%'
         |) profit
         |GROUP BY nation, o_year""".stripMargin))
  }

  private val sqlTpchQ9Sql =
    s"""SELECT nation, o_year,
       |  ${O.dsumExpr("amount")} AS sum_profit,
       |  COUNT(*) AS n_lines
       |FROM (
       |  SELECT n_name AS nation,
       |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    ${O.revenue}
       |    - CAST(p_retailprice AS DECIMAL(12,2))
       |      * CAST(l_quantity AS DECIMAL(12,2))
       |      * CAST(0.10 AS DECIMAL(4,2)) AS amount
       |  FROM part
       |  JOIN lineitem ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE p_name LIKE '%gear%'
       |) profit
       |GROUP BY nation, o_year
       |${O.OrderAll}"""

  /** TPC-H Q10 (returned item reporting): top-20 customers by revenue
    * lost to returns in one quarter. The shape no other key pins:
    * GLOBAL TOP-K OVER AN AGGREGATE — orderBy+limit above a groupBy
    * plans TakeOrderedAndProject over the final HashAggregate (per-
    * partition 20-row heaps, a 20-row driver merge; never a global
    * sort of all customers — at 100 TB the difference between a 20-row
    * network transfer and a full range-partitioned sort). Deterministic
    * under ties: exact-decimal revenue DESC then custkey ASC totals
    * the order before LIMIT on both engines. */
  def sqlTpchQ10(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "customer", "orders", "lineitem", "nation")
    ordered(spark.sql(
      s"""SELECT c_custkey, c_name,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
         |    AS DOUBLE) AS revenue,
         |  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
         |  n_name, c_mktsegment
         |FROM graft_customer
         |JOIN graft_orders ON c_custkey = o_custkey
         |JOIN graft_lineitem ON l_orderkey = o_orderkey
         |JOIN graft_nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin))
  }

  private val sqlTpchQ10Sql =
    s"""SELECT * FROM (
       |  SELECT c_custkey, c_name,
       |    ${O.dsumExpr(O.revenue)} AS revenue,
       |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
       |    n_name, c_mktsegment
       |  FROM customer
       |  JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |    AND l_returnflag = 'R'
       |  GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
       |  ORDER BY revenue DESC, c_custkey
       |  LIMIT 20) top20
       |${O.OrderAll}"""

  /** TPC-H Q11 (important stock), adapted: lineitem value per part
    * plays partsupp stock value. The operator of interest is a SCALAR
    * SUBQUERY IN THE GROUP FILTER — parts whose total value exceeds
    * 1.1× the all-parts mean share. Catalyst computes the global
    * aggregate ONCE (subquery result broadcast as a literal into the
    * filter), so the plan is two aggregates over the same scan + a
    * filter — never a per-group re-scan. At 100 TB both aggregates are
    * map-side-combined single shuffles; the second input is one row
    * per part. Value stays exact decimal; the threshold compare is one
    * double multiply on each engine. */
  def sqlTpchQ11(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "lineitem")
    ordered(spark.sql(
      s"""WITH pv AS (
         |  SELECT l_partkey,
         |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS v
         |  FROM graft_lineitem
         |  GROUP BY l_partkey)
         |SELECT l_partkey, CAST(v AS DOUBLE) AS value
         |FROM pv
         |WHERE CAST(v AS DOUBLE) > 1.1 * (
         |  SELECT CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |  FROM pv)""".stripMargin))
  }

  private val sqlTpchQ11Sql =
    s"""WITH pv AS (
       |  SELECT l_partkey,
       |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS v
       |  FROM lineitem
       |  GROUP BY l_partkey)
       |SELECT l_partkey, CAST(v AS DOUBLE) AS value
       |FROM pv
       |WHERE CAST(v AS DOUBLE) > 1.1 * (
       |  SELECT CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       |  FROM pv)
       |${O.OrderAll}"""

  /** TPC-H Q15 (top supplier): quarterly revenue per supplier, keep the
    * supplier(s) whose revenue EQUALS the maximum — the view-reused-
    * twice shape (the revenue CTE feeds both the join and the MAX
    * scalar subquery). Revenue stays exact DECIMAL end-to-end so the
    * equality against MAX is bit-exact on both engines (the double
    * spelling of this query is a correctness bug: two engines can
    * round the max differently and keep different suppliers). Catalyst
    * evaluates the MAX subquery once and broadcasts the literal. */
  def sqlTpchQ15(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "supplier", "lineitem")
    ordered(spark.sql(
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
         |      AS total_rev
         |  FROM graft_lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
         |FROM graft_supplier
         |JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)""".stripMargin))
  }

  private val sqlTpchQ15Sql =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    SUM(${O.revenue}) AS total_rev
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, ${O.dbl("total_rev")} AS total_rev
       |FROM supplier
       |JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
       |${O.OrderAll}"""

  /** TPC-H Q17 (small-quantity-order revenue): lines of one brand whose
    * quantity is under 20% of that PART's average quantity — the
    * correlated scalar subquery whose body is an AVERAGE over the big
    * fact, correlated on the join key. Catalyst decorrelates to ONE
    * grouped per-part average joined back (pinned in PlanSpec: a
    * single extra Aggregate, no per-row re-execution — the naive
    * interpretation scans lineitem once per probe row). Quantities are
    * integer-valued doubles, so sums and the 0.2× threshold are exact
    * and order-independent on both engines. */
  def sqlTpchQ17(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "lineitem", "part")
    ordered(spark.sql(
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         |    / 7.0 AS avg_yearly,
         |  COUNT(*) AS n_lines
         |FROM graft_lineitem
         |JOIN graft_part ON p_partkey = l_partkey
         |WHERE p_brand = 'Brand#3'
         |  AND l_quantity < 0.2 * (
         |    SELECT CAST(SUM(i.l_quantity) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE)
         |    FROM graft_lineitem i WHERE i.l_partkey = p_partkey)""".stripMargin))
  }

  private val sqlTpchQ17Sql =
    s"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
       |    / 7.0 AS avg_yearly,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |WHERE p_brand = 'Brand#3'
       |  AND l_quantity < 0.2 * (
       |    SELECT CAST(SUM(i.l_quantity) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE)
       |    FROM lineitem i WHERE i.l_partkey = p_partkey)
       |${O.OrderAll}"""

  /** TPC-H Q20 (potential part promotion), adapted: suppliers who
    * shipped a disproportionate share of a 'small%' part in 1997
    * (>20% of their all-time quantity for that part — the stand-in for
    * availqty > half of one year's demand, with no partsupp table).
    * The shape: an IN-subquery FEEDING an IN-subquery with a grouped
    * HAVING between them — Catalyst plans semi join (parts) → aggregate
    * → semi join (suppliers), each a hash equi-join; nothing re-executes
    * per row. The HAVING compares 5·SUM(1997 qty) > SUM(qty) in exact
    * integer-valued arithmetic (no 0.2 float multiply on either side). */
  def sqlTpchQ20(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "supplier", "lineitem", "part")
    ordered(spark.sql(
      s"""SELECT s_name,
         |  CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
         |FROM graft_supplier
         |WHERE s_suppkey IN (
         |  SELECT l_suppkey FROM graft_lineitem
         |  WHERE l_partkey IN (
         |    SELECT p_partkey FROM graft_part WHERE p_name LIKE 'small%')
         |  GROUP BY l_suppkey, l_partkey
         |  HAVING 5 * SUM(CASE WHEN year(l_shipdate) = 1997
         |      THEN l_quantity ELSE 0 END)
         |    > SUM(l_quantity))""".stripMargin))
  }

  private val sqlTpchQ20Sql =
    s"""SELECT s_name,
       |  CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
       |FROM supplier
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey FROM lineitem
       |  WHERE l_partkey IN (
       |    SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
       |  GROUP BY l_suppkey, l_partkey
       |  HAVING 5 * SUM(CASE WHEN year(l_shipdate) = 1997
       |      THEN l_quantity ELSE 0 END)
       |    > SUM(l_quantity))
       |${O.OrderAll}"""

  /** TPC-H Q22 (global sales opportunity), adapted: no phone column, so
    * `c_nationkey % 10` plays the country code. Two operators in one
    * plan that no other key combines: an UNCORRELATED scalar average
    * (computed once, broadcast into the row filter) AND a NOT EXISTS
    * with a date residual (anti join on custkey; the date predicate
    * references only the inner side, so it pushes into the orders scan
    * BELOW the anti join — shrinking the build side, not evaluated per
    * pair). "Dormant rich customers": above-average balance, no order
    * since 2000. The average is an exact-decimal sum / count (the raw
    * AVG(double) spelling is partition-order-dependent). */
  def sqlTpchQ22(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "customer", "orders")
    ordered(spark.sql(
      s"""SELECT cntrycode, COUNT(*) AS numcust,
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
         |    AS totacctbal
         |FROM (
         |  SELECT c_nationkey % 10 AS cntrycode, c_acctbal, c_custkey
         |  FROM graft_customer
         |  WHERE c_nationkey % 10 IN (1, 3, 5, 7)
         |    AND c_acctbal > (
         |      SELECT CAST(SUM(CAST(i.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
         |        / CAST(COUNT(*) AS DOUBLE)
         |      FROM graft_customer i
         |      WHERE i.c_acctbal > 0.0 AND i.c_nationkey % 10 IN (1, 3, 5, 7))
         |) cust
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM graft_orders
         |  WHERE o_custkey = c_custkey
         |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         |GROUP BY cntrycode""".stripMargin))
  }

  private val sqlTpchQ22Sql =
    s"""SELECT cntrycode, COUNT(*) AS numcust,
       |  ${O.dsum("c_acctbal")} AS totacctbal
       |FROM (
       |  SELECT c_nationkey % 10 AS cntrycode, c_acctbal, c_custkey
       |  FROM customer
       |  WHERE c_nationkey % 10 IN (1, 3, 5, 7)
       |    AND c_acctbal > (
       |      SELECT CAST(SUM(CAST(i.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
       |        / CAST(COUNT(*) AS DOUBLE)
       |      FROM customer i
       |      WHERE i.c_acctbal > 0.0 AND i.c_nationkey % 10 IN (1, 3, 5, 7))
       |) cust
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM orders
       |  WHERE o_custkey = c_custkey
       |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
       |GROUP BY cntrycode
       |${O.OrderAll}"""

  val queries: Map[String, Q] = Map(
    "sql_tpch_q1" -> Q(sqlTpchQ1 _, sqlTpchQ1Sql),
    "sql_tpch_q6" -> Q(sqlTpchQ6 _, sqlTpchQ6Sql),
    "sql_tpch_q7" -> Q(sqlTpchQ7 _, sqlTpchQ7Sql),
    "sql_tpch_q8" -> Q(sqlTpchQ8 _, sqlTpchQ8Sql),
    "sql_tpch_q9" -> Q(sqlTpchQ9 _, sqlTpchQ9Sql),
    "sql_tpch_q10" -> Q(sqlTpchQ10 _, sqlTpchQ10Sql),
    "sql_tpch_q11" -> Q(sqlTpchQ11 _, sqlTpchQ11Sql),
    "sql_tpch_q15" -> Q(sqlTpchQ15 _, sqlTpchQ15Sql),
    "sql_tpch_q17" -> Q(sqlTpchQ17 _, sqlTpchQ17Sql),
    "sql_tpch_q20" -> Q(sqlTpchQ20 _, sqlTpchQ20Sql),
    "sql_tpch_q22" -> Q(sqlTpchQ22 _, sqlTpchQ22Sql)
  )
}
