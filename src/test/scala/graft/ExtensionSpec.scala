package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{GlobalWindowGuardRule, GraftExtensions, ScanGuardRule}

/** The Catalyst extension surface: ScanGuard must flag scale-killer
  * join shapes (non-equi over two big sides) and pass everything the
  * engine legitimately plans — including the deliberate small cross
  * joins (audit scalars) and the capped brute twins. Driven rule-level
  * against real optimized plans (one JVM = one SparkContext; extensions
  * bind at session construction, so a fixture session can't re-wire). */
class ExtensionSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private def guard(plan: org.apache.spark.sql.DataFrame): Unit = {
    ScanGuardRule(plan.queryExecution.optimizedPlan)
    GlobalWindowGuardRule(plan.queryExecution.optimizedPlan)
  }

  test("scan guard passes every keyed query at the default budget") {
    // the whole inventory's logical plans are lint-clean: anything
    // non-equi in them keeps one side under the budget by design
    for ((name, q) <- SparkEntry.registry) {
      try guard(q.fn(spark, Sf))
      catch {
        case e: IllegalStateException =>
          fail(s"$name tripped ScanGuard: ${e.getMessage}")
        case _: Throwable => () // keys needing runtime fixtures: not the lint's concern
      }
    }
  }

  test("scan guard trips on a big×big cross join and respects the budget conf") {
    val li = core.Tables.load(spark, Sf, "lineitem")
    val cross = li.as("a").crossJoin(li.as("b"))
    // under a tiny budget the cross join must throw...
    spark.conf.set(ScanGuardRule.ConfKey, "1024")
    try {
      val e = intercept[IllegalStateException](guard(cross))
      assert(e.getMessage.contains("non-equi join"))
      // ...an equi join over the same big sides must NOT
      guard(li.as("a").join(li.as("b"), Seq("l_orderkey")))
      // ...and the audit-scalar pattern (big × 1-row agg) must NOT:
      // the broadcast side's stats sit far under any sane budget
      guard(li.crossJoin(broadcast(li.agg(count(lit(1)).as("n")))))
    } finally spark.conf.unset(ScanGuardRule.ConfKey)
    // at the default budget the same cross join passes (test tables are small)
    guard(cross)
  }

  test("window guard trips on a naive global row_number and stays silent when partitioned") {
    import org.apache.spark.sql.expressions.Window
    val li = core.Tables.load(spark, Sf, "lineitem")
    // under a tiny budget the empty-partitionBy window must throw...
    spark.conf.set(GlobalWindowGuardRule.ConfKey, "1024")
    try {
      val e = intercept[IllegalStateException](guard(
        li.withColumn("rn",
          row_number().over(Window.orderBy(col("l_orderkey"))))))
      assert(e.getMessage.contains("empty partitionBy"))
      // ...the same window PARTITIONED must not (per-key sorts scale out)
      guard(li.withColumn("rn", row_number().over(
        Window.partitionBy(col("l_suppkey")).orderBy(col("l_orderkey")))))
      // ...and a global window over a BOUNDED input must not: the
      // 5-row aggregate sits under any sane budget (the legitimate
      // global-rank-of-small-aggregate pattern)
      guard(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n")).limit(5)
        .withColumn("rk", row_number().over(Window.orderBy(col("n")))))
    } finally spark.conf.unset(GlobalWindowGuardRule.ConfKey)
    // at the default budget the test-scale input passes (small tables)
    guard(li.withColumn("rn",
      row_number().over(Window.orderBy(col("l_orderkey")))))
  }

  test("window guard exempts rank-limited global windows (the WindowGroupLimit shape)") {
    import org.apache.spark.sql.expressions.Window
    val li = core.Tables.load(spark, Sf, "lineitem")
    // budget 1 byte: EVERY global window trips unless exempt
    spark.conf.set(GlobalWindowGuardRule.ConfKey, "1")
    try {
      // `Filter(rank <= k, Window)` executes via InferWindowGroupLimit
      // as a per-partition top-k before the single-partition merge —
      // the shape llm_span_dedup's global top-40 plans at every SF —
      // and must pass even at an absurd budget
      guard(li
        .withColumn("rk", row_number().over(Window.orderBy(col("l_orderkey"))))
        .filter(col("rk") <= 40))
      // a projection between the filter and the window (column pruning
      // does this) must not defeat the exemption
      guard(li
        .withColumn("rk", rank().over(Window.orderBy(col("l_extendedprice").desc)))
        .filter(col("rk") < 10)
        .select(col("l_orderkey"), col("rk")))
      // but an UNBOUNDED rank (no limit filter) still trips...
      intercept[IllegalStateException](guard(
        li.withColumn("rk", row_number().over(Window.orderBy(col("l_orderkey"))))))
      // ...and so does a non-rank window function even WITH a filter
      // on some other column (sum over a global frame has no
      // WindowGroupLimit rewrite — the sort really is one task)
      intercept[IllegalStateException](guard(
        li.withColumn("s", sum(col("l_quantity")).over(
            Window.orderBy(col("l_orderkey"))))
          .filter(col("l_linenumber") <= 2)))
      // the exemption is VALUE-aware, not shape-aware (r10, per
      // advisor): Spark only rewrites to WindowGroupLimit when the
      // literal limit is within spark.sql.window.group.limit.threshold
      // (default 1000) — a bound above it still runs the full
      // single-task global sort and must trip
      intercept[IllegalStateException](guard(li
        .withColumn("rk", row_number().over(Window.orderBy(col("l_orderkey"))))
        .filter(col("rk") <= 100000)))
      // threshold -1 disables the rewrite entirely: even a tiny bound
      // is then a real single-task sort
      spark.conf.set("spark.sql.window.group.limit.threshold", "-1")
      try intercept[IllegalStateException](guard(li
        .withColumn("rk", row_number().over(Window.orderBy(col("l_orderkey"))))
        .filter(col("rk") <= 40)))
      finally spark.conf.unset("spark.sql.window.group.limit.threshold")
      // a non-positive bound is unsatisfiable: Spark prunes the whole
      // subtree to an empty relation, so no Window survives to guard —
      // silence is correct (nothing sorts)
      guard(li
        .withColumn("rk", row_number().over(Window.orderBy(col("l_orderkey"))))
        .filter(col("rk") <= 0))
      // literal-first spellings (r11, per advisor): `40 = rk` is the
      // same bounded top-k as `rk = 40` and must be exempt…
      guard(li
        .withColumn("rk", row_number().over(Window.orderBy(col("l_orderkey"))))
        .filter(lit(40) === col("rk")))
      // …while `5 < rk` literal-first is a LOWER bound — unbounded
      // above, a genuine single-task global sort, still trips (the
      // advisor's suggested LessThan mirror must NOT become a limit)
      intercept[IllegalStateException](guard(li
        .withColumn("rk", row_number().over(Window.orderBy(col("l_orderkey"))))
        .filter(lit(5) < col("rk"))))
    } finally spark.conf.unset(GlobalWindowGuardRule.ConfKey)
  }

  test("shipped gate session wires GraftExtensions (subprocess Verify run)") {
    // extensions bind at session construction and this JVM's context
    // already exists, so the ONLY faithful test of the shipped wiring
    // is the shipped main itself: run graft.Verify end-to-end in a
    // fresh JVM and assert the session announced the active extension
    // (core.Sessions.build's conf `require` + log line)
    import scala.jdk.CollectionConverters._
    val outDir = "target/ext_subproc_out"
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val opens = jvmArgs.sliding(2).collect {
      case scala.collection.Seq("--add-opens", v) => Seq("--add-opens", v)
    }.flatten.toSeq
    val cmd = Seq("java") ++ opens ++ Seq("-Xmx2g",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"),
      "graft.Verify", Sf, outDir, "agg_hash")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"Verify subprocess failed:\n${out.takeRight(2000)}")
    assert(out.contains("[graft] ScanGuard extensions active"),
      s"gate session must announce the active extension:\n${out.takeRight(2000)}")
    assert(new java.io.File(s"$outDir/agg_hash/_SUCCESS").exists(),
      "gate run must still produce its parquet dump under the guard")
  }

  test("GraftExtensions registers the rule without touching results") {
    // the entry point must wire cleanly into a fresh extensions registry
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // and the rule is identity on plans it doesn't reject
    val df = core.Tables.load(spark, Sf, "orders").filter(col("o_totalprice") > 100)
    val plan = df.queryExecution.optimizedPlan
    assert(ScanGuardRule(plan) eq plan)
  }
}
