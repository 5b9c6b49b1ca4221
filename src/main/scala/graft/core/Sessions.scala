package graft.core

import org.apache.spark.sql.SparkSession

/** One construction path for every shipped main's SparkSession
  * (Verify / Bench / QBench / ScaleStats / ScaleUp / PlanDump):
  * local[cpus], cpus shuffle partitions, UI off — and (r8 verdict
  * task #5) [[graft.plans.GraftExtensions]] wired, so the ScanGuard
  * plan lints police every driver-gate and bench run AT RUNTIME, not
  * only in the PlanSpec/ExtensionSpec sweeps. The post-construction
  * `require` turns a silently-dropped extension conf (builder drift,
  * a main that stopped using this path) into a loud failure of the
  * run itself; a typo'd class name already fails session construction
  * inside Spark. */
object Sessions {
  val ExtensionsClass = "graft.plans.GraftExtensions"

  def build(cpus: String, extra: Map[String, String] = Map.empty): SparkSession = {
    // local[n, 4]: FOUR task attempts instead of local mode's
    // fail-fast single attempt. A contended box can fail one task
    // transiently (GC stall, fetch hiccup) — with maxFailures=1 that
    // killed the whole query (BENCH_r12's lone graph_pagerank
    // STAGE_MATERIALIZATION failure); retries cost nothing when no
    // task fails, and every query here is deterministic and
    // side-effect-free per task, so a re-run is always safe.
    val b = SparkSession.builder()
      .master(s"local[$cpus,4]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", ExtensionsClass)
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    require(s.conf.get("spark.sql.extensions", "") == ExtensionsClass,
      s"GraftExtensions not wired into this session (spark.sql.extensions mismatch)")
    System.err.println(
      s"[graft] ScanGuard extensions active (spark.sql.extensions=$ExtensionsClass)")
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
