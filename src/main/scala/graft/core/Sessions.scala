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
    // task fails, and the query paths are deterministic and
    // side-effect-free per task, so a re-run is always safe. The ONE
    // exception to "side-effect-free": JDBC loads (JdbcSink.write,
    // sink_jdbc_upsert's staging INSERT) commit a transaction per
    // task, so a task that commits and then fails to REPORT would
    // duplicate rows on retry. In local mode the commit and the report
    // are the same in-process thread (no network between them), which
    // is why the shipped gates tolerate it; a real-cluster deployment
    // of the JDBC sink should truncate-and-reload per attempt or
    // stage + MERGE (the upsert path already is a stage + MERGE).
    val b = SparkSession.builder()
      .master(s"local[$cpus,4]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", ExtensionsClass)
      // reliable lineage cuts (Lineage.cut with a checkpoint dir set)
      // would otherwise accumulate one rdd-N dir per cut per round,
      // unbounded over a long-running deployment — let the
      // ContextCleaner delete checkpoint files once their RDD is GC'd
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // r14 (guide §6, file listing): above this many paths Spark
      // launches a whole JOB to list leaf files in parallel. The
      // default 32 means every read of a cid-partitioned index fixture
      // (64 cells) or a 64-file compaction layout pays a 64-task
      // listing job (~0.2 s each, measured via JobProf) where a
      // driver-side listing of ≤128 local/HDFS dirs is milliseconds.
      // 128 keeps the parallel path for genuinely wide tables
      // (thousands of partitions) on any deployment size — the
      // threshold is about path COUNT, not cluster size.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "128")
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
