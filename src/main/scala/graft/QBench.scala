package graft

/** Ad-hoc single-query timer for iterating on one operator without
  * paying the full all-keys bench: `runMain graft.QBench q1 q2 ...`
  * (same env knobs as [[Bench]]). Prints per-pass wall times. */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    // big-rung instrument: streaming keys land in a MEMORY sink (the
    // test harness's sink, not the operator's — production writes
    // files), whose per-batch task results ship to the driver; at
    // sf100 they exceed the 1g default. Harness knob, not a tune.
    val spark = core.Sessions.build(cpus,
      Map("spark.driver.maxResultSize" ->
        sys.env.getOrElse("SPARK_GRAFT_MAX_RESULT", "8g")))
    core.ScratchPreflight.check(spark, sfDir)
    for (p <- 1 to passes; name <- args) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[qbench] pass $p $name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }
    spark.stop()
  }
}
