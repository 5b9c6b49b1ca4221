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
    val best = scala.collection.mutable.Map[String, Double]()
    for (p <- 1 to passes; name <- args) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
      println(f"[qbench] pass $p $name: $sec%.2fs ($n rows)")
    }
    // one JSON artifact line with the same self-identification rules
    // as Bench (r13 verdict #4: the reliable-checkpoint cost story
    // needs a ckpt:reliable artifact at a big rung next to its
    // local-mode twin — this is the instrument for that pair)
    val ckpt =
      if (core.Lineage.lastCutReliable ||
          sys.env.contains("SPARK_GRAFT_CHECKPOINT_DIR") ||
          spark.conf.getOption(core.Lineage.ConfKey).exists(_.nonEmpty))
        "reliable"
      else "local"
    val qs = args.map(n => s""""$n":${best.getOrElse(n, -1.0)}""")
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"qbench","sf":"$sfDir","passes":$passes,""" +
        s""""queries":$qs,"total":${best.values.sum},"ckpt":"$ckpt",""" +
        f""""canary_sec":${core.HostProbe.canaryMin3()}%.3f,""" +
        s""""boot_epoch":${core.HostProbe.bootEpoch()}}""")
    spark.stop()
  }
}
