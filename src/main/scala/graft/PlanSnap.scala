package graft

import java.nio.file.{Files, Paths}

/** Plan-evidence dumper for the optimization rounds:
  * `runMain graft.PlanSnap <outDir> <suffix> key1 key2 ...` writes
  * `<outDir>/<key>_<suffix>.txt` with the key's
  * `explain("formatted")` output at the bench scale factor. For keys
  * that compute eagerly inside construction (iterative loops), the
  * dumped plan is the final returned frame — the per-round shapes are
  * evidenced by JobProf job tables in OPTIMIZATION notes instead. */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val keys = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.Sessions.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${k}_$suffix.txt"), plan)
      println(s"[plansnap] wrote ${k}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
