package graft

import org.apache.spark.sql.SparkSession

/** Throwaway experiment harness for optimization rounds — NOT a bench
  * surface; deleted or inert when a round ends. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.Sessions.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String, key: String): Unit = {
      for (p <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(key)(spark, sfDir).count()
        println(f"[scratch] $label/$key pass $p: ${(System.nanoTime() - t0) / 1e9}%.3fs ($n rows)")
      }
    }
    val keys = Seq("stream_tumbling_append_mb", "stream_join", "stream_heavy_hitters")
    keys.foreach(k => time("default", k))
    // route temp streaming checkpoints (offset/commit logs + state
    // store) to tmpfs and compare
    new java.io.File("/dev/shm/graft_ckpt").mkdirs()
    spark.conf.set("spark.sql.streaming.checkpointLocation", "/dev/shm/graft_ckpt")
    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    keys.foreach(k => time("shm", k))
    spark.stop()
  }
}
