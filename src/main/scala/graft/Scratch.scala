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

    def time(label: String, key: String, passes: Int = 3): Unit = {
      for (p <- 1 to passes) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(key)(spark, sfDir).count()
        println(f"[scratch] $label/$key pass $p: ${(System.nanoTime() - t0) / 1e9}%.3fs ($n rows)")
      }
    }
    // interleave to cancel slow host drift
    for (r <- 1 to 3) {
      time(s"r$r", "graph_pagerank", 2)
      time(s"r$r", "graph_bfs", 2)
    }
    spark.stop()
  }
}
