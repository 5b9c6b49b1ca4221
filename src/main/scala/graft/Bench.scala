package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // One-time Structured Streaming engine init (classloading, offset
    // log machinery, codegen) costs several seconds and used to land on
    // whichever streaming query happened to run first, holding
    // round-over-round comparisons hostage to map ordering. Pay it on a
    // one-row throwaway stream up front and report it separately.
    val streamInit = {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.Trigger
      import spark.implicits._
      val t0 = System.nanoTime()
      val dir = java.nio.file.Files.createTempDirectory("graft_warmup")
      Seq((1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
        .toDF("v", "ts").write.mode("overwrite").parquet(dir.toString)
      def src = spark.readStream.schema("v BIGINT, ts TIMESTAMP")
        .parquet(dir.toString)
      def run(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val q = df.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      // stateless scan, stateful windowed agg, and stream-stream join:
      // each initializes distinct engine machinery (offset log, state
      // store provider, symmetric hash join) whose first-use cost would
      // otherwise land on the first timed query of that shape.
      run("graft_warm_scan", src)
      run("graft_warm_agg", src.withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 minute")).count()
        .select(col("count")))
      val l = src.withWatermark("ts", "1 minute")
      val r = src.select(col("v").as("v2"), col("ts").as("ts2"))
        .withWatermark("ts2", "1 minute")
      run("graft_warm_join", l.join(r,
        col("v") === col("v2") && col("ts2") >= col("ts") - expr("INTERVAL 1 MINUTE") &&
          col("ts2") <= col("ts")))
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","first_stream_init":$streamInit}""")
    spark.stop()
  }
}
