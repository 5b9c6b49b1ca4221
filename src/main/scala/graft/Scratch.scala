package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway experiment harness for optimization rounds — NOT a bench
  * surface; deleted or inert when a round ends. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.Sessions.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    val cols = Seq[(String, Boolean)](
      ("o_orderkey", true), ("o_custkey", true), ("o_orderstatus", false),
      ("o_totalprice", true), ("o_orderpriority", false))
    val aggs = cols.flatMap { case (c, numeric) =>
      val v = if (numeric)
        col(c).cast(org.apache.spark.sql.types.DecimalType(18, 2))
      else col(c).cast("string")
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(v).cast("string").as(s"${c}__min"),
        max(v).cast("string").as(s"${c}__max"))
    }
    def base: DataFrame = core.Tables.load(spark, sfDir, "orders")
    def time(label: String)(df: => DataFrame): Unit = {
      for (p <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[scratch] $label pass $p: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    }
    time("agg_rr8") { base.repartition(8).agg(aggs.head, aggs.tail: _*) }
    // split: distinct counts alone (hash-friendly Expand), rest separate
    val dAggs = cols.map { case (c, _) =>
      count_distinct(col(c)).as(s"${c}__distinct")
    }
    val rAggs = cols.flatMap { case (c, numeric) =>
      val v = if (numeric)
        col(c).cast(org.apache.spark.sql.types.DecimalType(18, 2))
      else col(c).cast("string")
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        min(v).cast("string").as(s"${c}__min"),
        max(v).cast("string").as(s"${c}__max"))
    }
    time("split") {
      base.agg(dAggs.head, dAggs.tail: _*)
        .crossJoin(base.agg(rAggs.head, rAggs.tail: _*))
    }
    time("split_rr32") {
      base.repartition(32).agg(dAggs.head, dAggs.tail: _*)
        .crossJoin(base.agg(rAggs.head, rAggs.tail: _*))
    }
    println("=== split plan ===")
    base.agg(dAggs.head, dAggs.tail: _*)
      .crossJoin(base.agg(rAggs.head, rAggs.tail: _*)).explain()
    spark.stop()
  }
}
