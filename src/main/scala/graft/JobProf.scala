package graft

import scala.collection.mutable
import org.apache.spark.scheduler._

/** Per-key job/stage profiler — measurement instrument for the
  * optimization rounds (guide §1: measure first; there is no Spark UI
  * in this sandbox, so this main recovers the same per-stage facts the
  * Stages tab would show). `runMain graft.JobProf key1 key2 ...` runs
  * each key like QBench but prints, per pass:
  *   - every Spark job with wall time, stage count, task count,
  *     summed executor run/CPU time, shuffle read/write bytes;
  *   - the DRIVER GAP: wall time not covered by any job — planning,
  *     codegen, fixture checks, driver-side collects between jobs.
  * Purely additive instrumentation; Bench/QBench timing methodology is
  * untouched. */
object JobProf {
  private final case class JobRec(
      id: Int, desc: String, t0: Long, var t1: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0,
      var runMs: Long = 0L, var cpuNs: Long = 0L,
      var shRead: Long = 0L, var shWrite: Long = 0L,
      var spill: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val spark = core.Sessions.build(cpus)

    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.Map.empty[Int, Int]
    val lock = new Object
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = lock.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, desc, System.nanoTime())
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = lock.synchronized {
        jobs.get(e.jobId).foreach(_.t1 = System.nanoTime())
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          val si = e.stageInfo
          stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
            j.stages += 1
            j.tasks += si.numTasks
            val m = si.taskMetrics
            if (m != null) {
              j.runMs += m.executorRunTime
              j.cpuNs += m.executorCpuTime
              j.shRead += m.shuffleReadMetrics.totalBytesRead
              j.shWrite += m.shuffleWriteMetrics.bytesWritten
              j.spill += m.diskBytesSpilled
            }
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    for (p <- 1 to passes; name <- args) {
      lock.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let listener events drain
      Thread.sleep(300)
      lock.synchronized {
        val js = jobs.values.toSeq
        val jobWall = js.map(j => math.max(0L, j.t1 - j.t0)).sum / 1e9
        println(f"[prof] pass $p $name wall=$wall%.3fs rows=$n jobs=${js.size} " +
          f"jobs_wall=$jobWall%.3fs driver_gap=${wall - jobWall}%.3fs")
        js.foreach { j =>
          val w = math.max(0L, j.t1 - j.t0) / 1e9
          println(f"[prof]   job ${j.id}%3d ${w}%7.3fs stages=${j.stages}%2d " +
            f"tasks=${j.tasks}%4d run=${j.runMs / 1e3}%7.2fs cpu=${j.cpuNs / 1e9}%7.2fs " +
            f"shR=${j.shRead / 1024}%8dK shW=${j.shWrite / 1024}%8dK " +
            f"spill=${j.spill / 1024}%6dK  ${j.desc.take(80)}")
        }
      }
    }
    spark.stop()
  }
}
