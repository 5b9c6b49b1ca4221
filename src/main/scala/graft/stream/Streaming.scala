package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, Trigger, ValueState}
import graft.core.{Q, Tables}
import graft.core.Determinism._
import graft.core.{OracleDsl => O}

/** SURVEY.md §2.10 — Structured Streaming over the `events` table.
  *
  * The reference is batch-only; these generalize its incremental-load
  * claim (/root/reference/README.md:4) to continuous ingest. Inside the
  * driver contract each query runs the stream bounded: file-stream
  * source over the test parquet → Trigger.AvailableNow → memory sink →
  * return the sink table. Deterministic because input is bounded and
  * every aggregate follows the Determinism rules.
  *
  * 100 TB notes: watermarks bound state (late rows beyond 30 min are
  * dropped, state for closed windows is evicted); `session_window` and
  * `flatMapGroupsWithState` state lives in the state store keyed by
  * user — shuffle-partitioned, so state scales horizontally with
  * executors. The same code runs unbounded by swapping the source for
  * kafka/files-on-arrival and the sink for a real one.
  */
/** Typed per-key running aggregate for [[Streaming.tws]]: ValueState
  * holds (count, max); reducers are commutative so batch iterator order
  * is irrelevant. */
class UserRunningAgg
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
  @transient private var state: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Double)]("agg",
      org.apache.spark.sql.Encoders.product[(Long, Double)], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    var (n, mx) =
      if (state.exists()) state.get() else (0L, Double.NegativeInfinity)
    rows.foreach { case (_, v) =>
      n += 1
      if (v > mx) mx = v
    }
    state.update((n, mx))
    Iterator.single((key, n, mx))
  }
}

object Streaming {

  private val ctr = new java.util.concurrent.atomic.AtomicLong()
  private val liveSinks = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Last batchId of the most recent [[runToTable]] query — lets tests
    * assert HOW MANY micro-batches a bounded run actually executed
    * (batchId is 0-based: single-batch runs end at 0, the multi-batch
    * fixture at ≥ [[MbSlices]] − 1). */
  @volatile private[graft] var lastBatchId: Long = -1L

  /** Peak state-store row count (sum over state operators, max over
    * micro-batches) of the most recent [[runToTable]] query, from
    * `StreamingQueryProgress.stateOperators` — the store's own account
    * of what it holds, so tests can pin "state is bounded by k/keys,
    * never by input rows" against the runtime, not the code's claim.
    * −1 when the run reported no progress. */
  @volatile private[graft] var lastStateRowsPeak: Long = -1L

  /** Bounded streaming read of events. FileStreamSource requires a
    * directory, so we stage the (ns→µs normalized) table into a fixture
    * dir once and stream from there.
    *
    * `maxFilesPerTrigger` is set far above the fixture's file count to
    * make single-batch processing EXPLICIT rather than incidental: the
    * update-mode queries' oracles (one final row per key) and the
    * append-mode watermark math both assume all data arrives before
    * the watermark first advances, which a silent multi-batch split
    * would break. */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.core.Fixtures.path(dir, "events_stream_src")
    if (!graft.core.Fixtures.exists(dir, "events_stream_src"))
      Tables.load(spark, dir, "events").write.mode("overwrite").parquet(path)
    spark.readStream.schema(Tables.events)
      .option("maxFilesPerTrigger", 1000000)
      .parquet(path)
  }

  /** Number of time-ordered slices in the multi-batch fixture (→ one
    * micro-batch each under `maxFilesPerTrigger = 1`). */
  private[graft] val MbSlices = 6

  /** Multi-batch streaming read: the events table written as [[MbSlices]]
    * single-file TIME-ORDERED slices (ntile over ts) with strictly
    * increasing, pinned modification times, streamed back one file per
    * micro-batch. FileStreamSource picks files oldest-mtime-first, so
    * batch i+1's earliest ts ≥ batch i's latest — no row ever arrives
    * behind the (30-min-lagged) watermark, which is exactly how a real
    * time-partitioned ingest feeds a cluster. Unlike [[eventsStream]]
    * this makes the watermark ADVANCE BETWEEN COMMITS: window state
    * must survive checkpoints, emit exactly once when the watermark
    * passes, and be evicted — the cross-batch state machine, not just
    * single-batch algebra. */
  private[graft] def eventsStreamMultiBatch(spark: SparkSession, dir: String): DataFrame = {
    val fixture = "events_stream_src_mb"
    val path = graft.core.Fixtures.path(dir, fixture)
    // multi-job build → buildAtomic: _SUCCESS lands with the FIRST
    // append, so only the rename-into-place makes "exists" mean "all
    // slices present"
    graft.core.Fixtures.buildAtomic(dir, fixture) { tmpPath =>
      import org.apache.spark.sql.expressions.Window
      // the global ntile below is a DELIBERATE single-partition sort —
      // a one-time fixture build (never a query path). With ScanGuard
      // wired into the shipped sessions (r9) the window lint would
      // veto it at sf≥10 sizes, so raise its budget for exactly this
      // build (plans here are constructed AND executed inside this
      // block, so the scoped raise covers them)
      val guardKey = graft.plans.GlobalWindowGuardRule.ConfKey
      val prevGuard = spark.conf.getOption(guardKey)
      spark.conf.set(guardKey, Long.MaxValue.toString)
      try {
      val sliced = Tables.load(spark, dir, "events")
        // deterministic slice assignment; single-partition sort is fine
        // for a one-time test-scale fixture build (never a query path)
        .withColumn("_slice",
          ntile(MbSlices).over(Window.orderBy(col("ts"), col("event_id"))))
      val dirFile = new java.io.File(tmpPath)
      var known = Set.empty[String]
      for (i <- 1 to MbSlices) {
        sliced.filter(col("_slice") === i).drop("_slice")
          .coalesce(1).write.mode("append").parquet(tmpPath)
        // pin strictly increasing mtimes so the source's oldest-first
        // file order IS the time order, independent of write speed
        val fresh = dirFile.listFiles().filter(f =>
          f.getName.startsWith("part-") && !known.contains(f.getName))
        fresh.foreach(_.setLastModified(1600000000000L + i * 60000L))
        known ++= fresh.map(_.getName)
      }
      } finally {
        prevGuard match {
          case Some(v) => spark.conf.set(guardKey, v)
          case None => spark.conf.unset(guardKey)
        }
      }
    }
    spark.readStream.schema(Tables.events)
      .option("maxFilesPerTrigger", 1)
      .parquet(path)
  }

  /** Three-phase OUT-OF-ORDER source for the late-data key: file 0 the
    * bulk (`event_id % 5 ∉ {0,2}`, full time span — its max drives the
    * watermark), file 1 a buffer batch (`% 5 = 2`), file 2 the late
    * arrivals (`% 5 = 0`). The buffer batch exists because the
    * late-row DATA FILTER runs one batch behind the displayed
    * watermark (see [[streamLateDrop]]) — with only two batches the
    * filter never engages at all. maxFilesPerTrigger=1 + pinned mtimes
    * make the three batches and their order deterministic. */
  private[graft] def eventsStreamThreePhase(spark: SparkSession, dir: String): DataFrame = {
    // phase structure encoded in the name: a layout change must miss
    // the old fixture and rebuild (the ivf-index staleness lesson)
    val fixture = "events_stream_src_late_p3"
    val path = graft.core.Fixtures.path(dir, fixture)
    // three append jobs → buildAtomic (a 1- or 2-phase partial would
    // silently change the late-drop watermark semantics)
    graft.core.Fixtures.buildAtomic(dir, fixture) { tmpPath =>
      val ev = Tables.load(spark, dir, "events")
      val dirFile = new java.io.File(tmpPath)
      var known = Set.empty[String]
      Seq(col("event_id") % 5 =!= 0 && col("event_id") % 5 =!= 2,
        col("event_id") % 5 === 2,
        col("event_id") % 5 === 0)
        .zipWithIndex.foreach { case (pred, i) =>
          ev.filter(pred).coalesce(1).write.mode("append").parquet(tmpPath)
          val fresh = dirFile.listFiles().filter(f =>
            f.getName.startsWith("part-") && !known.contains(f.getName))
          fresh.foreach(_.setLastModified(1600000000000L + i * 60000L))
          known ++= fresh.map(_.getName)
        }
    }
    spark.readStream.schema(Tables.events)
      .option("maxFilesPerTrigger", 1)
      .parquet(path)
  }

  /** Run a bounded streaming DataFrame to completion into a uniquely
    * named memory sink; return the sink table. */
  /** Bench sink selector (r8 verdict #3): the memory sink ships every
    * result row to the driver — at sf100 `stream_ewma`'s 543 s was
    * ~entirely a 100M-row driver collect, polluting the heavy-tail
    * evidence with harness cost. `SPARK_GRAFT_STREAM_SINK=parquet`
    * (env, for Bench/QBench at sf ≥ 10; `graft.stream.sink` sysprop
    * for the in-JVM equivalence spec) reroutes the bounded run through
    * foreachBatch → parquet under target/ — fully distributed, zero
    * driver collect — and returns the files read back. Result-set
    * equality with the memory sink is law-tested per output mode:
    * complete re-emits whole state (overwrite keeps the last emission,
    * like the memory sink's truncate); append/update emit deltas
    * (parquet append ≡ the memory sink's row appends). Correctness
    * gates never set the knob, so oracle runs stay memory-sink. */
  private def streamSinkMode: String =
    sys.props.getOrElse("graft.stream.sink",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_SINK", "memory"))

  /** Scratch base for the bounded harness runs' checkpoints (r15,
    * guide §6 / §1 "time the computation, not the sink"): every
    * bounded run writes an offset log + commit log + one state-store
    * delta PER PARTITION PER MICRO-BATCH, each fsync'd — on the
    * sandbox's disk that I/O was 2-3× the query (measured:
    * stream_tumbling_append_mb 18.0 s → 5.1 s, stream_join 7.1 → 3.3,
    * stream_heavy_hitters 4.3 → 3.3 same session). These checkpoints
    * are EPHEMERAL BY DESIGN — the harness sink is a memory table and
    * the checkpoint is deleted right after the bounded run — so tmpfs
    * costs no durability the harness ever had; a production deployment
    * sets a durable location explicitly (exactly what
    * `stream_checkpoint_resume` does with its own fixture-dir
    * checkpoint, which this base never touches). Knob:
    * `SPARK_GRAFT_STREAM_CKPT=<dir>` reroutes (e.g. at a big rung
    * whose state outgrows tmpfs); unset and no writable /dev/shm →
    * Spark's own temp-dir behavior, as before. */
  private lazy val streamCkptBase: Option[String] =
    sys.env.get("SPARK_GRAFT_STREAM_CKPT").filter(_.nonEmpty)
      .orElse {
        val shm = new java.io.File("/dev/shm")
        if (shm.isDirectory && shm.canWrite)
          Some("/dev/shm/graft_stream_ckpt")
        else None
      }

  /** Run `body` with a per-query scratch checkpoint dir (or None →
    * Spark's default temp checkpoint), deleting the dir afterwards. */
  private def withScratchCkpt[A](name: String)(
      body: Option[String] => A): A = {
    val dir = streamCkptBase.map { base =>
      val d = new java.io.File(base, name)
      d.mkdirs()
      d.getAbsolutePath
    }
    try body(dir)
    finally dir.foreach { d =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(d))
    }
  }

  private val liveSinkDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private def runToParquet(spark: SparkSession, sdf: DataFrame, mode: String): DataFrame = {
    // sequential-consumption contract (same as liveSinks): by the time
    // the next streaming query runs, earlier results are consumed —
    // keep only the most recent dir so sf100 runs don't accumulate
    // result sets on disk across 19 streaming keys × passes
    while (liveSinkDirs.size() > 1) {
      val stale = new java.io.File(liveSinkDirs.poll())
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(stale)
    }
    val path = s"target/stream_sink/graft_ps_${ctr.incrementAndGet()}_${System.nanoTime()}"
    liveSinkDirs.add(path)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    // Batch-replay idempotence (r10, per advisor): foreachBatch offers
    // NO exactly-once guarantee — a retried micro-batch is re-offered
    // with the SAME batchId, and a blind `append` would double its
    // rows into the result the bench reads back. The memory sink
    // ignores re-offered batchIds; the parquet fold matches it by
    // keying each batch's write to a batchId directory with
    // mode=overwrite (a replay rewrites the same dir, byte-for-byte
    // idempotent). Complete mode re-emits whole state, so a full-path
    // overwrite is already replay-safe there.
    withScratchCkpt(s"pq_${ctr.get()}") { ckptDir =>
    val q =
      try withStateStore(spark) {
        val w = sdf.writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            if (mode == "complete") batch.write.mode("overwrite").parquet(path)
            else batch.write.mode("overwrite").parquet(s"$path/b$batchId")
          }
          .outputMode(mode).trigger(Trigger.AvailableNow())
        ckptDir.foreach(d => w.option("checkpointLocation", d))
        w.start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
    lastBatchId = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
    lastStateRowsPeak = q.recentProgress
      .map(p => Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L))
      .foldLeft(-1L)(math.max)
    if (new java.io.File(path).exists())
      // recursiveFileLookup reads the union of the batchId dirs (and
      // the flat complete-mode layout) WITHOUT partition inference —
      // `b<id>` must stay a directory name, never a schema column
      spark.read.schema(sdf.schema)
        .option("recursiveFileLookup", "true").parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sdf.schema)
    }
  }

  /** Big-rung state-store knob (r10, r9 verdict #4):
    * `SPARK_GRAFT_STATE_STORE=rocksdb` (env, for Bench/QBench at
    * sf ≥ 10; `graft.stream.stateStore` sysprop for in-JVM tests)
    * runs every streaming query's state in the RocksDB provider —
    * off-heap, spillable-to-disk, the store a production cluster runs
    * stateful streaming on when per-key state outgrows executor heap
    * (sf100 `stream_session`/`stream_stateful` hold millions of user
    * states; the default HDFS-backed provider keeps them ALL in JVM
    * memory maps). Correctness gates never set the knob, so oracle
    * runs stay on the default provider; `stream_tws` pins RocksDB
    * itself regardless (transformWithState requires it). The conf is
    * captured per-query at start, so set-around-start + restore is a
    * per-query override, not a session mutation. */
  private def stateStoreConf: Option[String] =
    sys.props.get("graft.stream.stateStore")
      .orElse(sys.env.get("SPARK_GRAFT_STATE_STORE")) match {
      case Some("rocksdb") => Some(
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case _ => None
    }

  private def withStateStore[A](spark: SparkSession)(body: => A): A =
    stateStoreConf match {
      case None => body
      case Some(cls) =>
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, cls)
        try body
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
    }

  private def runToTable(spark: SparkSession, sdf: DataFrame, mode: String): DataFrame = {
    if (streamSinkMode == "parquet") return runToParquet(spark, sdf, mode)
    // queries run sequentially: earlier sinks' result sets are consumed
    // by now — drop them so complete-mode outputs don't accumulate in
    // driver memory across a long bench session.
    while (liveSinks.size() > 1)
      spark.catalog.dropTempView(liveSinks.poll())
    val name = s"graft_ms_${ctr.incrementAndGet()}_${System.nanoTime()}"
    liveSinks.add(name)
    // Every stateful operator keeps one state store PER SHUFFLE
    // PARTITION (a stream-stream join keeps four), and each store pays
    // a per-microbatch commit. State store count should be sized to
    // state volume, not inherited from the batch setting: at test
    // scale 32 partitions × 4 stores × N batches is pure commit
    // overhead (~7 s on a 20-row join result — measured). The value is
    // captured in the query's checkpoint at start, so it is a
    // per-query streaming knob, not a global change; a real deployment
    // sizes it to keys × state row size ÷ executor memory.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    withScratchCkpt(name) { ckptDir =>
    val q =
      try withStateStore(spark) {
        val w = sdf.writeStream.format("memory").queryName(name)
          .outputMode(mode).trigger(Trigger.AvailableNow())
        ckptDir.foreach(d => w.option("checkpointLocation", d))
        w.start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
    lastBatchId = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
    lastStateRowsPeak = q.recentProgress
      .map(p => Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L))
      .foldLeft(-1L)(math.max)
    spark.table(name)
    }
  }

  /** Tumbling 10-min window × event_type with a 30-min watermark.
    * Complete mode so windows inside the final watermark also emit
    * (bounded input; on an unbounded stream you'd run append). */
  def tumbling(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(money(col("value"))).as("sum_value"))
    ordered(
      runToTable(spark, agg, "complete")
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("n"),
          col("sum_value").cast("double").as("sum_value")))
  }

  private val tumblingSql =
    s"""SELECT strftime(make_timestamp(CAST((epoch_us(ts) // 600000000) * 600000000 AS BIGINT)),
       |    '%Y-%m-%d %H:%M:%S') AS ws,
       |  event_type, COUNT(*) AS n,
       |  ${O.dsum("value")} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |${O.OrderAll}"""

  /** Append-mode tumbling window — the unbounded-stream behavior the
    * complete-mode variants can't show: a window emits EXACTLY ONCE,
    * when the watermark passes its end, and its state is evicted. This
    * is the state-bounded path that matters at scale (complete mode
    * re-emits every window each batch and retains the full result).
    * On bounded input the watermark finishes at max(ts) − 30 min, so
    * windows still open at that point never emit — the oracle excludes
    * them with the same cutoff. */
  def tumblingAppend(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(money(col("value"))).as("sum_value"))
    ordered(
      runToTable(spark, agg, "append")
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("n"),
          col("sum_value").cast("double").as("sum_value")))
  }

  private val tumblingAppendSql =
    s"""WITH wm AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events),
       |agg AS (
       |  SELECT make_timestamp(CAST((epoch_us(ts) // 600000000) * 600000000 AS BIGINT)) AS wstart,
       |    event_type, COUNT(*) AS n,
       |    ${O.dsum("value")} AS sum_value
       |  FROM events
       |  GROUP BY 1, 2)
       |SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS ws, event_type, n, sum_value
       |FROM agg, wm
       |WHERE wstart + INTERVAL 10 MINUTE <= wm.w
       |${O.OrderAll}"""

  /** [[tumblingAppend]] driven through the multi-batch source — the
    * real unbounded-stream regime: the watermark advances BETWEEN
    * micro-batch commits, so each commit closes (emits + evicts) only
    * the windows the new watermark passed, while still-open window
    * state survives the commit into the next batch. The final sink
    * content is batch-split-invariant (append emits each window exactly
    * once, when its end ≤ watermark), so the SAME oracle as the
    * single-batch variant applies — which is itself the proof that the
    * cross-batch state machine loses and duplicates nothing. */
  def tumblingAppendMb(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventsStreamMultiBatch(spark, dir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(money(col("value"))).as("sum_value"))
    ordered(
      runToTable(spark, agg, "append")
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("n"),
          col("sum_value").cast("double").as("sum_value")))
  }

  /** Sliding 10-min window every 5 min: each event lands in exactly two
    * windows. */
  def sliding(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), sum(money(col("value"))).as("sum_value"))
    ordered(
      runToTable(spark, agg, "complete")
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("n"), col("sum_value").cast("double").as("sum_value")))
  }

  private val slidingSql =
    s"""WITH b AS (
       |  SELECT make_timestamp(CAST((epoch_us(ts) // 300000000) * 300000000 AS BIGINT)) AS s5,
       |    value
       |  FROM events),
       |both_windows AS (
       |  SELECT s5 AS ws, value FROM b
       |  UNION ALL
       |  SELECT s5 - INTERVAL 5 MINUTE AS ws, value FROM b)
       |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, COUNT(*) AS n,
       |  ${O.dsum("value")} AS sum_value
       |FROM both_windows GROUP BY 1
       |${O.OrderAll}"""

  /** Session windows: per-user sessions with a 15-minute inactivity gap.
    * Complete mode (session aggregation rejects update); the bounded
    * input emits every session's final state. */
  def session(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(money(col("value"))).as("sum_value"))
    ordered(
      runToTable(spark, agg, "complete")
        .select(
          col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events"), col("sum_value").cast("double").as("sum_value")))
  }

  // Classic SQL sessionization: gap >= 15 min starts a new session.
  private val sessionSql =
    s"""WITH marked AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      >= INTERVAL 15 MINUTE OR
       |      LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |    THEN 1 ELSE 0 END AS new_session
       |  FROM events),
       |sessions AS (
       |  SELECT user_id, ts, value,
       |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM marked)
       |SELECT user_id,
       |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       |  COUNT(*) AS n_events, ${O.dsum("value")} AS sum_value
       |FROM sessions GROUP BY user_id, session_id
       |${O.OrderAll}"""

  /** Stateful dedup within the watermark: the input is the events table
    * doubled (at-least-once delivery simulated); the operator restores
    * exactly-once. */
  def dedup(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.core.Fixtures.path(dir, "stream_dedup_in")
    val ev = Tables.load(spark, dir, "events")
    if (!graft.core.Fixtures.exists(dir, "stream_dedup_in"))
      ev.unionByName(ev).write.mode("overwrite").parquet(path)
    val deduped = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1000000)
      .parquet(path)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("event_type"), col("value"))
    ordered(runToTable(spark, deduped, "append"))
  }

  private val dedupSql =
    s"""SELECT DISTINCT event_id, event_type, value FROM events
       |${O.OrderAll}"""

  /** Arbitrary stateful processing (flatMapGroupsWithState): running
    * per-user event count + last event type, state maintained per key in
    * the state store. Deterministic last-event pick by (ts, event_id)
    * regardless of iterator order. */
  /** Streaming untruncated EWMA (α = 1/2) — the infinite-memory twin
    * `win_ewma`'s doc points here for: the recursive smoother
    * ewma_t = ½·v + ½·ewma_{t−1} needs exactly ONE double of per-key
    * state, which is a streaming fold, not a window frame (the batch
    * spelling needs either order-divergent running double products or
    * overflow-bound pow tricks — hence batch ships the truncated
    * form). The fold is ORDER-SENSITIVE, unlike every other stateful
    * key here (statefulFrom deliberately uses order-free reducers):
    * rows are sorted by (event-time, id) INSIDE each batch's group
    * iterator, and cross-batch order comes from the time-ordered file
    * source (a real deployment buffers behind the watermark to
    * reorder, exactly like `stream_late_drop`'s eviction contract).
    * Every event emits its smoothed value exactly once (update mode),
    * so the sink needs no last-emission post-aggregation.
    *
    * Oracle: a recursive CTE replays the IDENTICAL sequential fold —
    * both engines evaluate ½·v + ½·e with the same two roundings per
    * step in the same order, so the doubles match bit-for-bit with no
    * rounding fudge.
    *
    * 100 TB: per-key state is 3 scalars (ewma, last ts, last id) in
    * the state store — key-count-bounded like `stream_tws`, never
    * history-bounded; the sort is per-batch per-group, not global. */
  def ewma(spark: SparkSession, dir: String): DataFrame =
    ewmaFrom(spark, eventsStream(spark, dir))

  private[graft] def ewmaFrom(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val src = events
      .select(col("user_id"), epochUs(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
    // state = (ewma, last event-time, last id); ts == MinValue ⇔ empty
    val fn = (uid: Long, rows: Iterator[(Long, Long, Long, Double)],
        state: GroupState[(Double, Long, Long)]) => {
      var (e, ts, id) = state.getOption.getOrElse((0.0, Long.MinValue, Long.MinValue))
      val out = rows.toSeq.sortBy(r => (r._2, r._3)).map { case (_, tsUs, evId, v) =>
        e = if (ts == Long.MinValue) v else 0.5 * v + 0.5 * e
        ts = tsUs
        id = evId
        (uid, evId, tsUs, e)
      }
      state.update((e, ts, id))
      out.iterator
    }
    val out = src.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
      .toDF("user_id", "event_id", "ts_us", "ewma")
    ordered(runToTable(spark, out, "update"))
  }

  private val ewmaSql =
    s"""WITH RECURSIVE b AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, "value" AS v,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events),
       |r AS (
       |  SELECT user_id, event_id, ts_us, rn, v AS ewma FROM b WHERE rn = 1
       |  UNION ALL
       |  SELECT b.user_id, b.event_id, b.ts_us, b.rn, 0.5 * b.v + 0.5 * r.ewma
       |  FROM r JOIN b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
       |SELECT user_id, event_id, ts_us, ewma FROM r
       |${O.OrderAll}"""

  def stateful(spark: SparkSession, dir: String): DataFrame =
    statefulFrom(spark, eventsStream(spark, dir))

  /** [[stateful]] over an arbitrary (possibly multi-batch) events
    * source. Update mode emits one row per key PER BATCH the key
    * appears in; the sink is post-aggregated to each key's final
    * emission (running count n is strictly increasing per key, so
    * max-by-n selects it) — making the result invariant to how the
    * source splits into micro-batches (ADVICE r2: update-mode oracles
    * silently assumed single-batch). */
  private[graft] def statefulFrom(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val src = events
      .select(col("user_id"), epochUs(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]

    // state = (count, last ts_us, last event_id, last type)
    val fn = (uid: Long, rows: Iterator[(Long, Long, Long, String)],
        state: GroupState[(Long, Long, Long, String)]) => {
      var (n, ts, id, typ) = state.getOption.getOrElse((0L, Long.MinValue, Long.MinValue, ""))
      rows.foreach { case (_, tsUs, evId, evType) =>
        n += 1
        if (tsUs > ts || (tsUs == ts && evId > id)) { ts = tsUs; id = evId; typ = evType }
      }
      state.update((n, ts, id, typ))
      Iterator.single((uid, n, typ))
    }
    val out = src.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
      .toDF("user_id", "n_events", "last_type")
    val sink = runToTable(spark, out, "update")
    ordered(
      sink.groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("last_type"))).as("_last"))
        .select(col("user_id"), col("_last.n_events").as("n_events"),
          col("_last.last_type").as("last_type")))
  }

  private val statefulSql =
    s"""WITH last AS (
       |  SELECT user_id, event_type,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM events)
       |SELECT c.user_id, c.n_events, l.event_type AS last_type
       |FROM (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) c
       |JOIN (SELECT user_id, event_type FROM last WHERE rn = 1) l
       |  ON c.user_id = l.user_id
       |${O.OrderAll}"""

  /** Spark 4 `transformWithState` — the successor to
    * flatMapGroupsWithState: typed per-key state (ValueState) in the
    * RocksDB state store, explicit TimeMode/TTL surface. Running
    * per-user count + max(value); order-independent reducers so the
    * batch iterator order can't matter. Oracle: plain GROUP BY. */
  def tws(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // transformWithState requires the RocksDB state store provider.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val src = eventsStream(spark, dir)
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
    val out = src.groupByKey(_._1)
      .transformWithState(new UserRunningAgg(), TimeMode.None(),
        OutputMode.Update(), implicitly[org.apache.spark.sql.Encoder[(Long, Long, Double)]])
      .toDF("user_id", "n_events", "max_value")
    // post-aggregate to each key's final emission (strictly-increasing
    // n) so a multi-batch split can't leave intermediate rows behind —
    // same rationale as [[statefulFrom]].
    try {
      val sink = runToTable(spark, out, "update")
      ordered(
        sink.groupBy(col("user_id"))
          .agg(max(struct(col("n_events"), col("max_value"))).as("_last"))
          .select(col("user_id"), col("_last.n_events").as("n_events"),
            col("_last.max_value").as("max_value")))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  private val twsSql =
    s"""SELECT user_id, COUNT(*) AS n_events, max(value) AS max_value
       |FROM events GROUP BY user_id
       |${O.OrderAll}"""

  /** `foreachBatch` sink — the production escape hatch for writes the
    * built-in sinks can't express (upserts/merges into external
    * stores, multi-table fan-out): each micro-batch arrives as a BATCH
    * DataFrame the full API can touch. Driven through the multi-batch
    * source so several batches genuinely append to the target;
    * read-back aggregation proves the per-batch writes compose to
    * exactly the input (file source + AvailableNow replays nothing
    * within a run). 100 TB: this is where you'd put MERGE INTO /
    * transactional-table commits; the per-batch frame is
    * shuffle-partitioned like any batch job. */
  def foreachBatchSink(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Fixtures.path(dir, "stream_feb_out")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    // append across BATCHES is the point; append across RUNS would
    // double-count — start from a clean target every run
    rm(new java.io.File(out))
    val src = eventsStreamMultiBatch(spark, dir)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    withScratchCkpt("feb") { ckptDir =>
    val q =
      try {
        val w = src.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(out)
          }
          .trigger(Trigger.AvailableNow())
        ckptDir.foreach(d => w.option("checkpointLocation", d))
        w.start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
    lastBatchId = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
    }
    ordered(
      spark.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(money(col("value"))).as("sv"))
        .select(col("event_type"), col("n"), col("sv").cast("double").as("sum_value")))
  }

  private val foreachBatchSql =
    s"""SELECT event_type, COUNT(*) AS n, ${O.dsum("value")} AS sum_value
       |FROM events GROUP BY 1
       |${O.OrderAll}"""

  /** Per-run input-row counts of the last [[checkpointResume]] fixture
    * build (one entry per streaming run) — lets the spec assert the
    * second run picked up ONLY the late-arriving files. */
  @volatile private[graft] var resumeRunRows: Seq[Long] = Nil

  /** Checkpoint-resume incremental ingest — the streaming spelling of
    * the reference's incremental load (/root/reference/README.md:4):
    * run an `AvailableNow` file-sink query, let MORE source files
    * arrive, run it AGAIN with the SAME checkpoint. The checkpoint's
    * file log makes the second run process exactly the new files —
    * no high-water-mark bookkeeping in user code, no reprocessing, no
    * double-writes (the parquet sink's `_spark_metadata` commits files
    * atomically per batch). This is how a 100 TB landing zone is
    * drained: a scheduled Trigger.AvailableNow run per ingest cycle,
    * exactly-once by construction, restart-safe mid-run.
    *
    * The keyed result aggregates the sink table; it equals the plain
    * batch aggregate over ALL events iff no row was lost or duplicated
    * across the two runs — which is what the oracle checks. */
  def checkpointResume(spark: SparkSession, dir: String): DataFrame = {
    eventsStreamMultiBatch(spark, dir) // ensure the 6-slice fixture exists
    val mbPath = graft.core.Fixtures.path(dir, "events_stream_src_mb")
    val src = graft.core.Fixtures.path(dir, "stream_resume_src")
    val ckpt = graft.core.Fixtures.path(dir, "stream_resume_ckpt")
    val tgt = graft.core.Fixtures.path(dir, "stream_resume_tgt")
    val marker = new java.io.File(src, "_RESUME_DONE")
    if (!marker.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      Seq(src, ckpt, tgt).foreach(p => rm(new java.io.File(p)))
      new java.io.File(src).mkdirs()
      val slices = new java.io.File(mbPath).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.lastModified())
      def arrive(fs: Array[java.io.File]): Unit = fs.foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(src, f.getName).toPath)
      }
      def runOnce(): Long = {
        val q = spark.readStream.schema(Tables.events).parquet(src)
          .writeStream.format("parquet")
          .option("path", tgt).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        q.recentProgress.map(_.numInputRows).sum
      }
      arrive(slices.take(3))
      val n1 = runOnce()
      arrive(slices.drop(3))
      val n2 = runOnce()
      resumeRunRows = Seq(n1, n2)
      marker.createNewFile()
    }
    ordered(
      spark.read.parquet(tgt)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(money(col("value"))).as("sv"))
        .select(col("event_type"), col("n"),
          col("sv").cast("double").as("sum_value")))
  }

  /** Stream-stream inner join with a time-range condition: each
    * purchase joined to the same user's views in the preceding 30
    * minutes. Both sides keep watermarked state; the range condition
    * bounds how long a view must be retained. Bounded input → every
    * match emits in append mode. */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 hour")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
      .withWatermark("v_ts", "1 hour")
    val joined = purchases.join(views,
      col("user_id") === col("v_uid") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("v_ts") <= col("p_ts"))
      .select(col("user_id"), col("p_id"), col("v_id"),
        epochUs(col("p_ts")).as("p_us"), epochUs(col("v_ts")).as("v_us"))
    ordered(runToTable(spark, joined, "append"))
  }

  private val streamJoinSql =
    s"""SELECT p.user_id, p.event_id AS p_id, v.event_id AS v_id,
       |  epoch_us(p.ts) AS p_us, epoch_us(v.ts) AS v_us
       |FROM events p JOIN events v
       |  ON p.event_type = 'purchase' AND v.event_type = 'view'
       | AND v.user_id = p.user_id
       | AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts <= p.ts
       |${O.OrderAll}"""

  /** Late-data DROP, driver-gate-proven, on the stateful operator that
    * actually drops: streaming dedup. (Windowed AGGREGATION never drops
    * late rows — it re-opens evicted state; measured here before this
    * key settled on dedup.) The three-phase source delivers 1/5 of the
    * events two batches after the bulk; those rows sit below the
    * watermark and the dedup operator discards them on input
    * (`numRowsDroppedByWatermark`).
    *
    * Timing subtlety the oracle must replay (pinned empirically on
    * this engine build): the late-row data filter in batch N uses the
    * watermark DISPLAYED during batch N−1 — i.e. the value computed at
    * the end of batch N−2 — one batch behind the eviction watermark. A
    * 12:15 row arriving under a displayed 12:30 watermark survives if
    * the previous batch displayed 11:30. Hence: batch 2's filter =
    * `max(file-0 ts) − 30 min` exactly — file 1's contribution is not
    * yet in effect — which is what the oracle computes. The dropped
    * rows are data loss you OPTED INTO by bounding state; this key
    * prices it at the correctness gate instead of leaving it folklore.
    *
    * 100 TB: the drop gate is what caps dedup state at
    * (watermark delay × key arrival rate) instead of stream length. */
  def streamLateDrop(spark: SparkSession, dir: String): DataFrame = {
    val dedup = eventsStreamThreePhase(spark, dir)
      .withWatermark("ts", "30 minutes")
      .dropDuplicates("event_id", "ts")
      .select(col("event_id"), epochUs(col("ts")).as("ts_us"),
        col("event_type"))
    ordered(runToTable(spark, dedup, "append"))
  }

  private val streamLateDropSql =
    s"""WITH wm AS (
       |  SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events
       |  WHERE event_id % 5 <> 0 AND event_id % 5 <> 2)
       |SELECT event_id, epoch_us(ts) AS ts_us, event_type
       |FROM events
       |WHERE event_id % 5 <> 0
       |   OR ts >= (SELECT w FROM wm)
       |${O.OrderAll}"""

  /** LEFT OUTER stream-stream join — the semantics corner inner joins
    * dodge: an unmatched left row can only emit its null-padded result
    * once the watermark proves no matching right row can still arrive
    * (v_ts ≤ p_ts ⇒ closable when watermark passes p_ts). So the
    * output is watermark-DEPENDENT: purchases newer than
    * `min(max p_ts, max v_ts) − 1 h` stay open in the state store and
    * emit nothing — the oracle replays exactly that gate (matched rows
    * always; null rows only where `p_ts <` the final watermark). The
    * final no-data micro-batch (Trigger.AvailableNow) is what flushes
    * the closable state; a `processAllAvailable`-only run would leave
    * the nulls unemitted.
    *
    * 100 TB: identical state shape to the inner join — both sides
    * keyed by user_id in the state store, retention bounded by the
    * range condition + watermark; outer adds no extra state, only the
    * eviction-time null emission. */
  def streamJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 hour")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
      .withWatermark("v_ts", "1 hour")
    val joined = purchases.join(views,
      col("user_id") === col("v_uid") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("v_ts") <= col("p_ts"),
      "left_outer")
      .select(col("user_id"), col("p_id"), col("v_id"),
        epochUs(col("p_ts")).as("p_us"), epochUs(col("v_ts")).as("v_us"))
    ordered(runToTable(spark, joined, "append"))
  }

  private val streamJoinOuterSql =
    s"""WITH wm AS (
       |  SELECT least(
       |    (SELECT max(ts) FROM events WHERE event_type = 'purchase'),
       |    (SELECT max(ts) FROM events WHERE event_type = 'view'))
       |    - INTERVAL 1 HOUR AS w)
       |SELECT p.user_id, p.event_id AS p_id, v.event_id AS v_id,
       |  epoch_us(p.ts) AS p_us, epoch_us(v.ts) AS v_us
       |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
       |  ON v.user_id = p.user_id
       | AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts <= p.ts
       |WHERE v.event_id IS NOT NULL OR p.ts < (SELECT w FROM wm)
       |${O.OrderAll}"""

  /** Stream-STATIC enrichment join — the missing third member of the
    * streaming-join family (inner and outer stream-stream above): the
    * events stream joined to the static `customer` dimension. Unlike a
    * stream-stream join this is STATELESS — no watermark, no state
    * store, nothing to evict: each micro-batch independently joins its
    * rows against the dim table, so every stream row emits exactly
    * once and none is held back by a watermark gate (the batch oracle
    * is the plain join, no watermark clause — compare
    * [[streamJoinOuter]]'s gated oracle).
    *
    * 100 TB: this is the dominant enrich shape — fact stream ⋈ dim.
    * The dim side is broadcast, so the unbounded side never shuffles;
    * and because the static side is re-planned per micro-batch, a dim
    * table updated in place (SCD1 upsert, [[graft.etl.Etl]]) is
    * picked up on the next batch without restarting the query. */
  /** The enrich pipeline over any events stream source — split out so
    * StreamingSpec can drive it with the multi-batch source and prove
    * the output is micro-batch-split invariant (the statelessness
    * claim, tested rather than asserted). */
  private[graft] def staticEnrich(spark: SparkSession, dir: String,
      ev: DataFrame): DataFrame = {
    val dim = broadcast(Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey")))
    val joined = ev.filter(col("event_type") === "purchase")
      .join(dim, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_mktsegment"),
        col("c_nationkey"), epochUs(col("ts")).as("ts_us"))
    ordered(runToTable(spark, joined, "append"))
  }

  def streamStaticJoin(spark: SparkSession, dir: String): DataFrame =
    staticEnrich(spark, dir, eventsStream(spark, dir))

  private val streamStaticJoinSql =
    s"""SELECT e.event_id, e.user_id, c.c_mktsegment, c.c_nationkey,
       |  epoch_us(e.ts) AS ts_us
       |FROM events e JOIN customer c ON e.user_id = c.c_custkey
       |WHERE e.event_type = 'purchase'
       |${O.OrderAll}"""

  /** Misra–Gries heavy hitters AS STREAMING STATE — the top-k-over-an-
    * unbounded-stream primitive (the sketch is one-pass by nature, so
    * it IS the streaming algorithm; the batch twin is
    * `agg_heavy_hitters`). Keys are hash-SHARDED across 8 state-store
    * groups, each `flatMapGroupsWithState` group folding its batch
    * iterator into a ≤32-entry [[graft.functions.Udafs.MisraGries]]
    * summary — state stays fixed-size per shard forever, the property
    * that makes a sketch viable as STREAMING state (an exact counter
    * map would grow with the key universe; at 100 TB/day of tail keys
    * that is the state-store OOM).
    *
    * Correctness under sharding AND iterator order: every occurrence
    * of a key lands in ONE shard (hash sharding), so per-key truth is
    * in-shard truth, the per-shard error mass N_shard/(k+1) ≤ N/(k+1),
    * and all three MG invariants hold A FORTIORI at the global bound —
    * regardless of intra-batch iterator order (the guarantee is
    * fold-order-independent, the reason the booleans are pinnable).
    *
    * Update-mode emissions: state carries a strictly-increasing
    * rows-processed counter; the final per-shard summary is selected
    * max-by-counter (the [[statefulFrom]] multi-batch convention).
    * Final summaries are EXPLODED and probe-joined relationally — no
    * driver collect anywhere. Probes + invariants mirror the batch
    * twin; same oracle shape. */
  /** Heavy-hitter sharding constants — shared with the StreamingSpec
    * state-size pin (single-definition rule): state is keyed by shard,
    * so the store holds exactly ≤ [[HhShards]] rows forever. */
  private[graft] val HhShards = 8
  private[graft] val HhK = 32

  def streamHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val K = HhK
    val Shards = HhShards
    val mg = new graft.functions.Udafs.MisraGries(K)
    val keyed = eventsStreamMultiBatch(spark, dir)
      .select(graft.functions.Udafs.HeavyKey.column.as("key"))
      .select(pmod(xxhash64(col("key")), lit(Shards)).as("shard"), col("key"))
      .as[(Long, String)]
    val fn = (shard: Long, rows: Iterator[(Long, String)],
        state: GroupState[(Long, Map[String, Long])]) => {
      var (nRows, s) = state.getOption.getOrElse((0L, Map.empty[String, Long]))
      rows.foreach { case (_, k) => s = mg.reduce(s, k); nRows += 1 }
      state.update((nRows, s))
      Iterator.single((shard, nRows, s))
    }
    val out = keyed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
      .toDF("shard", "n_rows", "summary")
    val sink = runToTable(spark, out, "update")
    // final emission per shard; shards' key sets are disjoint, so the
    // union of their summaries needs no cross-shard merge
    val est = sink
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("n_rows").desc)))
      .filter(col("_rn") === 1)
      .select(explode(col("summary")).as(Seq("key", "_est")))
    val events = Tables.load(spark, dir, "events")
    val n = events.count()
    val bound = n / (K + 1)
    val probes = Seq("signup", "error", "click", "view", "purchase",
      "t1", "t2", "t5", "t9", "t4")
    val exact = events
      .select(graft.functions.Udafs.HeavyKey.column.as("key"))
      .filter(col("key").isin(probes: _*))
      .groupBy(col("key")).agg(count(lit(1)).as("true_n"))
    val probeDf = probes.toDF("probe_key")
    ordered(probeDf
      .join(exact, probeDf("probe_key") === exact("key"), "left_outer")
      .join(est, probeDf("probe_key") === est("key"), "left_outer")
      .select(col("probe_key"),
        coalesce(col("true_n"), lit(0L)).as("true_n"),
        (coalesce(col("_est"), lit(0L)) <= coalesce(col("true_n"), lit(0L)))
          .as("underestimate_ok"),
        (coalesce(col("_est"), lit(0L)) >=
          coalesce(col("true_n"), lit(0L)) - lit(bound)).as("lower_bound_ok"),
        (coalesce(col("true_n"), lit(0L)) <= lit(bound) || col("_est").isNotNull)
          .as("covered_ok")))
  }

  private val streamHeavyHittersSql =
    s"""WITH keyed AS (
       |  SELECT ${graft.functions.Udafs.HeavyKey.sql} AS key FROM events),
       |probes AS (SELECT unnest(['signup','error','click','view',
       |  'purchase','t1','t2','t5','t9','t4']) AS probe_key),
       |exact AS (
       |  SELECT key AS probe_key, COUNT(*) AS true_n FROM keyed
       |  WHERE key IN ('signup','error','click','view','purchase',
       |    't1','t2','t5','t9','t4')
       |  GROUP BY 1)
       |SELECT p.probe_key, COALESCE(e.true_n, 0) AS true_n,
       |  TRUE AS underestimate_ok, TRUE AS lower_bound_ok,
       |  TRUE AS covered_ok
       |FROM probes p LEFT JOIN exact e ON e.probe_key = p.probe_key
       |${O.OrderAll}"""

  def anomaly(spark: SparkSession, dir: String): DataFrame =
    anomalyFrom(spark, eventsStream(spark, dir))

  /** Streaming 3σ anomaly detection — Welford's online mean/variance
    * (Welford 1962; Knuth TAOCP §4.2.2) as THREE doubles of per-key
    * state (n, mean, M2): each event is judged against the statistics
    * of its own history BEFORE being folded in (|v−μ| > 3σ once ≥ 10
    * observations exist — the monitoring-stack alert rule
    * `win_anomaly` computes in batch frames, here with UNBOUNDED
    * history at O(1) state). Like `stream_ewma` this is an
    * order-sensitive sequential fold: in-batch sort by (event-time,
    * id), time-ordered source across batches. Oracle: a recursive CTE
    * replaying the IDENTICAL fold — same (v−μ)/(n+1) increment, same
    * M2 += (v−μ_old)(v−μ_new) product, in the same order ⇒ bit-exact
    * doubles, so the z-scores ship UNROUNDED (zero rounding fudge).
    * z is NULL while warming up and when the history is constant
    * (M2 = 0 — the flag still fires there: any deviation from a
    * constant history is anomalous). */
  private[graft] def anomalyFrom(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val src = events
      .select(col("user_id"), epochUs(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
    val minN = 10
    // state = (n, mean, M2); n == 0 ⇔ empty
    val fn = (uid: Long, rows: Iterator[(Long, Long, Long, Double)],
        state: GroupState[(Long, Double, Double)]) => {
      var (n, mean, m2) = state.getOption.getOrElse((0L, 0.0, 0.0))
      val out = rows.toSeq.sortBy(r => (r._2, r._3)).map { case (_, tsUs, evId, v) =>
        val (flag, z) =
          if (n >= minN) {
            val sd = math.sqrt(m2 / (n - 1))
            (Some(math.abs(v - mean) > 3 * sd),
              if (m2 != 0.0) Some((v - mean) / sd) else None)
          } else (None, None)
        if (n == 0) { n = 1; mean = v; m2 = 0.0 }
        else {
          val d1 = v - mean
          val newMean = mean + d1 / (n + 1)
          m2 = m2 + d1 * (v - newMean)
          mean = newMean
          n += 1
        }
        (uid, evId, tsUs, flag, z)
      }
      state.update((n, mean, m2))
      out.iterator
    }
    val out = src.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
      .toDF("user_id", "event_id", "ts_us", "is_anomaly", "z")
    ordered(runToTable(spark, out, "update"))
  }

  private val anomalySql =
    s"""WITH RECURSIVE b AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, "value" AS v,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events),
       |r AS (
       |  SELECT user_id, event_id, ts_us, rn, v,
       |    CAST(1 AS BIGINT) AS n, v AS mean, CAST(0.0 AS DOUBLE) AS m2,
       |    CAST(NULL AS BOOLEAN) AS is_anomaly, CAST(NULL AS DOUBLE) AS z
       |  FROM b WHERE rn = 1
       |  UNION ALL
       |  SELECT b.user_id, b.event_id, b.ts_us, b.rn, b.v,
       |    r.n + 1,
       |    r.mean + (b.v - r.mean) / (r.n + 1),
       |    r.m2 + (b.v - r.mean)
       |      * (b.v - (r.mean + (b.v - r.mean) / (r.n + 1))),
       |    CASE WHEN r.n >= 10
       |      THEN abs(b.v - r.mean) > 3 * sqrt(r.m2 / (r.n - 1)) END,
       |    CASE WHEN r.n >= 10 AND r.m2 <> 0
       |      THEN (b.v - r.mean) / sqrt(r.m2 / (r.n - 1)) END
       |  FROM r JOIN b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
       |SELECT user_id, event_id, ts_us, is_anomaly, z FROM r
       |${O.OrderAll}"""

  def cusum(spark: SparkSession, dir: String): DataFrame =
    cusumFrom(spark, eventsStream(spark, dir))

  private[graft] val CusumDrift = 6000L  // cents allowed per event
  private[graft] val CusumAlarm = 30000L // accumulated excess that pages

  /** Streaming one-sided CUSUM change detection (Page 1954) — the
    * classic "has the MEAN shifted" monitor next to `stream_anomaly`'s
    * per-event outlier rule: s_t = max(0, s_{t−1} + (v_t − k)) with
    * drift allowance k, alarm at s > h. Sustained drift accumulates
    * where a 3σ rule sees nothing; single spikes decay. ONE long of
    * per-key state, and — unlike the double-state folds — the entire
    * recurrence is exact INTEGER arithmetic on cents, so the
    * recursive-CTE oracle replay is exact by construction, not by
    * mirrored rounding. Same ordered-fold contract as `stream_ewma`. */
  private[graft] def cusumFrom(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val src = events
      .select(col("user_id"), epochUs(col("ts")).as("ts_us"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .as[(Long, Long, Long, Long)]
    val fn = (uid: Long, rows: Iterator[(Long, Long, Long, Long)],
        state: GroupState[Long]) => {
      var s = state.getOption.getOrElse(0L)
      val out = rows.toSeq.sortBy(r => (r._2, r._3)).map { case (_, tsUs, evId, c) =>
        s = math.max(0L, s + (c - CusumDrift))
        (uid, evId, tsUs, s, s > CusumAlarm)
      }
      state.update(s)
      out.iterator
    }
    val out = src.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
      .toDF("user_id", "event_id", "ts_us", "cusum", "alarm")
    ordered(runToTable(spark, out, "update"))
  }

  private val cusumSql =
    s"""WITH RECURSIVE b AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |    CAST(floor("value" * 100 + 0.5) AS BIGINT) AS c,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events),
       |r AS (
       |  SELECT user_id, event_id, ts_us, rn,
       |    GREATEST(0, c - $CusumDrift) AS cusum
       |  FROM b WHERE rn = 1
       |  UNION ALL
       |  SELECT b.user_id, b.event_id, b.ts_us, b.rn,
       |    GREATEST(0, r.cusum + b.c - $CusumDrift)
       |  FROM r JOIN b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
       |SELECT user_id, event_id, ts_us, cusum,
       |  cusum > $CusumAlarm AS alarm
       |FROM r
       |${O.OrderAll}"""

  /** Streaming CDC materialization — the change stream (snapshot,
    * then updates/inserts, then delete tombstones, one micro-batch per
    * _seq epoch via pinned-mtime slices) applied INCREMENTALLY into a
    * keyed state: per key, keep the highest-_seq record seen so far
    * (ONE row of state per key — the materialized view, not the
    * history), tombstones survive as state so a late lower-seq row can
    * never resurrect a deleted key. The final table filters tombstones
    * out. Shares [[graft.etl.Etl.cdcChangeSet]] AND the batch oracle
    * with `etl_cdc_apply` — the streaming spelling must converge to
    * exactly the batch winner-per-key rule, which is the whole
    * correctness claim of incremental materialization. */
  def cdcApplyStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // parameter-keyed on the change-set's insert offset (1e10): the
    // fixture derives from cdcChangeSet, so a derivation change must
    // invalidate it (the scan_skipping staleness lesson, r11 ADVICE)
    val fixture = "cdc_stream_src_o1e10"
    val path = graft.core.Fixtures.path(dir, fixture)
    graft.core.Fixtures.buildAtomic(dir, fixture) { tmpPath =>
      val all = graft.etl.Etl.cdcChangeSet(spark, dir)
      val dirFile = new java.io.File(tmpPath)
      var known = Set.empty[String]
      for (s <- 0L to 2L) {
        all.filter(col("_seq") === s)
          .coalesce(1).write.mode("append").parquet(tmpPath)
        val fresh = dirFile.listFiles().filter(f =>
          f.getName.startsWith("part-") && !known.contains(f.getName))
        fresh.foreach(_.setLastModified(1600000000000L + s * 60000L))
        known ++= fresh.map(_.getName)
      }
    }
    val changes = spark.readStream
      .schema("c_custkey BIGINT, c_name STRING, c_mktsegment STRING, _seq BIGINT, _op STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(path)
      .as[(Long, String, String, Long, String)]
    // state = the current winner (seq, op, name, segment) per key
    val fn = (key: Long, rows: Iterator[(Long, String, String, Long, String)],
        state: GroupState[(Long, String, String, String)]) => {
      var cur = state.getOption.getOrElse((-1L, "", null: String, null: String))
      rows.foreach { case (_, name, seg, seq, op) =>
        if (seq > cur._1) cur = (seq, op, name, seg)
      }
      state.update(cur)
      Iterator.single((key, cur._1, cur._2, cur._3, cur._4))
    }
    val out = changes.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
      .toDF("c_custkey", "_seq", "_op", "c_name", "c_mktsegment")
    val sink = runToTable(spark, out, "update")
    // update mode re-emits a key's winner each batch it appears in;
    // the final state is the max-_seq emission (same post-aggregation
    // contract as `stream_stateful`)
    ordered(
      sink.groupBy(col("c_custkey"))
        .agg(max(struct(col("_seq"), col("_op"), col("c_name"),
          col("c_mktsegment"))).as("_w"))
        .filter(col("_w._op") =!= "D")
        .select(col("c_custkey"), col("_w.c_name").as("c_name"),
          col("_w.c_mktsegment").as("c_mktsegment")))
  }

  val queries: Map[String, Q] = Map(
    "stream_cusum" -> Q(cusum _, cusumSql),
    "stream_cdc_apply" -> Q(cdcApplyStream _, graft.etl.Etl.cdcApplySql),
    "stream_anomaly" -> Q(anomaly _, anomalySql),
    "stream_heavy_hitters" -> Q(streamHeavyHitters _, streamHeavyHittersSql),
    "stream_join" -> Q(streamJoin _, streamJoinSql),
    "stream_join_outer" -> Q(streamJoinOuter _, streamJoinOuterSql),
    "stream_static_join" -> Q(streamStaticJoin _, streamStaticJoinSql),
    "stream_late_drop" -> Q(streamLateDrop _, streamLateDropSql),
    "stream_tws" -> Q(tws _, twsSql),
    "stream_tumbling" -> Q(tumbling _, tumblingSql),
    "stream_tumbling_append" -> Q(tumblingAppend _, tumblingAppendSql),
    "stream_tumbling_append_mb" -> Q(tumblingAppendMb _, tumblingAppendSql),
    "stream_foreach_batch" -> Q(foreachBatchSink _, foreachBatchSql),
    "stream_checkpoint_resume" -> Q(checkpointResume _, foreachBatchSql),
    "stream_sliding" -> Q(sliding _, slidingSql),
    "stream_session" -> Q(session _, sessionSql),
    "stream_dedup" -> Q(dedup _, dedupSql),
    "stream_stateful" -> Q(stateful _, statefulSql),
    "stream_ewma" -> Q(ewma _, ewmaSql)
  )
}
