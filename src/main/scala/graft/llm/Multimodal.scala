package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}
import graft.core.Determinism._

/** Multimodal-column plumbing (SURVEY.md §2.11 / north star): treat
  * media as opaque `binary` columns with typed metadata, decoded by a
  * partition-local pass.
  *
  * This sandbox ships no image/audio codecs, so [[StubDecoder.decode]]
  * is an explicitly-marked deterministic FAKE — what is real (and
  * tested) is every piece a production decoder drops into:
  *  - the schema contract: (id, payload: binary, meta: struct);
  *  - `mapPartitions` batching (decoder state initialized once per
  *    partition, not per row — the JVM analogue of `mapInPandas`);
  *  - the fixed-width feature-vector output feeding the similarity
  *    operators above.
  *
  * 100 TB notes: decode is embarrassingly parallel (no shuffle); the
  * pattern to keep is per-partition decoder reuse — codec init is the
  * expensive part, so `mapPartitions`, never a per-row UDF. Payload
  * bytes should live in their own parquet column chunk so metadata-only
  * queries never read them (columnar pruning does this for free).
  */
object Multimodal {

  /** One decoded media row. */
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Int,
      features: Array[Float])

  /** Deterministic stand-in for a real codec (??? in production terms:
    * replace with e.g. JPEG decode + model forward pass). Produces a
    * 4-dim "feature vector" from byte statistics so tests can pin exact
    * values. */
  object StubDecoder {
    def decode(payload: Array[Byte]): Array[Float] = {
      var sum = 0L
      var min = 255
      var max = 0
      payload.foreach { b =>
        val u = b & 0xff
        sum += u
        if (u < min) min = u
        if (u > max) max = u
      }
      val n = math.max(payload.length, 1)
      Array(payload.length.toFloat, (sum.toDouble / n).toFloat,
        min.toFloat, max.toFloat)
    }
  }

  /** Partition-local decode pass over (id, payload) rows. */
  def decodeFeatures(spark: SparkSession,
      media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init goes here (codec contexts, model
        // sessions) — reused across the whole partition.
        rows.map { case (id, payload) =>
          MediaFeatures(id, "text/plain", payload.length,
            StubDecoder.decode(payload))
        }
      }
  }

  /** Driver-contract query: documents' text bytes as the stand-in
    * payload → partition-local decode → flat feature columns.
    *
    * Oracled exactly (since r5): the corpus is pure ASCII, so every
    * payload byte IS the character's code point and DuckDB can replay
    * the whole byte fold — length via octet_length, min/max/mean via a
    * char-split + unicode() list fold. f_mean is double-divided then
    * rounded ONCE to float32 on both engines (IEEE ⇒ bit-identical)
    * before the 6-digit presentation round. The decode itself still
    * runs the real partition-local `mapPartitions` path — the oracle
    * verifies its output, it does not replace it. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    val media = Tables.load(spark, dir, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    ordered(
      decodeFeatures(spark, media).toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          col("features")(0).cast("long").as("f_len"),
          round6(col("features")(1).cast("double")).as("f_mean"),
          col("features")(2).cast("int").as("f_min"),
          col("features")(3).cast("int").as("f_max")))
  }

  /** One sampled frame's features. */
  final case class FrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      mean_raw: Float,
      f_min: Int,
      f_max: Int)

  /** Frame sampling — the ONE-TO-MANY multimodal shape
    * ([[decodeFeatures]] is 1-to-1): a media blob explodes into its
    * sampled frames, each decoded independently. Frames are the
    * `frameBytes`-aligned full slices of the payload (trailing partial
    * frame dropped, as a fixed-size codec would); stride sampling
    * keeps every `stride`-th frame starting at 0 — the deterministic
    * skeleton of video keyframe extraction.
    *
    * 100 TB notes: the explode happens INSIDE `mapPartitions`, so only
    * one frame's bytes are materialized at a time per row (an
    * `explode(split(payload))` spelling would build every frame of a
    * blob as one giant array row first); no shuffle — output stays
    * partitioned by the input's file splits, and downstream per-frame
    * ops (embed, dedup) group on (doc_id, frame_idx) keys that are
    * already dense. Frame decode reuses the per-partition decoder
    * init, same as the 1-to-1 path. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int, stride: Int): Dataset[FrameFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val nFrames = payload.length / frameBytes
          Iterator.range(0, nFrames, stride).map { i =>
            val feats = StubDecoder.decode(java.util.Arrays.copyOfRange(
              payload, i * frameBytes, (i + 1) * frameBytes))
            FrameFeatures(id, i, feats(1), feats(2).toInt, feats(3).toInt)
          }
        }
      }
  }

  /** Driver-contract query: 64-byte frames, every 2nd sampled. Docs
    * shorter than one frame contribute no rows (the flatMap drops
    * them) — the oracle's `range(0, n_frames, 2)` empties identically.
    * Mean determinism: frame sums divide by 64 (a power of two —
    * exact in binary floating point), then one float round, as in
    * [[multimodalDecode]]. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val media = Tables.load(spark, dir, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    ordered(
      sampleFrames(spark, media, frameBytes = 64, stride = 2).toDF()
        .select(col("doc_id"), col("frame_idx"),
          round6(col("mean_raw").cast("double")).as("f_mean"),
          col("f_min"), col("f_max")))
  }

  /** UNIT COUPLING (r6/r7 advice): this SQL is single-unit — frame
    * count AND slices both derive from CHARACTERS (`length` // 64,
    * `substring` + `unicode` code points; r7 advice closed the
    * internal inconsistency where n_frames divided `octet_length`
    * bytes while slices took chars). The Scala path slices the UTF-8
    * BYTE payload; the two engines agree iff the corpus is pure ASCII
    * (byte i == char i, code point == byte value) — an invariant
    * `llm_multimodal_decode` relies on identically and MultimodalSpec
    * asserts against the fixture corpus ("corpus is pure ASCII").
    * A non-ASCII corpus needs both engines re-derived from ONE unit
    * (e.g. both over the byte array). */
  private val frameSampleSql = {
    val pts = "list_transform(regexp_split_to_array(" +
      "substring(text, CAST(i AS INT) * 64 + 1, 64), ''), x -> unicode(x))"
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |    length(text) // 64 AS n_frames
       |  FROM documents)
       |SELECT doc_id, CAST(i AS INT) AS frame_idx,
       |  round(CAST(CAST(CAST(list_aggregate($pts, 'sum') AS DOUBLE)
       |    / 64 AS FLOAT) AS DOUBLE), 6) AS f_mean,
       |  CAST(list_aggregate($pts, 'min') AS INT) AS f_min,
       |  CAST(list_aggregate($pts, 'max') AS INT) AS f_max
       |FROM f, UNNEST(range(0, n_frames, 2)) AS t(i)
       |ORDER BY ALL NULLS FIRST"""
  }

  private val multimodalDecodeSql = {
    val pts = "list_transform(regexp_split_to_array(text, ''), x -> unicode(x))"
    s"""SELECT doc_id, 'text/plain' AS mime,
       |  octet_length(encode(text)) AS n_bytes,
       |  octet_length(encode(text)) AS f_len,
       |  round(CAST(CAST(CAST(list_aggregate($pts, 'sum') AS DOUBLE)
       |    / octet_length(encode(text)) AS FLOAT) AS DOUBLE), 6) AS f_mean,
       |  list_aggregate($pts, 'min') AS f_min,
       |  list_aggregate($pts, 'max') AS f_max
       |FROM documents
       |ORDER BY ALL NULLS FIRST"""
  }

  val queries: Map[String, Q] = Map(
    "llm_multimodal_decode" -> Q(multimodalDecode _, multimodalDecodeSql),
    "llm_frame_sample" -> Q(frameSample _, frameSampleSql)
  )
}
