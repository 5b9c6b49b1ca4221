package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.core.{Q, Tables}
import graft.core.Determinism._
import graft.core.{OracleDsl => O}
import graft.functions.DotProduct

/** SURVEY.md §2.11 — similarity search over embeddings + multimodal
  * join (north star, BASELINE.json).
  *
  * 100 TB notes:
  *  - `llm_simsearch` is brute-force top-k: corpus ⋈ broadcast(probes),
  *    per-partition ranking — exact, O(corpus × probes). Fine when the
  *    probe set is small; the per-probe window is the
  *    TakeOrderedAndProject pattern, never a global materialized
  *    cross product.
  *  - `llm_simsearch_lsh` is the scale path: sign-random-projection
  *    buckets (deterministic hyperplanes) shrink the candidate set to
  *    same-bucket vectors, trading recall for a ~2^bits fan-in cut.
  *    The bucketing is a plain groupBy — shuffle O(n), not O(n²).
  *  - `llm_cosine_dedup` mirrors MinHash-LSH for the embedding space;
  *    the brute pair join is the test-scale oracle ground truth.
  */
object Similarity {

  private def emb(s: SparkSession, d: String) = Tables.load(s, d, "embeddings")

  /** Sequential-order dot product of two float vectors in double math —
    * mirrors the oracle's list_dot_product over DOUBLE[] casts. The
    * codegen'd [[DotProduct]] expression is bit-identical to this HOF
    * spelling (asserted in ScalaTest) and ~8x faster on pair joins; the
    * HOF stays here as the readable reference. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Codegen'd dot product via the registered `dot_product` function
    * (Spark 4 hides the Column→Expression bridge, so custom expressions
    * go through the function registry + `expr`). Callers must
    * [[DotProduct.register]] on the session first. */
  private def dot(a: String, b: String): Column = expr(s"dot_product($a, $b)")

  private def norm(a: String): Column = sqrt(dot(a, a))

  private val oracleCos =
    "list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) / " +
      "(sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[]))) * " +
      "sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))"

  /** Brute-force cosine top-5 for 10 fixed probes. Ranking is on the
    * rounded score with vec_id tiebreak so both engines rank
    * identically. */
  def simsearch(spark: SparkSession, dir: String): DataFrame = {
    DotProduct.register(spark)
    // norms computed once per vector (n ops), not once per pair (n*k).
    val e = emb(spark, dir).withColumn("nrm", norm("embedding"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"),
        col("nrm").as("probe_nrm"))
    val scored = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("score",
        round6(dot("probe_emb", "embedding") /
          (col("probe_nrm") * col("nrm"))))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    ordered(
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("probe_id"), col("vec_id"), col("score"), col("rn")))
  }

  private val simsearchSql =
    s"""SELECT probe_id, vec_id, score, rn FROM (
       |  SELECT p.vec_id AS probe_id, c.vec_id,
       |    round($oracleCos, 6) AS score,
       |    ROW_NUMBER() OVER (PARTITION BY p.vec_id
       |      ORDER BY round($oracleCos, 6) DESC, c.vec_id ASC) AS rn
       |  FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
       |  WHERE p.vec_id < 10)
       |WHERE rn <= 5
       |${O.OrderAll}"""

  private val LshBits = 8

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed hash folded to [-1, 1). */
  private def planeComponent(p: Int, i: Int): Double =
    ((Dedup.fnv1a(s"plane_${p}_dim_$i") % 1000003L).toDouble / 1000003.0)

  /** ANN via sign-random-projection LSH: 8 deterministic hyperplanes →
    * 256 buckets; probes only score candidates in their own bucket.
    * Approximate by design → no SQL oracle; ScalaTest measures recall
    * against `llm_simsearch`. */
  def simsearchLsh(spark: SparkSession, dir: String): DataFrame = {
    val planes: Array[Array[Double]] =
      Array.tabulate(LshBits, 64)((p, i) => planeComponent(p, i))
    val bucketOf = udf { (v: Seq[Float]) =>
      var bucket = 0
      var p = 0
      while (p < LshBits) {
        var s = 0.0
        var i = 0
        while (i < 64 && i < v.length) { s += planes(p)(i) * v(i); i += 1 }
        if (s > 0) bucket |= (1 << p)
        p += 1
      }
      bucket
    }
    DotProduct.register(spark)
    val e = emb(spark, dir).withColumn("bucket", bucketOf(col("embedding")))
      .withColumn("nrm", norm("embedding"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"),
        col("bucket"), col("nrm").as("probe_nrm"))
    val scored = e.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("score",
        round6(dot("probe_emb", "embedding") /
          (col("probe_nrm") * col("nrm"))))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    ordered(
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("probe_id"), col("vec_id"), col("score"), col("rn")))
  }

  /** Embedding near-dup: all pairs with cosine ≥ 0.5 (threshold is a
    * parameter; the synthetic embeddings carry no planted dups, so a
    * production 0.95 cut would be vacuously empty here). Brute O(n²)
    * at test scale — the LSH bucketing above is the 100 TB path. */
  def cosineDedup(spark: SparkSession, dir: String): DataFrame = {
    DotProduct.register(spark)
    val withNorm = emb(spark, dir).withColumn("nrm", norm("embedding"))
    val a = withNorm.select(col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = withNorm.select(col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    ordered(
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cos",
          round6(dot("emb_a", "emb_b") / (col("nrm_a") * col("nrm_b"))))
        .filter(col("cos") >= 0.5)
        .select(col("id_a"), col("id_b"), col("cos")))
  }

  private val cosineDedupSql =
    s"""SELECT p.vec_id AS id_a, c.vec_id AS id_b,
       |  round($oracleCos, 6) AS cos
       |FROM embeddings p JOIN embeddings c ON p.vec_id < c.vec_id
       |WHERE round($oracleCos, 6) >= 0.5
       |${O.OrderAll}"""

  /** Multimodal row: text + embedding + an opaque binary payload in one
    * schema. The binary column stands in for image/audio bytes (none in
    * this sandbox — SURVEY.md §2.11): real pipelines would decode it in
    * a partition-local pass; here the "decode" is byte-length + the
    * deterministic metadata a decoder would attach. */
  def multimodal(spark: SparkSession, dir: String): DataFrame = {
    DotProduct.register(spark)
    val d = Tables.load(spark, dir, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val e = emb(spark, dir)
    ordered(
      d.join(e, col("doc_id") === col("vec_id"))
        .select(
          col("doc_id"), col("lang"), col("source"),
          floor(col("n_chars") / 100).as("size_bucket"),
          length(col("payload")).as("n_bytes"),
          round6(norm("embedding")).as("vec_norm"),
          col("label")))
  }

  private val multimodalSql =
    s"""SELECT doc_id, lang, source,
       |  CAST(floor(n_chars / 100) AS BIGINT) AS size_bucket,
       |  octet_length(encode(text)) AS n_bytes,
       |  round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |    CAST(embedding AS DOUBLE[]))), 6) AS vec_norm,
       |  label
       |FROM documents JOIN embeddings ON doc_id = vec_id
       |${O.OrderAll}"""

  val queries: Map[String, Q] = Map(
    "llm_simsearch" -> Q(simsearch _, simsearchSql),
    "llm_simsearch_lsh" -> Q.noOracle(simsearchLsh _),
    "llm_cosine_dedup" -> Q(cosineDedup _, cosineDedupSql),
    "llm_multimodal" -> Q(multimodal _, multimodalSql)
  )
}
