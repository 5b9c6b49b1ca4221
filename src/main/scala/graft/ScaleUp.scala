package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-factor amplifier: `runMain graft.ScaleUp
  * <srcDir> <dstDir> [factor=10]` reads the driver-generated tables at
  * one scale factor and writes a `factor`× corpus that is
  * *statistically faithful* — per-capita join fan-outs, duplicate
  * rates, gate selectivities, and similarity structure all match the
  * source, so per-query runtime growth measures the ENGINE's scaling,
  * not an artifact of naive row copying.
  *
  * Design: the output is `factor` key-disjoint shards, each an
  * isomorphic image of the source corpus ("iid scale-up" — exactly
  * what a 10× crawl looks like statistically). Naive replication
  * would instead multiply every duplicate cluster by `factor` (pair
  * counts ×factor², not ×factor) and make every embedding a 10-way
  * near-duplicate of itself — a quadratic stress test, not a scale
  * proof. Per table:
  *
  *  - fixed dimensions (`region`, `nation`) copy through unchanged,
  *    as TPC-H itself scales them;
  *  - fact/dim keys shift by `replica × sourceKeySpan` (dense 0-based
  *    source keys), preserving referential integrity within a shard;
  *    `Customer#…`/`Supplier#…` names are re-derived from the new key;
  *  - `events` keeps its timestamps (window density scales linearly;
  *    per-user history is shard-local and unchanged);
  *  - `documents.text` maps every non-stopword token's LAST character
  *    to a replica-specific consonant. The map is bijective on the
  *    corpus vocabulary (verified against the driver corpus for all
  *    nine letters) and LENGTH-PRESERVING, so every Gopher gate
  *    feature — word count, mean word length, symbol ratio, alpha
  *    fraction, stopword hits (the 12 stoplist words are untouched),
  *    `n_chars` — is EXACTLY invariant per shard, while cross-shard
  *    shingle overlap collapses to the rare all-stopword n-gram
  *    (measured Jaccard ≲ 0.001, far below every dedup threshold).
  *    The consonants {b,c,g,h,j,k,m,p,q} are chosen so no mapped
  *    token can collide with a stoplist word (none ends in them);
  *  - `embeddings` get a per-(replica, dimension) deterministic sign
  *    flip: an orthogonal transform, so intra-shard dot products,
  *    norms, and cluster structure are bit-exact, while cross-shard
  *    cosines decorrelate to ~N(0, 1/64) — no spurious cross-shard
  *    near-duplicates. `vec_id` shifts by the DOCUMENT stride because
  *    `llm_multimodal` joins `doc_id = vec_id`.
  *
  * Scale posture: one columnar pass per table, no shuffle (explode is
  * map-side); at a real 100 TB this is exactly the shape you'd run —
  * `factor` map tasks per input split, write-partitioned by replica.
  *
  * LEVEL-2 amplification (sf10 = ScaleUp(sf1) — r8): the level-1 text
  * map cannot compose with itself — re-mapping an already-mapped LAST
  * char sends every level-1 shard's token to the SAME image
  * (`xb`,`xc` → `xq`), collapsing the shards into exact duplicates.
  * `level = 2` therefore maps the SECOND-TO-LAST char with a
  * different alphabet ([[Letters2]], chosen programmatically against
  * the sf1 vocabulary: per-letter injective, ZERO fixed points, image
  * disjoint from the existing vocab and from the stoplist — strictly
  * cleaner than level 1's rare fixed points like `agg` under the `g`
  * replica). The embedding sign-flip seed is level-tagged so a
  * level-2 flip never inverts a level-1 flip (same seed would make
  * shard (r,1)∘(1,s) reproduce identity vectors — instant cross-shard
  * duplicates). Level-1 output at sf1 is byte-identical to what this
  * file always produced.
  *
  * LEVEL-3 amplification (sf100 = ScaleUp(sf10, level = 3) — r8): a
  * third single-character level is PROVABLY impossible on this
  * vocabulary — every remaining position has "conflict pairs" (tokens
  * differing only there, e.g. the five 3-letter tokens per `?wb`
  * skeleton), and a conflict pair needs its two chars' image sets
  * disjoint across replicas AND within one: 2×9 = 18 > 26 letters.
  * Level 3 therefore switches to a WHOLE-TOKEN codebook: the source
  * vocabulary (bounded — ~2.8k tokens at sf10; the same deliberate
  * driver-side collect as the IVF training sample) is assigned
  * deterministic same-length lowercase images by enumerating length-L
  * strings lexicographically and skipping the vocabulary and the
  * stoplist. A token bijection is strictly cleaner than the char
  * maps: images are disjoint from the vocab and from every other
  * replica BY CONSTRUCTION (no per-position injectivity proof
  * needed), shingle structure is isomorphic per shard (a bijection on
  * tokens is a bijection on n-grams), and every pinned gate
  * feature — lengths, counts, alpha fraction, stopword hits,
  * `n_chars` — is exactly invariant. The map rides a broadcast hash
  * map inside a documented generation-time UDF (O(1) per token; a
  * literal MapType column would linear-scan ~2.8k entries per
  * token). Char-level distributions (`llm_entropy` inputs) are
  * perturbed — images cluster lexicographically low — which no
  * pinned invariant depends on. */
object ScaleUp {
  private val Stop = Seq(
    "the", "a", "of", "and", "el", "la", "de", "y",
    "der", "die", "das", "und")
  // replica 1..9 suffix letters; index 0 (identity shard) unused
  private val Letters = "bcghjkmpq"
  // level-2 replica letters, applied at the second-to-last position:
  // none is a stopword's penultimate char (no mapped token can become
  // a stopword), none appears as ANY sf1-vocab token's penultimate
  // (zero fixed points), and the per-letter map is injective on the
  // sf1 vocab with image disjoint from it (verified programmatically;
  // ScaleUpSpec re-verifies on the actual corpus)
  private val Letters2 = "bfjkpqvwx"

  /** Level-marker file: records the composition level that PRODUCED a
    * directory, so the next amplification can derive (and validate)
    * its own level instead of trusting the caller. The r8 foot-gun
    * this closes: a level-1 re-composition of level-1 data maps every
    * shard's token to the SAME image, collapsing shards into exact
    * duplicates — observed once as a silent 107× near-dup candidate
    * jump before ScaleStats caught it. Driver-generated testdata has
    * no marker = level 0. */
  private val LevelMarker = "_scaleup_level"

  private[graft] def recordedLevel(dir: String): Int = {
    val f = new java.io.File(dir, LevelMarker)
    if (f.exists()) new String(
      java.nio.file.Files.readAllBytes(f.toPath)).trim.toInt
    else {
      // A marker-less dir is only level 0 when it LOOKS like driver
      // testdata (single-file parquet per table). ScaleUp output is
      // always a Spark-written DIRECTORY with a _SUCCESS file — a
      // pre-r9 marker-less ScaleUp dir read as level 0 would compose
      // at level 1 over level-1 data, the exact shard collapse the
      // marker exists to prevent (r10, per advisor). Refuse instead.
      val docs = new java.io.File(dir, "documents.parquet")
      val sparkWritten = docs.isDirectory &&
        new java.io.File(docs, "_SUCCESS").exists()
      require(!sparkWritten,
        s"$dir has no $LevelMarker marker but its tables are " +
          "Spark-written directories — this looks like ScaleUp output " +
          "from before the marker existed. Deriving level 0 here risks " +
          "the shard-collapse bug; stamp the dir's true level into " +
          s"$dir/$LevelMarker (one integer) and re-run")
      0
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    // level derives from the source's marker by default; an explicit
    // 4th arg is validated against it (fail fast, never compose wrong)
    val level =
      if (args.length > 3) args(3).toInt else recordedLevel(src) + 1
    require(factor >= 1 && factor <= 10,
      s"factor must be in [1,10] (have ${Letters.length + 1} disjoint shard alphabets), got $factor")
    require(level >= 1 && level <= 3, s"level must be 1..3, got $level")
    val spark = core.Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    run(spark, src, dst, factor, level)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, factor: Int,
      level: Int = 1): Unit = {
    // the marker law: composing at any level other than source+1
    // silently corrupts similarity structure (see [[LevelMarker]]) —
    // fail before reading a single row
    val srcLevel = recordedLevel(src)
    require(level == srcLevel + 1,
      s"ScaleUp level mismatch: $src records level $srcLevel, so the " +
        s"next composition must be level ${srcLevel + 1}, got $level " +
        "(a wrong-level re-composition collapses shards into exact duplicates)")
    // via Tables.load: explicit fail-fast schemas + the ns→µs events
    // timestamp normalization (the output stores plain µs)
    def read(t: String) = core.Tables.load(spark, src, t)
    def write(t: String)(df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // replica index column; replica 0 is the untouched source image
    def amplify(df: DataFrame): DataFrame =
      df.withColumn("r", explode(sequence(lit(0), lit(factor - 1))))
    // shard key stride = max(key)+1 of the OWNING table, so shifted key
    // ranges are disjoint whether or not the source keys are dense
    def span(t: String, c: String): Long =
      read(t).agg(max(col(c))).head.getLong(0) + 1L
    def shift(c: String, stride: Long) =
      (col(c) + col("r").cast("long") * stride).as(c)

    val nCust = span("customer", "c_custkey")
    val nSupp = span("supplier", "s_suppkey")
    val nPart = span("part", "p_partkey")
    val nOrd = span("orders", "o_orderkey")
    val nEvt = span("events", "event_id")
    val nUser = span("events", "user_id")
    val nDoc = span("documents", "doc_id")

    write("region")(read("region"))
    write("nation")(read("nation"))

    write("customer")(amplify(read("customer")).select(
      shift("c_custkey", nCust),
      format_string("Customer#%09d", col("c_custkey") + col("r") * nCust)
        .as("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))

    write("supplier")(amplify(read("supplier")).select(
      shift("s_suppkey", nSupp),
      format_string("Supplier#%09d", col("s_suppkey") + col("r") * nSupp)
        .as("s_name"),
      col("s_nationkey"), col("s_acctbal")))

    write("part")(amplify(read("part")).select(
      shift("p_partkey", nPart), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")))

    write("orders")(amplify(read("orders")).select(
      shift("o_orderkey", nOrd), shift("o_custkey", nCust),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")))

    write("lineitem")(amplify(read("lineitem")).select(
      shift("l_orderkey", nOrd), shift("l_partkey", nPart),
      shift("l_suppkey", nSupp), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")))

    write("events")(amplify(read("events")).select(
      shift("event_id", nEvt), col("ts"), shift("user_id", nUser),
      col("event_type"), col("value"), col("props")))

    if (level <= 2) {
      // length-preserving per-shard word map (see scaladoc): level 1
      // replaces the LAST char, level 2 the SECOND-TO-LAST (1-char
      // tokens degenerate to the replica letter at either level — the
      // only 1-char tokens in any shipped corpus are stopwords, which
      // pass through untouched)
      val shardText = array_join(
        transform(split(col("text"), " "), w => {
          val letters =
            if (level == 1) Letters.map(_.toString).toArray
            else Letters2.map(_.toString).toArray
          val letter = element_at(lit(letters), col("r"))
          val mapped =
            if (level == 1) concat(w.substr(lit(1), length(w) - 1), letter)
            else when(length(w) <= 1, letter)
              .otherwise(concat(
                w.substr(lit(1), length(w) - 2), letter,
                w.substr(length(w), lit(1))))
          when(col("r") === 0 || w.isin(Stop: _*), w).otherwise(mapped)
        }),
        " ")
      write("documents")(amplify(read("documents")).select(
        shift("doc_id", nDoc), shardText.as("text"),
        col("lang"), col("source"), col("n_chars")))
    } else {
      // level 3: whole-token codebook (see scaladoc). The vocabulary
      // collect is bounded (~2.8k tokens at sf10) and deliberate —
      // the codebook is built once on the driver and broadcast.
      val stopSet = Stop.toSet
      val vocab = read("documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(!col("w").isin(Stop: _*)).distinct()
        .collect().map(_.getString(0))
      // deterministic same-length images: length-L lowercase strings
      // in lexicographic order, skipping the vocab and the stoplist;
      // token k (sorted) at replica r takes draw k·(factor−1)+(r−1) —
      // distinct (token, replica) pairs get distinct images, so the
      // composed corpus has zero cross- or intra-shard collisions
      def lexStrings(len: Int): Iterator[String] = {
        val alpha = "abcdefghijklmnopqrstuvwxyz"
        def rec(l: Int): Iterator[String] =
          if (l == 0) Iterator("")
          else rec(l - 1).flatMap(p => alpha.iterator.map(p + _))
        rec(len)
      }
      val codebook: Map[(Int, String), String] = {
        val m = Map.newBuilder[(Int, String), String]
        for ((len, toks) <- vocab.groupBy(_.length)) {
          val taken = toks.toSet ++ stopSet.filter(_.length == len)
          val images = lexStrings(len).filterNot(taken.contains)
          for (t <- toks.sorted; r <- 1 until factor) m += ((r, t) -> images.next())
        }
        m.result()
      }
      val sc = spark.sparkContext.broadcast(codebook)
      // generation-time UDF: the one place a closure beats Catalyst —
      // O(1) hash lookup per token against 9×|vocab| broadcast state
      val remap = udf { (text: String, r: Int) =>
        if (r == 0) text
        else text.split(" ")
          .map(w => sc.value.getOrElse((r, w), w)).mkString(" ")
      }
      write("documents")(amplify(read("documents")).select(
        shift("doc_id", nDoc),
        remap(col("text"), col("r")).as("text"),
        col("lang"), col("source"), col("n_chars")))
    }

    // orthogonal per-shard transform: deterministic ±1 per (r, dim).
    // The seed is LEVEL-TAGGED (level 1 keeps its historical literal so
    // sf1 reproduces byte-identically): with a shared seed, a level-2
    // flip with the same r would exactly invert a level-1 flip and
    // shard (r,·)∘(·,r) would reproduce the identity shard's vectors —
    // cross-shard exact duplicates, the very artifact ScaleUp exists
    // to avoid.
    val signSeed =
      if (level == 1) "graft_shard_sign"
      else if (level == 2) "graft_shard_sign_L2"
      else "graft_shard_sign_L3"
    write("embeddings")(amplify(read("embeddings")).select(
      // DOC stride, not the embeddings row count: llm_multimodal joins
      // doc_id = vec_id and the alignment must survive sharding
      shift("vec_id", nDoc),
      transform(col("embedding"), (x, i) =>
        when(col("r") === 0 ||
          pmod(xxhash64(lit(signSeed), col("r") * 64 + i), lit(2)) === 0, x)
          .otherwise(-x)).cast("array<float>").as("embedding"),
      col("label")))

    // stamp the produced level last — a crashed run leaves no marker,
    // so a re-run re-derives from the SOURCE, never from a partial dst
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dst, LevelMarker),
      level.toString.getBytes)
  }
}
