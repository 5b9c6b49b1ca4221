package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation operators (SURVEY.md §2.11b): redaction leaves no
  * live PII behind, contamination ratios are well-formed and the flag
  * agrees with the threshold. */
class CurationSpec extends AnyFunSuite {
  import TestSpark.spark
  import TestSpark.Sf

  test("pii redaction leaves no live email/phone/ip and counts every planted hit") {
    val out = llm.Curation.piiRedact(spark, Sf)
    val leaked = out.filter(
      col("redacted").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
        col("redacted").rlike("\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}") ||
        col("redacted").rlike("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"))
      .count()
    assert(leaked === 0, "redacted text must contain no live PII pattern")
    // every doc had exactly one planted email/phone/ip
    val bad = out.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1 ||
      col("n_ips") =!= 1).count()
    assert(bad === 0, "each doc plants exactly one of each PII kind")
    val tags = out.filter(!col("redacted").contains("<EMAIL>") ||
      !col("redacted").contains("<PHONE>") || !col("redacted").contains("<IP>")).count()
    assert(tags === 0, "every doc must carry all three redaction tags")
  }

  test("contamination ratios are well-formed and the flag matches the threshold") {
    val out = llm.Curation.contamination(spark, Sf).cache()
    try {
      assert(out.filter(col("doc_id") % 50 === 0).count() === 0,
        "benchmark docs must not be scored against themselves")
      val malformed = out.filter(
        col("n_contaminated") > col("n_shingles") ||
          col("contamination_ratio") < 0 || col("contamination_ratio") > 1 ||
          (col("flagged") =!= (col("contamination_ratio") >= 0.5))).count()
      assert(malformed === 0)
      // the synthetic corpus shares a 31-token vocabulary: some overlap
      // with the benchmark set must exist, else the operator is vacuous
      assert(out.agg(sum(col("n_contaminated"))).head().getLong(0) > 0,
        "expected nonzero shingle overlap on the shared-vocabulary corpus")
    } finally out.unpersist()
  }

  test("BPE-ish pre-tokens are at least as many as whitespace tokens") {
    val out = llm.Curation.tokenCount(spark, Sf)
    // every space-delimited word is ≥1 pre-token, so the regex count
    // can never undercount vs whitespace splitting
    assert(out.filter(col("n_bpe_tokens") < col("n_ws_tokens")).count() === 0)
    assert(out.filter(col("chars_per_token") <= 0).count() === 0)
  }

  test("train split: exhaustive, deterministic, and near the 80/10/10 target") {
    val out = llm.Curation.trainSplit(spark, Sf).cache()
    try {
      val total = out.count()
      val byBucket = out.groupBy(col("split")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byBucket.values.sum === total, "every doc gets exactly one split")
      // multiplicative hashing is uniform enough that 500 docs land
      // within a generous band of the 80/10/10 target
      val train = byBucket.getOrElse("train", 0L).toDouble / total
      assert(train > 0.72 && train < 0.88, s"train share $train off target 0.8")
      assert(byBucket.getOrElse("validation", 0L) > 0 &&
        byBucket.getOrElse("test", 0L) > 0)
      // membership is a pure function of doc_id: a re-run agrees row-for-row
      val again = llm.Curation.trainSplit(spark, Sf)
      assert(out.exceptAll(again).count() === 0)
    } finally out.unpersist()
  }

  test("domain mix: shares rebalanced toward uniform, never above before-counts") {
    val out = llm.Curation.domainMix(spark, Sf).cache()
    try {
      assert(out.filter(col("n_after") > col("n_before")).count() === 0,
        "downsampling can only remove docs")
      // the raw corpus is skewed (en dominates ~3×); after the mix every
      // language's share must sit near 1/5
      val shares = out.select(col("share_after")).collect().map(_.getDouble(0))
      assert(shares.length === 5)
      assert(shares.forall(s => s > 0.12 && s < 0.28),
        s"rebalanced shares should be near 0.2, got ${shares.mkString(",")}")
      // the dominant language must actually have been cut
      val en = out.filter(col("lang") === "en").head()
      assert(en.getAs[Long]("n_after") < en.getAs[Long]("n_before"))
    } finally out.unpersist()
  }

  test("heuristic filter: keep is exactly the conjunction and does real work") {
    val out = llm.Curation.heuristicFilter(spark, Sf).cache()
    try {
      val inconsistent = out.filter(
        col("keep") =!= (col("r_word_count") && col("r_mean_len") &&
          col("r_symbol") && col("r_alpha") && col("r_stopword"))).count()
      assert(inconsistent === 0)
      val kept = out.filter(col("keep")).count()
      val total = out.count()
      assert(kept > 0 && kept < total,
        s"rules must split the corpus nontrivially ($kept/$total kept)")
      // the all-alpha single-line synthetic corpus pins two rules
      assert(out.filter(col("symbol_ratio") =!= 0.0).count() === 0)
      assert(out.filter(col("alpha_frac") =!= 1.0).count() === 0)
    } finally out.unpersist()
  }

  test("curation e2e: cascade totals tie to independently-derived stage outputs") {
    import org.apache.spark.sql.expressions.Window
    val out = llm.Curation.curationE2e(spark, Sf)
    // re-derive the survivor population from the STANDALONE keyed
    // stages: quality keep-set, then min-doc-per-content-hash among it
    val kept = llm.Curation.heuristicFilter(spark, Sf)
      .filter(col("keep")).select("doc_id")
    val survivors = core.Tables.load(spark, Sf, "documents")
      .join(kept, "doc_id")
      .withColumn("h",
        sha2(lower(trim(regexp_replace(col("text"), "\\s+", " "))), 256))
      .withColumn("m", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .filter(col("doc_id") === col("m"))
    val total = out.agg(coalesce(sum("n_docs"), lit(0L)))
      .collect()(0).getLong(0)
    assert(total > 0, "cascade produced an empty corpus at test scale")
    assert(total === survivors.count(),
      "e2e doc total must equal quality-then-dedup of the standalone stages")
    // the quality gate's floor survives composition: every kept doc
    // has >= 15 words, so each summary row has n_tokens >= 15 * n_docs
    assert(out.filter(col("n_tokens") < col("n_docs") * 15).count() === 0)
    val splits = out.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "validation", "test")))
  }

  test("packing: distributed prefix sum is gapless and chunk spans are exact") {
    val out = llm.Curation.packing(spark, Sf).cache()
    try {
      // offsets must be the exact running sum in doc_id order — no gaps,
      // no overlaps, regardless of how the 16 range partitions split
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
      val bad = out
        .withColumn("_expected",
          coalesce(lag(col("tok_offset") + col("n_tokens"), 1).over(w), lit(0L)))
        .filter(col("tok_offset") =!= col("_expected")).count()
      assert(bad === 0, "prefix sum must be gapless in doc_id order")
      val spans = out.filter(
        col("last_chunk") < col("first_chunk") ||
          col("n_chunks") =!= col("last_chunk") - col("first_chunk") + 1 ||
          col("tok_offset") < col("first_chunk") * 512 ||
          col("tok_offset") >= (col("first_chunk") + 1) * 512).count()
      assert(spans === 0, "chunk spans must bracket the offset")
      // docs are ≥10 tokens, so some must straddle a 512 boundary
      assert(out.filter(col("n_chunks") > 1).count() > 0)
    } finally out.unpersist()
  }

  test("chunking: full coverage, fixed overlap, tail never orphaned") {
    val out = llm.Curation.chunking(spark, Sf).cache()
    try {
      val docs = core.Tables.load(spark, Sf, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      val agg = out.groupBy(col("doc_id")).agg(
        max(col("chunk_idx")).as("last_idx"),
        max(when(col("chunk_idx") =!= 0 || col("chunk_idx") === 0,
          col("chunk_n_tokens"))).as("max_n"),
        min(col("chunk_n_tokens")).as("min_n"),
        count(lit(1)).as("nc")).join(docs, "doc_id")
      // last chunk must end exactly at the doc's last token: coverage
      // with no orphaned tail and no chunk starting past the end
      val bad = agg.filter(
        col("last_idx") * 24 >= col("n") && col("n") > 32 ||
          col("nc") =!= col("last_idx") + 1 ||
          col("min_n") < 1 || col("max_n") > 32).count()
      assert(bad === 0)
      // every non-last chunk is exactly K tokens
      val short = out.join(agg.select(col("doc_id"), col("last_idx")), "doc_id")
        .filter(col("chunk_idx") < col("last_idx") &&
          col("chunk_n_tokens") =!= 32).count()
      assert(short === 0, "only the tail chunk may be short")
    } finally out.unpersist()
  }

  test("repetition: count algebra holds and a repeated doc scores high") {
    val out = llm.Curation.repetition(spark, Sf).cache()
    try {
      val malformed = out.filter(
        col("n_distinct") > col("n_bigrams") ||
          col("top_count") < 1 ||
          col("top_frac") < col("distinct_frac") / col("n_distinct") ||
          col("top_frac") > 1.0 || col("distinct_frac") > 1.0).count()
      assert(malformed === 0)
      // n_bigrams == n_words - 1 for every doc (single-line corpus)
      val docs = core.Tables.load(spark, Sf, "documents")
        .select(col("doc_id"), (size(split(col("text"), " ")) - 1).as("exp"))
      assert(out.join(docs, "doc_id").filter(col("n_bigrams") =!= col("exp"))
        .count() === 0)
      // repeated vocabulary means SOME doc repeats a bigram
      assert(out.filter(col("top_count") > 1).count() > 0)
    } finally out.unpersist()
  }

  test("bloom filter: no false negatives, FP bounded, membership exact") {
    val out = llm.Curation.bloomFilter(spark, Sf).collect()
    val docs = core.Tables.load(spark, Sf, "documents").count()
    assert(out.length === docs)
    out.foreach { r =>
      assert(r.getAs[Boolean]("no_false_negative"),
        "a Bloom filter can NEVER miss a true member — hard guarantee broken")
      assert(r.getAs[Boolean]("fp_in_bound"))
    }
    // content-level membership == the id-defined benchmark set on this
    // corpus (no exact text dups in the fixtures)
    val members = out.filter(_.getAs[Boolean]("is_member"))
      .map(_.getAs[Long]("doc_id")).toSet
    val expected = out.map(_.getAs[Long]("doc_id")).filter(_ % 50 == 0).toSet
    assert(members === expected)
  }

  test("shuffle: dense 1..n permutation, reproducible, actually permutes") {
    val a = llm.Curation.shuffle(spark, TestSpark.Sf).collect()
    val pos = a.map(_.getLong(0)).sorted
    assert(pos.sameElements(1L to a.length.toLong), "pos must be a dense rank")
    // reproducible across runs (content-keyed, not RNG-state)
    val b = llm.Curation.shuffle(spark, TestSpark.Sf).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      .sameElements(b.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)))
    // and it is not the identity order (the hash really shuffles)
    val byPos = a.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(byPos.zip(byPos.tail).exists { case (x, y) => x > y })
  }
}
