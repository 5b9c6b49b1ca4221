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
}
