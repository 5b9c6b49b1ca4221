package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}
import graft.core.Determinism._
import graft.core.{OracleDsl => O}

/** SURVEY.md §2.11b — corpus-curation operators a production
  * training-data pipeline runs between raw crawl and tokenizer:
  * PII redaction, benchmark decontamination, tokenizer-cost estimation.
  * (Beyond the reference's scope — /root/reference/README.md:2-14 is
  * ETL-only — but first-class for the 100 TB LLM-pipeline goal.)
  *
  * 100 TB notes: all three are embarrassingly parallel per-document
  * passes (regex/columnar) except decontamination, whose benchmark
  * shingle set is small by construction (benchmarks are ~10⁵ docs, not
  * 10¹⁰) — broadcast semi-join, so the corpus is never shuffled.
  */
object Curation {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  // Patterns restricted to syntax Java regex and DuckDB's RE2 parse
  // identically (char classes, bounded repeats, \b word boundary —
  // no lookaround, no backrefs).
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  private val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII redaction: scrub emails, phone numbers, and IPv4 addresses,
    * reporting per-doc match counts (the audit signal real pipelines
    * log per shard). The synthetic corpus carries no PII, so the query
    * first derives a deterministic contact string from the row itself —
    * the redaction then does real work and the oracle replays the same
    * construction. Redaction order is fixed (email → phone → ip) so
    * overlapping matches resolve identically on both engines. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val raw = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@mail.example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(raw, EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        Ipv4Re, "<IP>")
    ordered(
      docs(spark, dir).select(
        col("doc_id"),
        redacted.as("redacted"),
        size(regexp_extract_all(raw, lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(raw, lit(PhoneRe), lit(0))).as("n_phones"),
        // ip count AFTER phone redaction: the phone pattern would
        // otherwise claim part of a dotted quad on neither engine —
        // counting post-redaction keeps count and effect consistent
        size(regexp_extract_all(
          regexp_replace(regexp_replace(raw, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"),
          lit(Ipv4Re), lit(0))).as("n_ips")))
  }

  private val piiRedactSql = {
    val raw = "text || ' contact user' || doc_id || '@mail.example.com or +1-555-' || " +
      "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || " +
      "' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
    val afterPhone =
      s"regexp_replace(regexp_replace($raw, '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g')"
    s"""SELECT doc_id,
       |  regexp_replace($afterPhone, '$Ipv4Re', '<IP>', 'g') AS redacted,
       |  len(regexp_extract_all($raw, '$EmailRe')) AS n_emails,
       |  len(regexp_extract_all($raw, '$PhoneRe')) AS n_phones,
       |  len(regexp_extract_all($afterPhone, '$Ipv4Re')) AS n_ips
       |FROM documents
       |${O.OrderAll}"""
  }

  /** Benchmark decontamination: per corpus doc, the fraction of its
    * 3-gram shingles that appear in ANY benchmark doc (benchmark set =
    * doc_id % 50 == 0 — stands in for held-out eval sets). Docs with
    * ratio ≥ 0.5 are flagged for exclusion: training on them would leak
    * eval data. The shingle machinery is shared with `llm_near_dedup`.
    *
    * 100 TB: the benchmark shingle set is tiny relative to the corpus —
    * broadcast left-semi join, corpus shingles stream past it with no
    * corpus-side shuffle; per-doc counts are one map-side-combined
    * groupBy. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(spark, dir)
    val bench = sh.filter(col("doc_id") % 50 === 0)
      .select(col("shingle")).distinct()
    val corpus = sh.filter(col("doc_id") % 50 =!= 0)
    val tot = corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hit = corpus.join(broadcast(bench), Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    val ratio = col("n_contaminated").cast("double") / col("n_shingles").cast("double")
    ordered(
      tot.join(hit, Seq("doc_id"), "left_outer")
        .na.fill(0L, Seq("n_contaminated"))
        .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
          ratio.as("contamination_ratio"),
          (ratio >= 0.5).as("flagged")))
  }

  private val contaminationSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |toks AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM t),
       |sh AS (
       |  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS s
       |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
       |  UNION
       |  SELECT doc_id, text AS s FROM documents WHERE len(string_split(text, ' ')) <= 3),
       |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
       |corpus AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
       |tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY 1),
       |hit AS (
       |  SELECT c.doc_id, COUNT(*) AS n_contaminated
       |  FROM corpus c JOIN bench b ON c.s = b.s GROUP BY 1)
       |SELECT t.doc_id, t.n_shingles, COALESCE(h.n_contaminated, 0) AS n_contaminated,
       |  CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / CAST(t.n_shingles AS DOUBLE)
       |    AS contamination_ratio,
       |  CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / CAST(t.n_shingles AS DOUBLE) >= 0.5
       |    AS flagged
       |FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
       |${O.OrderAll}"""

  /** GPT-2-style pre-tokenizer pattern, restricted to RE2∩Java syntax:
    * a token is an optionally-space-prefixed letter run, digit run, or
    * punctuation run. The real BPE merge table is model-specific; the
    * PRE-tokenizer is what determines cost estimates (token counts for
    * budget/pricing), and that is regex-expressible. */
  private val BpeRe = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** Tokenizer-cost estimation: whitespace tokens vs BPE-ish
    * pre-tokens per doc + compression ratio (chars per pre-token) —
    * the numbers a pipeline needs to budget tokenization and price a
    * training mix. Pure columnar regex: embarrassingly parallel. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    ordered(
      docs(spark, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpeRe), lit(0))).as("n_bpe_tokens"),
        round6(col("n_chars").cast("double") /
          size(regexp_extract_all(col("text"), lit(BpeRe), lit(0))).cast("double"))
          .as("chars_per_token")))

  private val tokenCountSql =
    s"""SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_ws_tokens,
       |  len(regexp_extract_all(text, '$BpeRe')) AS n_bpe_tokens,
       |  round(CAST(n_chars AS DOUBLE)
       |    / CAST(len(regexp_extract_all(text, '$BpeRe')) AS DOUBLE), 6)
       |    AS chars_per_token
       |FROM documents
       |${O.OrderAll}"""

  val queries: Map[String, Q] = Map(
    "llm_pii_redact" -> Q(piiRedact _, piiRedactSql),
    "llm_contamination" -> Q(contamination _, contaminationSql),
    "llm_token_count" -> Q(tokenCount _, tokenCountSql)
  )
}
