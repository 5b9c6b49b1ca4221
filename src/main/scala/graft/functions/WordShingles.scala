package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator` (the UDTF surface, SURVEY.md §2.11):
  * emits the n-word shingles of a whitespace-tokenized text, one row
  * per shingle. A document shorter than n yields its whole text as a
  * single shingle (so every doc has ≥1 shingle and MinHash signatures
  * are total).
  *
  * Compared to the HOF spelling
  * (`explode(transform(sequence(...), i -> ...))`), a Generator avoids
  * materializing the intermediate shingle array per row — rows stream
  * straight out of eval. Registered for SQL via [[WordShingles.register]].
  *
  * `distinct = true` emits each doc's shingle SET (first-occurrence
  * order) instead of the multiset — the row-local dedup every
  * set-semantics consumer (MinHash, Jaccard, containment) needs.
  * Doing it here instead of a downstream `.distinct()` matters at
  * scale: per-doc dedup is bounded by the document's own length (a
  * hash set inside eval, zero shuffle), while a frame-level
  * `.distinct()` on (doc_id, shingle) is a cluster-wide exchange of
  * every raw shingle string — ~415M rows at the sf100 rung, the
  * single largest shuffle in the near-dedup pipeline, carrying data
  * whose duplicates the very next aggregate would have ignored
  * (min() is idempotent). Count consumers (bigram LMs) keep the
  * multiset default. */
case class WordShingles(child: Expression, n: Int,
    distinct: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(" ")
      val all =
        if (toks.length <= n) Iterator.single(toks.mkString(" "))
        else (0 to toks.length - n).iterator.map(i =>
          toks.slice(i, i + n).mkString(" "))
      val out = if (!distinct) all else {
        val seen = new java.util.HashSet[String]()
        all.filter(seen.add)
      }
      out.map(s => InternalRow(UTF8String.fromString(s)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Register `word_shingles_<n>` so queries can `selectExpr` it like a
    * built-in generator (explode-style). */
  def register(spark: SparkSession, n: Int): String = {
    val name = s"word_shingles_$n"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => WordShingles(exprs.head, n), "built-in")
    name
  }

  /** Register the per-doc-set variant as `word_shingles_distinct_<n>`. */
  def registerDistinct(spark: SparkSession, n: Int): String = {
    val name = s"word_shingles_distinct_$n"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => WordShingles(exprs.head, n, distinct = true), "built-in")
    name
  }
}
