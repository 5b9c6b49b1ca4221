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
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(" ")
      if (toks.length <= n)
        Iterator.single(InternalRow(UTF8String.fromString(toks.mkString(" "))))
      else
        (0 to toks.length - n).iterator.map { i =>
          InternalRow(UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
        }
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
}
