package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd replica-min ticket for the weighted bottom-k lottery
  * (`sample_weighted`): `min_ticket(key, w)` = the minimum of the `w`
  * seeded draws `md5("ws" + key + ":" + i)`, i = 1..w — bit-identical
  * to the HOF spelling `array_min(transform(sequence(1, w), i ->
  * md5(concat('ws', key, ':', i))))` that the DuckDB oracle replays
  * (PropertySpec pins all three spellings equal), but ~40× cheaper:
  * the HOF path builds a `w`-element array and walks i through FOUR
  * interpreted expression nodes (concat → cast → md5 → array_min)
  * per element, allocating the concat string, the digest, and the hex
  * string every draw; this expression runs one tight JVM loop per row
  * — one reused MessageDigest, one byte[] compare, one hex encode of
  * the winner. Measured 13 s → under a second over 600k rows × ~25
  * draws at sf0.1 (the r7 playbook's constant-factor-disaster class:
  * linear in rows, invisible in any single-SF total).
  *
  * Digest minima compare as raw unsigned bytes, which orders exactly
  * like the lowercase-hex strings the HOF compares (hex encoding is
  * monotone in the byte value), so only the winner is ever hexed.
  *
  * PRECONDITION: the equivalence to the Spark HOF holds for `w ≥ 1`
  * only. At `w < 1` this returns NULL — the empty-lottery semantics
  * of DuckDB's `list_min([])` — whereas the Spark HOF spelling would
  * NOT be empty there: `sequence(1, 0)` is the DESCENDING `[1, 0]`,
  * so `array_min` yields a non-null ticket for w = 0. All producers
  * pass positive weights (TPC-H quantities ≥ 1; PropertySpec
  * generates w ∈ [1, 50] and pins the three spellings equal on that
  * domain), and NULL at w < 1 fails loudly downstream rather than
  * sampling a row with zero weight. Input types are declared so a
  * mistyped weight is an ANALYSIS error, not a runtime
  * ClassCastException (r7 advice).
  */
case class MinTicket(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // inferred Seq[DataType] (AbstractDataType is private[sql]; Seq is
  // covariant, so this conforms to the trait's Seq[AbstractDataType])
  override def inputTypes = Seq(StringType, LongType)

  override def dataType: DataType = StringType

  override def nullSafeEval(key: Any, w: Any): Any =
    MinTicket.compute(key.asInstanceOf[UTF8String], w.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, w) => {
      val v = ctx.freshName("mtV")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $v =
         |  graft.functions.MinTicket$$.MODULE$$.compute($k, $w);
         |${ev.isNull} = ($v == null);
         |${ev.value} = $v;
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinTicket =
    copy(left = newLeft, right = newRight)
}

object MinTicket {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  /** Sequential replica-min over the seeded md5 family — the exact
    * semantics of the HOF spelling, one tight loop. Called from both
    * the interpreted eval and the generated code. */
  def compute(key: UTF8String, w: Long): UTF8String = {
    if (w < 1L) return null
    val md = digests.get()
    val base = ("ws" + key.toString + ":").getBytes("UTF-8")
    var best: Array[Byte] = null
    var i = 1L
    while (i <= w) {
      md.reset()
      md.update(base)
      md.update(java.lang.Long.toString(i).getBytes("UTF-8"))
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      i += 1L
    }
    val hex = new Array[Char](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HexChars((best(j) >> 4) & 0xf)
      hex(2 * j + 1) = HexChars(best(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(hex))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Register `min_ticket(key, w)` for use via `expr(...)`. */
  def register(spark: SparkSession): String = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_ticket", exprs => MinTicket(exprs(0), exprs(1)), "built-in")
    "min_ticket"
  }
}
