package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash kernel: all 8 signature values of a document in
  * one traversal of its word trigrams, with zero intermediate rows.
  *
  * The composable pipeline ([[graft.llm.Dedup]]'s explode → md5 →
  * groupBy-min) shuffles one (doc, gram) row per shingle just to take
  * 8 mins per doc — at 100 TB that shuffle dwarfs the hash work. This
  * kernel reproduces the *identical* hash algebra (two md5 hex digests
  * per trigram, four 8-hex chunks each, lexicographic min per chunk
  * position — ASCII hex, so Java ordering ≡ UTF8 binary ordering ≡ the
  * DuckDB oracle's min) as a per-row projection, so candidate
  * generation becomes scan → project → band-explode → equi-join with
  * no aggregation shuffle at all. Oracle SQL is unchanged; a spec
  * asserts bit-equality against the composable path.
  */
object MinHash8 {
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  private val HEX = "0123456789abcdef".toCharArray

  private def md5hex(md: java.security.MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 15)
      out(2 * i + 1) = HEX(d(i) & 15)
      i += 1
    }
    new String(out)
  }

  /** Null when the text has fewer than 3 tokens (no trigrams — the doc
    * is absent from the composable pipeline's aggregation too).
    * Tokenization mirrors Spark's `split(text, " ")`: single-space
    * regex, empty tokens kept. */
  def eval(text: UTF8String): ArrayData = {
    val t = text.toString.split(" ", -1)
    if (t.length < 3) return null
    val mins = new Array[String](8)
    val md = digests.get()
    var i = 0
    while (i <= t.length - 3) {
      val g = t(i) + " " + t(i + 1) + " " + t(i + 2)
      val m1 = md5hex(md, g)
      val m2 = md5hex(md, "x:" + g)
      var s = 0
      while (s < 4) {
        val c1 = m1.substring(8 * s, 8 * s + 8)
        if (mins(s) == null || c1.compareTo(mins(s)) < 0) mins(s) = c1
        val c2 = m2.substring(8 * s, 8 * s + 8)
        if (mins(4 + s) == null || c2.compareTo(mins(4 + s)) < 0) mins(4 + s) = c2
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_): Any))
  }
}

/** Single-pass SimHash kernel: the 16-bit fingerprint of a document in
  * one traversal of its distinct tokens — replaces the composable
  * explode → distinct → md5 → 16-bit-sum groupBy (two corpus-wide
  * shuffles) with a pure projection. Identical algebra: md5 hex of
  * each distinct lower-cased token, per-bit ±1 sums over the first 4
  * hex nibbles, sign bit per position (bit-equality pinned in
  * MinHashSpec, so the DuckDB oracle is untouched). */
object SimHash16 {
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Null when the text has no non-empty token (the doc is absent from
    * the composable pipeline's aggregation too). */
  def eval(text: UTF8String): Any = {
    val seen = new java.util.HashSet[String]()
    val toks = text.toString.split(" ", -1)
    val sums = new Array[Int](16)
    val md = digests.get()
    var any = false
    var ti = 0
    while (ti < toks.length) {
      val tok = toks(ti)
      if (tok.nonEmpty && seen.add(tok)) {
        any = true
        val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // bit j lives in hex char j/4 (= nibble), position 3 - j%4
        var j = 0
        while (j < 16) {
          val nibble =
            if (j / 4 % 2 == 0) (d(j / 8) >> 4) & 15 else d(j / 8) & 15
          val bit = (nibble >> (3 - j % 4)) & 1
          sums(j) += (if (bit == 1) 1 else -1)
          j += 1
        }
      }
      ti += 1
    }
    if (!any) return null
    var fp = 0L
    var j = 0
    while (j < 16) {
      if (sums(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}

/** `graft_simhash16(text)` → BIGINT fingerprint, or NULL for texts
  * with no non-empty token. */
case class SimHash16Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash16 expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash16.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val fp = ctx.freshName("fp")
      s"""
         |Object $fp = graft.functions.SimHash16.eval($c);
         |${ev.isNull} = $fp == null;
         |${ev.value} = ${ev.isNull} ? -1L : ((Long) $fp).longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash16Expr =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash16"
}

/** `graft_minhash8(text)` → array<string> of the 8 signature chunks
  * (h0..h7), or NULL for texts with no trigram. Registered via
  * [[graft.plans.GraftExtensions]]. */
case class MinHash8Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash8 expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    MinHash8.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.MinHash8.eval($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHash8Expr =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash8"
}
