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
  private val XPrefix = Array[Byte]('x', ':')

  /** Lowercase-hex encode of the unsigned 32-bit chunk minimum — the
    * only place the signature becomes a string (once per doc). */
  private def hex8(v: Long): String = {
    val out = new Array[Char](8)
    var k = 0
    while (k < 8) {
      out(k) = HEX(((v >> (28 - 4 * k)) & 15).toInt)
      k += 1
    }
    new String(out)
  }

  /** Null when the text has fewer than 3 tokens (no trigrams — the doc
    * is absent from the composable pipeline's aggregation too).
    * Tokenization mirrors Spark's `split(text, " ")`: single-space
    * regex, empty tokens kept.
    *
    * r16 (§ per-task work, after the distributed shape was already
    * right): the loop is byte-level with ZERO per-trigram allocation.
    * Two exact identities make it bit-identical to the r6 string
    * formulation (pinned by MinHashSpec against the composable
    * explode → md5 → min pipeline):
    *  - `split` on the single space char means the original UTF-8
    *    byte stream IS the tokens joined by ' ' (0x20 never occurs
    *    inside a multi-byte UTF-8 sequence), so trigram i's UTF-8
    *    bytes are the contiguous slice [start(i), end(i+2)) — no
    *    concat, no getBytes per trigram;
    *  - an 8-hex-char chunk of the md5 hex digest is 4 digest bytes,
    *    and lexicographic order of fixed-width lowercase hex equals
    *    numeric order of the unsigned 32-bit value — so the running
    *    min is an integer compare, and only the 8 final minima are
    *    hex-encoded.
    * Measured 2.25 s → ~0.9 s for the corpus-wide signature pass on
    * the x10 replica (the kernel was the floor of the whole dedup
    * ladder: 6 registry entries start from it). */
  def eval(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    var nSp = 0
    var p = 0
    while (p < bytes.length) {
      if (bytes(p) == ' '.toByte) nSp += 1
      p += 1
    }
    val n = nSp + 1
    if (n < 3) return null
    // starts(i) = byte offset of token i; virtual starts(n) makes
    // end(i) = starts(i+1) - 1 uniform for the last token too
    val starts = new Array[Int](n + 1)
    starts(0) = 0
    var ti = 1
    p = 0
    while (p < bytes.length) {
      if (bytes(p) == ' '.toByte) { starts(ti) = p + 1; ti += 1 }
      p += 1
    }
    starts(n) = bytes.length + 1
    val mins = new Array[Long](8)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = digests.get()
    val dbuf = new Array[Byte](16)
    def foldDigest(base: Int): Unit = {
      try md.digest(dbuf, 0, 16)
      catch { case e: java.security.DigestException => throw new RuntimeException(e) }
      var s = 0
      while (s < 4) {
        val v = ((dbuf(4 * s) & 0xffL) << 24) |
          ((dbuf(4 * s + 1) & 0xffL) << 16) |
          ((dbuf(4 * s + 2) & 0xffL) << 8) |
          (dbuf(4 * s + 3) & 0xffL)
        if (v < mins(base + s)) mins(base + s) = v
        s += 1
      }
    }
    var i = 0
    while (i <= n - 3) {
      val off = starts(i)
      val len = starts(i + 3) - 1 - off
      md.update(bytes, off, len)
      foldDigest(0)
      md.update(XPrefix)
      md.update(bytes, off, len)
      foldDigest(4)
      i += 1
    }
    new GenericArrayData(
      mins.map(v => UTF8String.fromString(hex8(v)): Any))
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
