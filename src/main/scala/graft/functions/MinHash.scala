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
