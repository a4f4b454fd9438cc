package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass PII scrub: counts and redacts emails, IPv4 addresses and long
  * digit runs in a SINGLE expression evaluation per row.
  *
  * Semantics are exactly the declarative formulation it replaces
  * (TextAnalysis.scrubPii): each count is over the ORIGINAL text; the
  * replacements apply sequentially email → ip → card, each on the output of
  * the previous. Same java.util.regex engine and the same patterns Spark's
  * `regexp_replace`/`regexp_extract_all` would compile, so results are
  * bit-identical — it just stops paying for 6 independent regex expressions
  * (each converting UTF8String→String and rescanning the full text).
  *
  * Cheap pre-gates skip entire matchers: no '@' byte → no email scan; no
  * digit byte → no ip/card scan (the replacement literal is digit-free and
  * deletion cannot create digits, so the gate is exact, not heuristic).
  * On typical no-PII prose this drops per-row work from 6 regex scans to
  * one byte scan + 2 count scans.
  */
case class PiiScrub(
    child: Expression,
    emailRe: String,
    ipRe: String,
    cardRe: String,
    replacement: String) extends UnaryExpression {

  @transient private lazy val emailP = Pattern.compile(emailRe)
  @transient private lazy val ipP = Pattern.compile(ipRe)
  @transient private lazy val cardP = Pattern.compile(cardRe)
  @transient private lazy val quotedRepl =
    java.util.regex.Matcher.quoteReplacement(replacement)

  /** (count of matches in `countOn`, `replaceOn` with matches replaced).
    * Fuses into one matcher pass when both strings are the same object. */
  private def countAndReplace(p: Pattern, countOn: String, replaceOn: String): (Long, String) =
    if (countOn eq replaceOn) {
      val m = p.matcher(countOn)
      var n = 0L
      var buf: StringBuffer = null
      while (m.find()) {
        n += 1
        if (buf == null) buf = new StringBuffer(countOn.length)
        m.appendReplacement(buf, quotedRepl)
      }
      if (buf == null) (0L, countOn) else { m.appendTail(buf); (n, buf.toString) }
    } else {
      val mc = p.matcher(countOn)
      var n = 0L
      while (mc.find()) n += 1
      (n, p.matcher(replaceOn).replaceAll(quotedRepl))
    }

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    var hasAt = false
    var hasDigit = false
    var i = 0
    while (i < str.length && !(hasAt && hasDigit)) {
      val c = str.charAt(i)
      if (c == '@') hasAt = true
      else if (c >= '0' && c <= '9') hasDigit = true
      i += 1
    }
    var nEmails = 0L
    var nIps = 0L
    var nCards = 0L
    var cur = str
    if (hasAt) {
      val (n, r) = countAndReplace(emailP, str, cur)
      nEmails = n; cur = r
    }
    if (hasDigit) {
      val (ni, ri) = countAndReplace(ipP, str, cur)
      nIps = ni; cur = ri
      val (nc, rc) = countAndReplace(cardP, str, cur)
      nCards = nc; cur = rc
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(cur), nEmails, nIps, nCards))
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scrubbed", StringType, nullable = false),
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("n_cards", LongType, nullable = false)))
  override def prettyName: String = "graft_scrub_pii"

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("piiScrub", this)
    defineCodeGen(ctx, ev, c => s"(org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}

/** Polynomial rolling fingerprint over a token array in one native pass:
  * h = fold(tokens, 0, (h, t) => (h·131 + cp(t)·7 + numChars(t)) mod 1e9+7)
  * where cp(t) is the Unicode code point of the first character — DuckDB's
  * `ascii(substr(t,1,1))`. Replaces the interpreted `aggregate` HOF that
  * evaluated 4 sub-expressions per (row, token).
  */
object RollingFingerprint {
  private final val Mod = 1000000007L

  /** First code point of a UTF-8 byte sequence (0 for empty). */
  private def firstCodePoint(t: UTF8String): Long = {
    val b = t.getBytes
    if (b.length == 0) 0L
    else {
      val b0 = b(0) & 0xff
      if (b0 < 0x80) b0.toLong
      else if (b0 < 0xe0) (((b0 & 0x1f) << 6) | (b(1) & 0x3f)).toLong
      else if (b0 < 0xf0) (((b0 & 0x0f) << 12) | ((b(1) & 0x3f) << 6) | (b(2) & 0x3f)).toLong
      else (((b0 & 0x07) << 18) | ((b(1) & 0x3f) << 12) | ((b(2) & 0x3f) << 6) | (b(3) & 0x3f)).toLong
    }
  }

  def compute(tokens: ArrayData): Long = {
    var h = 0L
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val t = tokens.getUTF8String(i)
      h = (h * 131L + firstCodePoint(t) * 7L + t.numChars()) % Mod
      i += 1
    }
    h
  }
}

case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_fp"

  protected override def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}
