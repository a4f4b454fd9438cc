package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text primitives.
  *
  * The declarative formulations of these (HOF `filter`/`transform`/
  * `aggregate` over token arrays) are interpreted per element in Spark —
  * measured as the dominant cost of every text-analysis query at sf0.1.
  * Each expression here computes the identical result in one codegen'd
  * pass over the token array (bit-identical to the DuckDB oracle).
  */
object TextNative {
  private[functions] val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
}

/** Lowercased whitespace tokens with empty tokens removed — exactly
  * `filter(split(lower(trim(text)), "\\s+"), t => t =!= "")`:
  * UTF8String.trim/toLowerCase are the same kernels Spark's trim/lower use,
  * and Java-regex `\s` is the ASCII set [ \t\n\x0B\f\r], all single bytes
  * in UTF-8, so a byte scan splits identically. */
object TokenizeText {
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.trim().toLowerCase().getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    var start = 0
    while (i <= bytes.length) {
      val atWs = i < bytes.length && {
        val b = bytes(i)
        b == 0x20 || (b >= 0x09 && b <= 0x0d)
      }
      if (i == bytes.length || atWs) {
        if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

case class TokenizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  protected override def nullSafeEval(input: Any): Any =
    TokenizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeText =
    copy(child = newChild)
}

/** SimHash over a token array: per token (duplicates included) the per-token
  * value is the md5(token) prefix — first 4 hex digits (16 bits) when
  * `bits <= 16`, first 8 hex digits (32 bits) otherwise; bit i of the result
  * is set iff more than half the tokens have bit i set. Equals the
  * declarative per-bit `aggregate` majority vote (and the oracle's
  * strpos-over-md5-hex arithmetic) exactly. The 16-bit path is kept
  * byte-identical to the original (d3/d9/d15 fingerprints unchanged);
  * wider fingerprints exist so band buckets stay sparse as the corpus
  * grows (d25's 8-bit bands: 256 values per band instead of 16). */
object SimHashBits {
  def compute(tokens: ArrayData, bits: Int): Long = {
    val n = tokens.numElements()
    val counts = new Array[Long](32)
    val md = TextNative.localMd.get()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(tokens.getUTF8String(i).getBytes)
      val d = md.digest()
      val v: Long =
        if (bits <= 16) ((d(0) & 0xffL) << 8) | (d(1) & 0xff)
        else ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xff)
      var b = 0
      while (b < bits) {
        if ((v & (1L << b)) != 0) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) * 2 > n) sim |= 1L << b
      b += 1
    }
    sim
  }
}

/** Count of ASCII letters in a string — equals
  * `length(regexp_replace(s, "[^a-zA-Z]", ""))` because [A-Za-z] code
  * points are single-byte in UTF-8 and continuation bytes are >= 0x80, so
  * a byte scan counts exactly the chars the regex keeps. Replaces the
  * regex spelling in every alpha-ratio quality site: regexp_replace
  * materializes the stripped string per row (the dominant cost of t2/d16's
  * quality projection on a single-split scan); this is one allocation-free
  * pass. */
object AsciiAlphaCount {
  def compute(s: UTF8String): Long = {
    val b = s.getBytes
    var i = 0
    var n = 0L
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) n += 1L
      i += 1
    }
    n
  }
}

case class AsciiAlphaCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_alpha_count"

  protected override def nullSafeEval(input: Any): Any =
    AsciiAlphaCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AsciiAlphaCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiAlphaCount =
    copy(child = newChild)
}

case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 32,
    "simhash uses the first 4 (bits<=16) or 8 (bits<=32) md5 hex digits")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  protected override def nullSafeEval(input: Any): Any =
    SimHashBits.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashBits.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

/** Count of tokens (duplicates included) contained in a fixed word set —
  * equals `size(filter(toks, t => t.isin(words: _*)))`. The set is baked
  * into the expression as a comma-separated literal so the lookup is one
  * hash probe per token instead of an interpreted isin per (token, word). */
case class StopwordCount(child: Expression, csv: String) extends UnaryExpression {
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    csv.split(",").foreach(w => if (w.nonEmpty) s.add(UTF8String.fromString(w)))
    s
  }

  def compute(tokens: ArrayData): Long = {
    var c = 0L
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (set.contains(tokens.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_stopcount"

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordCount", this)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCount =
    copy(child = newChild)
}

/** Stopword-argmax language ID in one pass. Spec format
  * `"de:der,die;en:the,a"`. Per language the score is the number of tokens
  * (duplicates included) in its list; the winner is the max score with ties
  * broken to the lexicographically LAST language code (the struct ordering
  * of the declarative `array_max` form); an all-zero score maps to "und". */
case class PredictedLang(child: Expression, spec: String) extends UnaryExpression {
  @transient private lazy val (langs: Array[String], lookup: java.util.HashMap[UTF8String, Array[Int]]) = {
    val entries = spec.split(";").map { part =>
      val Array(lang, words) = part.split(":", 2)
      (lang, words.split(","))
    }
    val byWord = scala.collection.mutable.Map.empty[String, List[Int]]
    entries.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach(w => byWord(w) = i :: byWord.getOrElse(w, Nil))
    }
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    byWord.foreach { case (w, is) => m.put(UTF8String.fromString(w), is.toArray) }
    (entries.map(_._1), m)
  }
  @transient private lazy val und = UTF8String.fromString("und")
  @transient private lazy val langsUtf8 = langs.map(UTF8String.fromString)

  def compute(tokens: ArrayData): UTF8String = {
    val scores = new Array[Long](langs.length)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val hit = lookup.get(tokens.getUTF8String(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { scores(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    var best = -1
    var k = 0
    while (k < langs.length) {
      if (best < 0 || scores(k) > scores(best) ||
        (scores(k) == scores(best) && langs(k) > langs(best))) best = k
      k += 1
    }
    if (best < 0 || scores(best) == 0) und else langsUtf8(best)
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid"

  protected override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("predictedLang", this)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PredictedLang =
    copy(child = newChild)
}

/** Σ length(token) in characters (code points — UTF8String.numChars, the
  * same kernel Spark's `length` uses), equal to the declarative
  * `aggregate(toks, 0L, (acc, t) => acc + length(t))`. */
object SumTokenChars {
  def compute(tokens: ArrayData): Long = {
    var s = 0L
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      s += tokens.getUTF8String(i).numChars()
      i += 1
    }
    s
  }
}

case class SumTokenChars(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_toklen"

  protected override def nullSafeEval(input: Any): Any =
    SumTokenChars.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SumTokenChars.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SumTokenChars =
    copy(child = newChild)
}
