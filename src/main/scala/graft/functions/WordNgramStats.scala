package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared word n-gram hashing: split on single spaces with empty tokens KEPT
  * — exactly DuckDB `string_split(text, ' ')` — and hash every space-joined
  * n-word gram to its 60-bit md5 prefix (the engine-portable set convention,
  * `substr(md5(gram),1,15)` in the oracle; collision odds ~n²/2^60). */
object WordNgrams {

  /** 60-bit hashes of all n-grams in document order (duplicates included). */
  def hashAll(str: UTF8String, n: Int): Array[Long] = {
    val words = str.toString.split(" ", -1)
    val total = words.length - n + 1
    if (total <= 0) return Array.emptyLongArray
    val hashes = new Array[Long](total)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      hashes(i) = CharNgramHashSet.hash60(sb.toString)
      i += 1
    }
    hashes
  }

  /** In-place sort + dedup prefix length. */
  private[functions] def sortedDistinctLen(hashes: Array[Long]): Int = {
    java.util.Arrays.sort(hashes)
    var w = 1
    var r = 1
    while (r < hashes.length) {
      if (hashes(r) != hashes(w - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    w
  }
}

/** Word n-gram repetition stats of a string in one native pass:
  * `[total n-grams, distinct n-grams]`. The duplicate-gram fraction
  * `(total-distinct)/total` is the standard repetition quality signal for
  * training-data curation (Gopher-style "duplicate n-gram ratio").
  *
  * Equivalent HOF spelling (interpreted per gram, ~10× slower):
  * `transform(sequence(...), i -> md5Hash60(concat_ws(' ', slice(...))))`
  * then size + size(array_distinct).
  */
object WordNgramStats {
  def compute(str: UTF8String, n: Int): ArrayData = {
    val hashes = WordNgrams.hashAll(str, n)
    if (hashes.isEmpty) return new GenericArrayData(Array(0L, 0L))
    val distinct = WordNgrams.sortedDistinctLen(hashes)
    new GenericArrayData(Array(hashes.length.toLong, distinct.toLong))
  }
}

case class WordNgramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word n-gram size must be >= 1 (got $n)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_wngram_stats"

  protected override def nullSafeEval(input: Any): Any =
    WordNgramStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgramStats.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramStats =
    copy(child = newChild)
}

/** Sorted distinct 60-bit hashes of a string's word n-grams — the word-level
  * sibling of CharNgramHashSet, used for n-gram overlap operators
  * (decontamination, set similarity on surface word sequences). */
object WordNgramHashSet {
  def compute(str: UTF8String, n: Int): ArrayData = {
    val hashes = WordNgrams.hashAll(str, n)
    if (hashes.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val w = WordNgrams.sortedDistinctLen(hashes)
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }
}

case class WordNgramHashSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word n-gram size must be >= 1 (got $n)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_wngrams"

  protected override def nullSafeEval(input: Any): Any =
    WordNgramHashSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgramHashSet.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashSet =
    copy(child = newChild)
}

/** N-gram TEXT lists in one native pass — document order, duplicates
  * included (unlike the hash-set forms above): the gram frame for
  * operators that need the surface string back (repeated-span audits) or
  * per-occurrence multiplicity (language models, feature counting).
  * Equivalent HOF spelling, interpreted per gram:
  * `transform(sequence(0, size(ws)-n), i -> concat_ws(' ', slice(ws, i+1, n)))`. */
object NgramJoin {
  /** Space-joined n-grams of a pre-split word array. */
  def fromWords(words: Array[String], n: Int): ArrayData = {
    val total = words.length - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val grams = new Array[Any](total)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      grams(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(grams)
  }

  /** Surface form: split on single spaces, empties KEPT — exactly DuckDB
    * `string_split(text, ' ')` (the WordNgrams convention). */
  def computeStr(str: UTF8String, n: Int): ArrayData =
    fromWords(str.toString.split(" ", -1), n)

  /** Token-array form (for `graft_tokens` output or any array<string>). */
  def computeArr(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val words = new Array[String](len)
    var i = 0
    while (i < len) { words(i) = arr.getUTF8String(i).toString; i += 1 }
    fromWords(words, n)
  }
}

/** Surface-form word n-gram text list of a string (single-space split,
  * empties kept, duplicates included, document order). */
case class WordNgramList(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word n-gram size must be >= 1 (got $n)")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_wngram_list"

  protected override def nullSafeEval(input: Any): Any =
    NgramJoin.computeStr(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramJoin.computeStr($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramList =
    copy(child = newChild)
}

/** Re-join a single-space-split text with the tokens at the given sorted
  * positions REMOVED — the span-trim rebuild: equivalent to
  * `array_join(transform(array_sort(collect_list(struct(p, tok))), x -> x.tok), " ")`
  * over the kept (position, token) rows, computed in one native pass over
  * the ORIGINAL text instead of a token-explode + anti-join + per-doc
  * interpreted HOF rollup. Split convention is WordNgrams' single-space
  * split with empties KEPT (DuckDB `string_split(text, ' ')`); `positions`
  * must be sorted ascending and non-null (out-of-range entries are
  * ignored — they cannot arise from in-bounds gram windows). */
object DropTokensAt {
  def compute(str: UTF8String, positions: ArrayData): UTF8String = {
    val words = str.toString.split(" ", -1)
    val np = positions.numElements()
    val sb = new java.lang.StringBuilder(str.numBytes())
    var pi = 0
    var i = 0
    var first = true
    while (i < words.length) {
      while (pi < np && positions.getInt(pi) < i) pi += 1
      val drop = pi < np && positions.getInt(pi) == i
      if (!drop) {
        if (!first) sb.append(' ')
        sb.append(words(i))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class DropTokensAt(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_drop_tokens_at"

  protected override def nullSafeEval(s: Any, p: Any): Any =
    DropTokensAt.compute(s.asInstanceOf[UTF8String], p.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p) => s"graft.functions.DropTokensAt.compute($s, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropTokensAt =
    copy(left = newLeft, right = newRight)
}

/** Space-joined n-gram text list of a token ARRAY (duplicates included,
  * document order) — the multiplicity-preserving sibling of
  * [[graft.functions.GraftFunctions.wordNgrams]]. */
case class TokenNgramList(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1 (got $n)")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_tngram_list"

  protected override def nullSafeEval(input: Any): Any =
    NgramJoin.computeArr(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramJoin.computeArr($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenNgramList =
    copy(child = newChild)
}
