package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram repetition stats of a string in one native pass:
  * `[total n-grams, distinct n-grams]` where distinctness is over the 60-bit
  * md5 hash of each space-joined gram (the engine-portable set convention —
  * `substr(md5(gram),1,15)` in the oracle, collision odds ~n²/2^60).
  *
  * The duplicate-gram fraction `(total-distinct)/total` is the standard
  * repetition quality signal for training-data curation (Gopher-style
  * "duplicate n-gram ratio"). Splitting is on single spaces with empty
  * tokens KEPT — exactly DuckDB `string_split(text, ' ')` — so grams equal
  * the corresponding char substrings of single-space-normalized text.
  *
  * Equivalent HOF spelling (interpreted per gram, ~10× slower):
  * `transform(sequence(...), i -> md5Hash60(concat_ws(' ', slice(...))))`
  * then size + size(array_distinct).
  */
object WordNgramStats {

  def compute(str: UTF8String, n: Int): ArrayData = {
    val words = str.toString.split(" ", -1)
    val total = words.length - n + 1
    if (total <= 0) return new GenericArrayData(Array(0L, 0L))
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
    java.util.Arrays.sort(hashes)
    var distinct = 1L
    var r = 1
    while (r < total) {
      if (hashes(r) != hashes(r - 1)) distinct += 1
      r += 1
    }
    new GenericArrayData(Array(total.toLong, distinct))
  }
}

case class WordNgramStats(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_wngram_stats"

  protected override def nullSafeEval(input: Any): Any =
    WordNgramStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgramStats.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramStats =
    copy(child = newChild)
}
