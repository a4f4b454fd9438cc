package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram hash set of a string: sorted distinct 60-bit md5 hashes
  * of every n-char substring, in one native pass.
  *
  * Numerically identical to
  * `array_sort(array_distinct(transform(charNgrams(s,n), g -> md5Hash60(g))))`
  * — the hash is the first 15 hex chars of md5 read as a number, i.e. the
  * top 60 bits of the digest — but ~10× faster: the HOF stack is interpreted
  * per element (~3 ms/doc measured); this is a tight loop with a
  * thread-local digest. The oracle equivalent intersects
  * `substr(md5(gram),1,15)` strings (bijective with the long).
  */
object CharNgramHashSet {
  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(gram-utf8) == value of first 15 hex chars. */
  def hash60(s: String): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val be = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  def compute(str: UTF8String, n: Int): ArrayData = {
    // iterate CODE POINTS, not UTF-16 units: Spark's substr and DuckDB's
    // substr both count code points, and the documented equality with
    // charNgrams must hold for supplementary characters too
    val cps = str.toString.codePoints().toArray
    val count = cps.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hashes = new Array[Long](count)
    var i = 0
    while (i < count) {
      hashes(i) = hash60(new String(cps, i, n))
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // dedup in place
    var w = 1
    var r = 1
    while (r < count) {
      if (hashes(r) != hashes(w - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }
}

case class CharNgramHashSet(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_ngram_hashset"

  protected override def nullSafeEval(input: Any): Any =
    CharNgramHashSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgramHashSet.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashSet =
    copy(child = newChild)
}
