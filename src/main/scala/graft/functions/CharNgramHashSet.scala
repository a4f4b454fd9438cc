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
    val hashes =
      if (n <= 3) {
        // Natural-language n-grams repeat heavily: dedup BEFORE hashing so
        // md5 runs once per DISTINCT gram. A gram of ≤3 code points packs
        // into one long (21 bits per cp, max cp 0x10FFFF), so dedup is a
        // primitive sort — no per-occurrence String or digest.
        val packed = new Array[Long](count)
        var i = 0
        while (i < count) {
          var k = 0L
          var j = 0
          while (j < n) { k = (k << 21) | cps(i + j); j += 1 }
          packed(i) = k
          i += 1
        }
        java.util.Arrays.sort(packed)
        val out = new Array[Long](count)
        val gram = new Array[Int](n)
        var w = 0
        var r = 0
        while (r < count) {
          if (r == 0 || packed(r) != packed(r - 1)) {
            var k = packed(r)
            var j = n - 1
            while (j >= 0) { gram(j) = (k & 0x1fffff).toInt; k >>>= 21; j -= 1 }
            out(w) = hash60(new String(gram, 0, n))
            w += 1
          }
          r += 1
        }
        java.util.Arrays.copyOf(out, w)
      } else {
        val all = new Array[Long](count)
        var i = 0
        while (i < count) {
          all(i) = hash60(new String(cps, i, n))
          i += 1
        }
        all
      }
    // sort + dedup the hash values (distinct grams could still collide)
    java.util.Arrays.sort(hashes)
    var w = 1
    var r = 1
    while (r < hashes.length) {
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
