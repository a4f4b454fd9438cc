package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a token array in one native pass.
  *
  * Semantics (bit-identical to the declarative/oracle form): distinct word
  * `shingleSize`-grams joined with spaces; signature position i is
  * `min(md5Hex(s"$i|" + shingle))` over the shingles. The min is tracked on
  * raw digest bytes (hex order ≡ unsigned byte order) with a thread-local
  * MessageDigest — Spark's `md5` expression allocates a digest per call and
  * the relational formulation shuffles an exploded shingle row per (doc,
  * shingle); this computes the whole signature at scan time with zero extra
  * rows. Returns an EMPTY array when the document has fewer than
  * `shingleSize` tokens (callers filter on `size > 0`, matching what the
  * relational explode dropped implicitly).
  */
object MinHashSignature {
  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def compute(tokens: ArrayData, numHashes: Int, shingleSize: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < shingleSize) return new GenericArrayData(Array.empty[Any])
    val md = localMd.get()
    // distinct shingles
    val shingles = new java.util.HashSet[String]()
    var i = 0
    while (i <= n - shingleSize) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < shingleSize) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      shingles.add(sb.toString)
      i += 1
    }
    val mins = new Array[Array[Byte]](numHashes)
    val it = shingles.iterator()
    while (it.hasNext) {
      val s = it.next()
      var h = 0
      while (h < numHashes) {
        md.reset()
        md.update(s"$h|$s".getBytes("UTF-8"))
        val d = md.digest()
        if (mins(h) == null || unsignedLess(d, mins(h))) mins(h) = d
        h += 1
      }
    }
    new GenericArrayData(mins.map(d => UTF8String.fromString(hex(d))))
  }
}

case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature.compute($c, $numHashes, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
