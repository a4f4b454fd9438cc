package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a token array in one native pass.
  *
  * Semantics (bit-identical to the SQL/oracle form): distinct word
  * `shingleSize`-grams joined with spaces; each shingle is hashed ONCE to a
  * 60-bit md5 prefix `h` (CharNgramHashSet.hash60 ≡ DuckDB
  * `CAST(concat('0x', substr(md5(g),1,15)) AS BIGINT)`); signature position
  * i is `min over shingles of (aᵢ·h + bᵢ) mod (2^61−1)` — the textbook
  * universal-hash permutation family. One digest per shingle instead of one
  * per (shingle, permutation): 8× less hashing than the md5-per-seed
  * formulation this replaces, which is exactly the term that dominates at
  * corpus scale. aᵢ (odd) and bᵢ are themselves fixed 60-bit md5 prefixes,
  * so the oracle reproduces everything from md5 + 128-bit integer modmul
  * (HUGEINT); the Spark side does the same modmul exactly in 64-bit via
  * Math.multiplyHigh and 2^64 ≡ 8 (mod 2^61−1).
  *
  * Returns an EMPTY array when the document has fewer than `shingleSize`
  * tokens (callers filter on `size > 0`, matching what the relational
  * explode dropped implicitly).
  */
object MinHashSignature {
  /** Mersenne prime modulus 2^61−1 of the permutation family. */
  val P: Long = (1L << 61) - 1

  /** Deterministic multiplier for permutation i: 60-bit md5 prefix of
    * "mh_a_{i}", forced odd (nonzero, coprime-ish spread). */
  def coeffA(i: Int): Long = CharNgramHashSet.hash60(s"mh_a_$i") | 1L

  /** Deterministic offset for permutation i: 60-bit md5 prefix of "mh_b_{i}". */
  def coeffB(i: Int): Long = CharNgramHashSet.hash60(s"mh_b_$i")

  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]
  private def coeffs(numHashes: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(numHashes,
      n => (Array.tabulate(n)(coeffA), Array.tabulate(n)(coeffB)))

  /** (a·h + b) mod 2^61−1 for 0 ≤ a,h,b < 2^61, exactly, in 64-bit space:
    * the 122-bit product is hi·2^64 + lo; 2^64 ≡ 8 (mod 2^61−1) and
    * hi < 2^58, so the residue folds into hi·8 + (lo mod p) < 2^62. */
  def permute(h: Long, a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, h)
    val lo = a * h
    val r = (hi * 8 + java.lang.Long.remainderUnsigned(lo, P)) % P
    (r + b) % P
  }

  def compute(tokens: ArrayData, numHashes: Int, shingleSize: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < shingleSize) return new GenericArrayData(Array.emptyLongArray)
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
    val (as, bs) = coeffs(numHashes)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      val h = CharNgramHashSet.hash60(it.next())
      var k = 0
      while (k < numHashes) {
        val v = permute(h, as(k), bs(k))
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature.compute($c, $numHashes, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
