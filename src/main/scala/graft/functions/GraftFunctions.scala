package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** Column-level function library.
  *
  * Everything here is built from `org.apache.spark.sql.functions` (codegen'd)
  * or native Catalyst expressions — no Scala UDFs in hot paths. Determinism
  * is a design requirement throughout: hashing is md5-derived (stable across
  * engines for oracle checks), float math is either integer-quantized or a
  * sequential double fold (`aggregate`), never an order-sensitive parallel
  * reduction.
  */
object GraftFunctions {

  /** Register expression-backed functions for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_murmur2", (children: Seq[Expression]) => Murmur2Expr(children.head), "built-in")
  }

  /** Kafka-parity murmur2 over UTF-8 bytes of a string column (J1 routing). */
  def murmur2(c: Column): Column = {
    // Routed through the registered SQL function so we don't depend on the
    // (private) Column-from-Expression constructor.
    call_function("graft_murmur2", c.cast("binary"))
  }

  /** Kafka default partitioner: non-negative murmur2 mod numPartitions. */
  def kafkaPartition(key: Column, numPartitions: Int): Column =
    pmod(murmur2(key).bitwiseAND(lit(0x7fffffff)), lit(numPartitions))

  // --------------------------------------------------------------------
  // Registry wire format (reference AvroSerde.scala:123-138): every payload
  // is framed `magic(1 byte = 0) ++ schemaId(4 bytes BE) ++ body`. Built
  // purely from codegen'd byte functions.
  // --------------------------------------------------------------------

  /** Frame a binary payload with the 5-byte registry header. */
  def wrapRegistry(payload: Column, schemaId: Column): Column =
    concat(
      to_binary(lit("00"), lit("hex")),
      to_binary(lpad(hex(schemaId.cast("int")), 8, "0"), lit("hex")),
      payload)

  /** Schema id from a framed payload (bytes 2-5, big-endian). */
  def registrySchemaId(framed: Column): Column =
    conv(hex(substring(framed, 2, 4)), 16, 10).cast("int")

  /** Strip the 5-byte header → body bytes. */
  def unwrapRegistry(framed: Column): Column =
    substring(framed, 6, Int.MaxValue)

  // --------------------------------------------------------------------
  // Text primitives (shared by dedup / text-analysis operators)
  // --------------------------------------------------------------------

  /** Lowercased whitespace tokens, empty tokens removed. Matches the
    * reference's index tokenizer `title.split("\\s").trim.toLowerCase`
    * (examples/.../ESecondaryIndex.scala:109-111) modulo empty-token hygiene. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= lit(""))

  /** Distinct word n-grams joined with a space. Empty array when the doc has
    * fewer than n tokens (guard: Spark `sequence(a,b)` with a>b counts DOWN). */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Distinct character n-grams of a (pre-normalized) string. */
  def charNgrams(s: Column, n: Int): Column =
    when(length(s) >= n,
      array_distinct(transform(
        sequence(lit(1), length(s) - (n - 1)),
        i => s.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Normalize text for fingerprinting: lowercase, collapse whitespace. */
  def normalizeText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Deterministic 60-bit non-negative hash from md5 (stable across engines:
    * DuckDB `md5` produces the same hex). Used where a numeric hash is
    * needed; where only ordering matters we compare md5 hex strings directly. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  // --------------------------------------------------------------------
  // Vector primitives over Array[Float]/Array[Double] embedding columns.
  // Sequential left-fold => deterministic bit-exact results independent of
  // partitioning (and reproducible in the DuckDB oracle).
  // --------------------------------------------------------------------

  /** Dot product as a sequential double fold. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity (0 for zero-norm inputs). */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotProduct(a, b) / denom)
  }

  /** Integer-quantized embedding (×1000, rounded) — exact arithmetic for
    * order-independent operations like LSH hyperplane signs. */
  def quantize1000(a: Column): Column =
    transform(a, x => round(x.cast("double") * 1000).cast("long"))

  /** Cosine over ×1000-quantized vectors: dot and norms are exact integer
    * folds, so the final double is bit-identical regardless of partitioning
    * or engine (the oracle reproduces it exactly) — at a ~1e-3 quantization
    * cost that is irrelevant for near-dup/ANN ranking. */
  def quantizedCosine(a: Column, b: Column): Column = {
    val qa = quantize1000(a)
    val qb = quantize1000(b)
    val dot = aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val na = aggregate(qa, lit(0L), (acc, x) => acc + x * x)
    val nb = aggregate(qb, lit(0L), (acc, x) => acc + x * x)
    when(na * nb === 0L, lit(0.0))
      .otherwise(dot.cast("double") / sqrt((na * nb).cast("double")))
  }
}
