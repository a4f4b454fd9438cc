package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: injects the engine's native
  * expressions into every session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions`), so SQL users get them without calling
  * `GraftFunctions.register` imperatively.
  *
  * This is the full extent of custom Catalyst surface the engine needs —
  * per SURVEY §4 no custom LogicalPlan/Strategy is warranted (every
  * operator is expressible with built-ins); the extension points used are
  * scalar Expressions only, all codegen'd.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")
    ext.injectFunction((
      FunctionIdentifier("graft_murmur2"),
      info("graft_murmur2", "Kafka-parity murmur2 over binary input"),
      (children: Seq[Expression]) => Murmur2Expr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_ldot"),
      info("graft_ldot", "integer dot product of two array<bigint>"),
      (children: Seq[Expression]) => LongArrayDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sic"),
      info("graft_sic", "|A∩B| of two sorted distinct array<bigint>"),
      (children: Seq[Expression]) => SortedLongIntersectCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cngrams"),
      info("graft_cngrams", "sorted distinct 60-bit md5 hashes of char n-grams"),
      (children: Seq[Expression]) =>
        CharNgramHashSet(children(0), children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "minhash signature of a token array"),
      (children: Seq[Expression]) => MinHashSignature(children(0),
        children(1).eval().asInstanceOf[Number].intValue(),
        children(2).eval().asInstanceOf[Number].intValue())))
  }
}
