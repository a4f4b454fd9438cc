package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Murmur2 hash with Kafka-producer parity, as a native Catalyst expression
  * (codegen'd — stays inside WholeStageCodegen, unlike a Scala UDF).
  *
  * The reference routes every keyed message to its owner partition with
  * murmur2 over the serialized key, exactly like Kafka's default partitioner
  * (reference: api/.../Murmur2Partitioner.java, core/.../actor/Group.scala:106-128,
  * pinned by kafka/.../KafkaPartitionerSpec.scala). Spark's built-in `hash`
  * is murmur3, so co-partitioning checks against Kafka topics need this.
  * Algorithm constants are the public murmur2 ones (seed 0x9747b28c, m
  * 0x5bd1e995, r 24) as published in Kafka's `Utils.murmur2`.
  */
object Murmur2 {
  def hash(data: Array[Byte]): Int = {
    val length = data.length
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4 + 0) & 0xff) +
        ((data(i4 + 1) & 0xff) << 8) +
        ((data(i4 + 2) & 0xff) << 16) +
        ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    (length % 4) match {
      case 3 =>
        h ^= (data((length & ~3) + 2) & 0xff) << 16
        h ^= (data((length & ~3) + 1) & 0xff) << 8
        h ^= data(length & ~3) & 0xff
        h *= m
      case 2 =>
        h ^= (data((length & ~3) + 1) & 0xff) << 8
        h ^= data(length & ~3) & 0xff
        h *= m
      case 1 =>
        h ^= data(length & ~3) & 0xff
        h *= m
      case _ =>
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** Kafka default partitioner: `(murmur2(keyBytes) & 0x7fffffff) % n`. */
  def partition(keyBytes: Array[Byte], numPartitions: Int): Int =
    (hash(keyBytes) & 0x7fffffff) % numPartitions
}

/** Input must already be BinaryType (callers cast — see
  * GraftFunctions.murmur2). */
case class Murmur2Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_murmur2"

  protected override def nullSafeEval(input: Any): Any =
    Murmur2.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Murmur2.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Murmur2Expr =
    copy(child = newChild)
}
