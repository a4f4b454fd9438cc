package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** J2 scatter-gather with a user-supplied commutative combiner.
  *
  * The reference broadcasts a question to every partition and reduces the
  * replies with `gather(r1, r2)` (core/.../util/AckSupport.scala:64-77,
  * Group.scala:84-89). In Spark the combiner IS `Aggregator.merge`: Catalyst
  * runs `reduce` map-side per partition and `gather` in the final
  * aggregation — the identical partial/final split, with spill handling and
  * codegen for free.
  */
object Gather {

  /** A gather over long-valued observations: count + exact sum — the
    * canonical commutative combiner (word-count/cents-sum shape). */
  case class CountSum(n: Long, sum: Long)

  val countSum: Aggregator[Long, CountSum, CountSum] =
    new Aggregator[Long, CountSum, CountSum] {
      override def zero: CountSum = CountSum(0L, 0L)
      override def reduce(b: CountSum, a: Long): CountSum = CountSum(b.n + 1, b.sum + a)
      /** The reference's `gather(r1, r2)`. */
      override def merge(b1: CountSum, b2: CountSum): CountSum =
        CountSum(b1.n + b2.n, b1.sum + b2.sum)
      override def finish(r: CountSum): CountSum = r
      override def bufferEncoder: Encoder[CountSum] = Encoders.product[CountSum]
      override def outputEncoder: Encoder[CountSum] = Encoders.product[CountSum]
    }

  /** Column form, usable in `groupBy(...).agg(...)`. */
  def countSumUdaf(value: Column): Column =
    udaf(countSum, Encoders.scalaLong).apply(value)
}
