package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-tolerant aggregation via key salting.
  *
  * At 100 TB a handful of hot keys (the empty document, a null user, a bot
  * account) can put one reducer hours behind the fleet. Salting splits each
  * key into `saltBuckets` sub-keys for a first partial aggregation, then
  * combines the partials in a second (tiny) aggregation — the classic
  * two-stage combiner, complementary to AQE's skew-join splitting (which
  * handles joins, not groupBy).
  *
  * Only ALGEBRAIC aggregates (reassociatable: sum/count/min/max) are safe to
  * split this way; the API takes the partial and final expressions
  * explicitly so the caller states both halves.
  */
object Skew {

  /** Two-stage salted aggregation.
    * `partials`: aggregates for (key, salt) groups; `finals`: how to combine
    * the partial columns per key (referencing the partial aliases). */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int)(
      partials: Seq[Column],
      finals: Seq[Column]): DataFrame = {
    // deterministic salt: hash the full row content so a retried map task
    // reproduces identical shuffle output (monotonically_increasing_id /
    // rand would re-salt rows differently across task attempts and
    // double-count or drop rows under fetch-failure retries). Hot keys
    // normally carry distinct payloads, so the content hash still spreads
    // them over `saltBuckets` reducers; full-duplicate rows share a bucket,
    // which only costs spread, never correctness. Map columns are excluded
    // (xxhash64 rejects MapType).
    val hashable = df.schema.fields.filterNot(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]).map(f => col(f.name))
    val saltExpr =
      if (hashable.isEmpty) lit(0L)
      else pmod(xxhash64(hashable.toSeq: _*), lit(saltBuckets.toLong))
    val salted = df.withColumn("_salt", saltExpr)
    salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Skewed equi-join via salting: the skewed (large) side gets a
    * deterministic content-hash salt; the other side is replicated once per
    * salt bucket; the join runs on (key, salt) — one hot key's rows spread
    * over `saltBuckets` parallel tasks instead of one straggler. Result is
    * row-identical to `large.join(small, keyCols)` (every matching pair
    * meets in exactly one bucket). Use when AQE's skew-join split can't
    * apply — broadcast-ineligible small side with a shuffled-hash/SMJ plan,
    * or AQE off; replication multiplies the small side ×`saltBuckets`, so
    * keep buckets modest. */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    require(!large.columns.contains("_salt") && !small.columns.contains("_salt"),
      "saltedJoin reserves the _salt column name")
    // salt from the hashABLE columns only (xxhash64 rejects MapType); as in
    // saltedAgg, byte-identical rows share a bucket — costs spread, never
    // correctness
    val hashable = large.schema.fields.filterNot(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]).map(f => col(f.name))
    val saltExpr =
      if (hashable.isEmpty) lit(0L)
      else pmod(xxhash64(hashable.toSeq: _*), lit(saltBuckets.toLong))
    val salted = large.withColumn("_salt", saltExpr)
    val replicated = small.withColumn(
      "_salt", explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    salted.join(replicated, keyCols :+ "_salt").drop("_salt")
  }

  /** Salted count + exact sum — the common hot-key rollup. The value is
    * ×100 integer-quantized per row, so both aggregation stages are plain
    * long sums (exact and reassociatable — the result equals the unsalted
    * `groupBy(key).agg(count, sum)` bit-for-bit) and stay in codegen'd
    * long hash-agg instead of decimal. */
  def saltedCountSum(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltBuckets: Int = 16,
      scale: Long = 100L): DataFrame =
    saltedAgg(df, keyCols, saltBuckets)(
      partials = Seq(
        count(lit(1)).as("_n"),
        sum(round(col(valueCol) * scale).cast("long")).as("_s")),
      finals = Seq(
        sum(col("_n")).as("n"),
        (sum(col("_s")).cast("double") / scale.toDouble).as("sum_value")))
}
