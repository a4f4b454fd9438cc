package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join via bucketized equi-join.
  *
  * The reference's time scoping is ad-hoc `TimeRange` predicates pushed into
  * per-key prefix scans (reference: api/.../util/TimeRange.java:80-165,
  * KVStoreLocal.scala:272-293) — a point lookup shape. The relational
  * generalization "every point inside every interval" is a theta join, which
  * Spark executes as BroadcastNestedLoopJoin (O(|points|·|intervals|)) unless
  * rewritten. This operator rewrites it as an equi-join:
  *
  *   - each point lands in exactly ONE bucket of width `bucketWidth`;
  *   - each interval explodes to its covered buckets (len/W + 2 rows max);
  *   - equi-join on bucket, then the EXACT residual `start ≤ p ≤ end`.
  *
  * Because a point matches from exactly one bucket, no dedup is needed — the
  * output is exactly the theta-join result. Any monotone bucketing preserves
  * correctness (`s ≤ p ≤ e ⇒ bucket(s) ≤ bucket(p) ≤ bucket(e)`, so the
  * exploded range always covers the point's bucket); exactness comes from
  * the residual filter alone. Pick `bucketWidth` ≈ the typical interval
  * length: shorter buckets multiply interval rows, longer buckets multiply
  * false candidate pairs.
  *
  * Scale shape: one shuffle per side on the bucket key (both prunable /
  * AQE-coalescible), candidate pairs bounded per bucket — the classic
  * MapReduce range-join decomposition, no quadratic stage anywhere.
  */
object RangeJoin {

  /** Join `points` (timestamp/long column `pointCol`) to `intervals`
    * (`startCol`..`endCol`, both inclusive, same units) — all columns of
    * both sides, one output row per (point, containing interval). Column
    * names must be disjoint across the two frames. */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // integer `div`, not `/`: double division corrupts epoch-µs magnitudes
    val pts = points.withColumn("_bucket", expr(s"`$pointCol` div ${bucketWidth}L"))
    val ivs = intervals
      .filter(col(endCol) >= col(startCol)) // sequence() counts DOWN when reversed
      .withColumn("_bucket",
        explode(sequence(
          expr(s"`$startCol` div ${bucketWidth}L"),
          expr(s"`$endCol` div ${bucketWidth}L"))))
    pts.join(ivs, "_bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Interval-overlap join: one output row per pair of intervals
    * (`a` × `b`, both ends inclusive, same units) with
    * `aStart ≤ bEnd AND bStart ≤ aEnd` — the theta join Spark would
    * otherwise nested-loop — decomposed into the same bucket equi-join as
    * `pointInInterval`. Both sides explode to their covered buckets; a
    * candidate pair meets in EVERY bucket the overlap spans, so instead of
    * a dedup shuffle the pair is emitted only from its canonical bucket —
    * the bucket of `greatest(aStart, bStart)`, the overlap's first bucket,
    * which both sides cover by construction. Output stays exactly the
    * theta-join result with zero extra shuffles.
    *
    * `keys`: optional equi-key columns (same names both sides) joined
    * alongside the bucket — the common "overlap within entity" shape, and
    * at scale the partitioning is (keys, bucket) so one entity's intervals
    * never all meet in one task unless they truly share a bucket.
    *
    * `maxBucketSize`: opt-in degenerate-bucket cap (default Long.MaxValue =
    * off), same contract as [[Dedup.capBuckets]]. A bucket populated by many
    * long overlapping intervals goes quadratic exactly like an LSH band —
    * with the cap on, each side drops all rows of any (keys, bucket) group
    * larger than the cap BEFORE the join, bounding pairs per bucket at cap².
    * Lossy (pairs whose canonical bucket was oversized disappear), so
    * oracle-compared callers must leave it off; 100 TB jobs should set it. */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      aStart: String, aEnd: String,
      bStart: String, bEnd: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil,
      maxBucketSize: Long = Dedup.defaultMaxBucketSize): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(df: DataFrame, s: String, e: String): DataFrame = {
      val exploded = df.filter(col(e) >= col(s)) // sequence() counts DOWN when reversed
        .withColumn("_bucket",
          explode(sequence(expr(s"`$s` div ${bucketWidth}L"), expr(s"`$e` div ${bucketWidth}L"))))
      // window count partitions on (keys, _bucket) — the join's own
      // partitioning, so the exchange is reused, not added
      Dedup.capBuckets(exploded, keys :+ "_bucket", maxBucketSize)
    }
    buckets(a, aStart, aEnd).join(buckets(b, bStart, bEnd), keys :+ "_bucket")
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("_bucket") === expr(s"greatest(`$aStart`, `$bStart`) div ${bucketWidth}L"))
      .drop("_bucket")
  }
}
