package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Half-open event-time interval `[startUs, endUs)` over epoch microseconds.
  *
  * Re-expression of the reference's TimeRange algebra
  * (reference: api/src/main/java/io/amient/affinity/core/util/TimeRange.java:76-165)
  * as a predicate factory over a Catalyst timestamp/epoch column: instead of
  * driving a RocksDB seek, the predicate lands in a `Filter` node and is
  * pushed to the parquet scan (min/max row-group pruning), which is the
  * columnar equivalent of the reference's offset-bounded log read
  * (kafka/storage-kafka/.../KafkaLogStorage.scala:168-204).
  */
final case class TimeRange(startUs: Long, endUs: Long) {
  require(startUs <= endUs, s"invalid TimeRange [$startUs, $endUs)")

  /** Predicate for an epoch-µs Long column. */
  def contains(tsUs: Column): Column = tsUs >= lit(startUs) && tsUs < lit(endUs)

  def durationUs: Long = endUs - startUs

  def intersect(other: TimeRange): TimeRange = {
    val s = math.max(startUs, other.startUs)
    val e = math.min(endUs, other.endUs)
    if (s >= e) TimeRange.Empty else TimeRange(s, e)
  }
}

object TimeRange {
  val Unbounded: TimeRange = TimeRange(Long.MinValue, Long.MaxValue)
  val Empty: TimeRange = TimeRange(0L, 0L)
  /** Everything strictly before `endUs` — reference `TimeRange.until`. */
  def until(endUs: Long): TimeRange = TimeRange(Long.MinValue, endUs)
  /** Everything at/after `startUs` — reference `TimeRange.since`. */
  def since(startUs: Long): TimeRange = TimeRange(startUs, Long.MaxValue)
  /** The `lengthUs`-long window ending at `endUs` — reference `TimeRange.prev`. */
  def prev(lengthUs: Long, endUs: Long): TimeRange = TimeRange(endUs - lengthUs, endUs)
  /** The `lengthUs`-long window starting at `startUs` — reference `TimeRange.next`. */
  def next(lengthUs: Long, startUs: Long): TimeRange = TimeRange(startUs, startUs + lengthUs)
}
