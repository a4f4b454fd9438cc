package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Pure offset/time-bound math for bounded Kafka reads (SURVEY §2.2 S1).
  *
  * The reference resolves a µs event-time `TimeRange` to per-partition
  * offset bounds with `consumer.offsetsForTimes`
  * (kafka/storage-kafka/.../KafkaLogStorage.scala:168-204) and then filters
  * residual records, because Kafka's index is MILLISECOND-resolution while
  * the range is microseconds. This object isolates that arithmetic so it is
  * unit-testable without a broker (none exists in this container):
  * `ChangelogStream.kafkaBounded` feeds `startMs`/`endMsCeil` to the Kafka
  * source options and applies `residual` on top; the spec drives the same
  * functions through a simulated `offsetsForTimes` over a synthetic
  * (partition, offset, ts) frame.
  *
  * Invariants (proved in KafkaBoundsSpec):
  *  - no record with ts_us in [startUs, endUs) is ever excluded by the
  *    ms-level offset bounds (floor start, ceil end), and
  *  - `residual` drops exactly the boundary-ms records the offset bounds
  *    over-include, so the composition selects precisely [startUs, endUs).
  */
object KafkaBounds {

  /** Millisecond timestamp handed to Kafka's start-offset lookup: FLOOR of
    * the µs bound. `offsetsForTimes(startMs)` returns the first offset with
    * ts >= startMs, and any record with ts_us >= startUs has
    * ts_ms >= floor(startUs/1000) — so flooring never skips an in-range
    * record; it can only over-include records earlier in the same ms, which
    * `residual` removes. */
  def startMs(startUs: Long): Long = Math.floorDiv(startUs, 1000L)

  /** Millisecond timestamp handed to Kafka's end-offset lookup: CEIL of the
    * µs bound. The ending offset is the first record with ts >= endMs
    * (exclusive bound), and any record with ts_us < endUs has
    * ts_ms <= (endUs-1)/1000 < ceil(endUs/1000) — so ceiling never cuts an
    * in-range record; boundary-ms over-includes are removed by `residual`. */
  def endMsCeil(endUs: Long): Long = Math.floorDiv(endUs + 999L, 1000L)

  /** The µs-exact predicate applied on top of the ms-level offset bounds. */
  def residual(tsUsCol: Column, startUs: Long, endUs: Long): Column =
    tsUsCol >= startUs && tsUsCol < endUs

  def applyResidual(df: DataFrame, tsUsCol: String, startUs: Long, endUs: Long): DataFrame =
    df.filter(residual(col(tsUsCol), startUs, endUs))

  /** Broker-semantics model of `consumer.offsetsForTimes`: for one
    * partition's (offset, tsMs) log in offset order, the earliest offset
    * whose timestamp is >= targetMs; None when the target is past every
    * record (Kafka returns null ⇒ the bound is the log end). Used by the
    * spec to simulate what the `startingTimestamp`/`endingTimestamp` options
    * resolve to. Kafka guarantees nothing about timestamp monotonicity
    * within a partition, and neither does this: it scans the whole log like
    * the broker's time index effectively does for CreateTime topics. */
  def offsetForTime(log: Seq[(Long, Long)], targetMs: Long): Option[Long] =
    log.collect { case (offset, tsMs) if tsMs >= targetMs => offset }
      .minOption

  /** Records a bounded read returns BEFORE the residual filter: per
    * partition, offsets in [offsetForTime(startMs), offsetForTime(endMs)),
    * end defaulting to log-end when endMs is past every record and start
    * defaulting to log-end (empty slice) when startMs is. Mirrors the
    * driver's KafkaOffsetRangeCalculator composition of the two
    * `offsetsForTimes` results. */
  def boundedSlice(
      log: Seq[(Long, Long)],
      startTargetMs: Long,
      endTargetMs: Long): Seq[(Long, Long)] = {
    val logEnd = log.map(_._1).maxOption.fold(0L)(_ + 1L)
    val lo = offsetForTime(log, startTargetMs).getOrElse(logEnd)
    val hi = offsetForTime(log, endTargetMs).getOrElse(logEnd)
    log.filter { case (offset, _) => offset >= lo && offset < hi }
  }
}
