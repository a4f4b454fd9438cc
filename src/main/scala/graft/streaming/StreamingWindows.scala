package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarks — the streaming-state
  * bound the reference lacks entirely (SURVEY §2.7: no windows, no late-data
  * machinery; its TTL drops too-old records on write). `withWatermark` is
  * the principled replacement: state for a window is dropped once the
  * watermark passes, and records later than the watermark are discarded —
  * the reference's `min.timestamp.ms` behavior, but with bounded state
  * guaranteed by the engine.
  */
object StreamingWindows {

  /** Tumbling event-time counts per (window, key). `tsCol` must be a
    * TimestampType column. */
  def tumblingCounts(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLength: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col(keyCol), col("n"))

  /** Session windows (gap-based) with watermark — the streaming analogue of
    * operators.Sessionize. */
  def sessionCounts(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col(keyCol), col("n"))
}
