package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state (SURVEY §2.7).
  *
  * The reference enriches one stream against the latest state of another
  * (stream-table, J6 — `AsOfJoin` in batch). The genuinely streaming
  * variant — both sides unbounded — needs the join state itself bounded or
  * it grows forever; Structured Streaming does that from two ingredients
  * this module packages together:
  *
  *  1. a watermark on BOTH inputs (callers set `withWatermark` — it needs
  *     the event-time column to be a TIMESTAMP, and the lateness bound is
  *     an input contract, not a join property), and
  *  2. a time-range join condition, from which Spark derives each side's
  *     state-retention window and evicts rows the other stream can no
  *     longer match.
  *
  * Without (2) an inner stream-stream join buffers both streams in full —
  * the 100 TB failure mode; with it, state is O(tolerance × rate).
  */
object StreamingJoins {

  /** Inner-join `left` to every `right` event at most `tolerance` (a SQL
    * interval string, e.g. "10 minutes") BEFORE the left event on the same
    * key — the bounded-state tolerance enrich. Column names must be
    * disjoint across the two frames; both frames must already carry
    * watermarks on their event-time columns. */
  def enrichWithinTolerance(
      left: DataFrame,
      right: DataFrame,
      keyPairs: Seq[(String, String)],
      leftTs: String,
      rightTs: String,
      tolerance: String): DataFrame = {
    val keyCond = keyPairs.map { case (l, r) => col(l) === col(r) }
    val rangeCond =
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $tolerance") &&
        col(rightTs) <= col(leftTs)
    left.join(right, (keyCond :+ rangeCond).reduce(_ && _))
  }
}
