package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch analogue of Structured Streaming's
  * `session_window`, which the reference lacks entirely — SURVEY §2.7 lists
  * "Windows: none"; sessions are an additive capability of this engine).
  *
  * Classic lag/flag/cumsum: one shuffle on the key with a per-partition
  * sort; session ids are (key, running count of gap-breaks) — deterministic
  * and stable under repartitioning.
  */
object Sessionize {

  /** Assign `session_seq` (0-based per key) to each row: a new session
    * starts when the gap to the previous event exceeds `gapUs`.
    * `tieBreakCols` extend the ordering to a total one — required when
    * downstream consumers are tie-SENSITIVE (e.g. path strings); session
    * boundaries themselves are tie-insensitive (a tied row's gap is 0). */
  def assign(events: DataFrame, keyCol: String, tsCol: String, gapUs: Long,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy((tsCol +: tieBreakCols).map(col): _*)
    val isNew = when(
      col(tsCol) - lag(col(tsCol), 1).over(byKey) > gapUs, 1L
    ).otherwise(lit(0L))
    events
      .withColumn("_new_session", isNew)
      .withColumn("session_seq",
        sum(col("_new_session")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** Collapse to one row per session: bounds, duration, event count. */
  def summarize(events: DataFrame, keyCol: String, tsCol: String, gapUs: Long): DataFrame =
    assign(events, keyCol, tsCol, gapUs)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start_us"),
        max(col(tsCol)).as("session_end_us"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration_us"),
        count(lit(1)).as("n_events"))
}
