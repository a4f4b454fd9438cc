package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R8 CDC listener as `observe()` metrics: the reference registers a
  * partial function over every record change (KVStore.listen,
  * KVStoreLocal.scala:551-558); side-effecting listeners map to
  * `foreachBatch` (see ChangelogStream), while *metric* listeners — count
  * the changes, sum the tombstones, watch the event-time frontier — map to
  * named observations that Spark delivers per action/micro-batch through
  * QueryExecutionListener / StreamingQueryListener without a second pass
  * over the data. */
object CdcMetrics {

  val ObservationName = "graft_cdc"

  /** Attach standard changelog observations: record count, tombstone count,
    * max event time. Works on batch and streaming DataFrames alike.
    * Observation names must be unique within a query plan — pass a distinct
    * `name` when instrumenting more than one changelog in one query. */
  def observed(changelog: DataFrame, tsCol: String, tombstoneCol: Option[String],
      name: String = ObservationName): DataFrame = {
    val tombstones = tombstoneCol
      .map(tc => sum(when(coalesce(col(tc), lit(false)), 1L).otherwise(0L)))
      .getOrElse(lit(0L))
      .as("n_tombstones")
    changelog.observe(name,
      count(lit(1)).as("n_changes"),
      tombstones,
      max(col(tsCol)).as("max_ts_us"))
  }
}
