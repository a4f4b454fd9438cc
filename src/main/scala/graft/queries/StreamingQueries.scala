package graft.queries

import graft.core.Tables
import graft.streaming.StreamRun
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Support._

/** Oracle-verified Structured Streaming queries (w*): each one runs a REAL
  * streaming job inside the query function — file-source events log drained
  * with one AvailableNow trigger into a memory sink (see
  * [[graft.streaming.StreamRun]]) — and the driver's DuckDB compare then
  * asserts streaming ≡ batch on the replayed log. This is the §2.7
  * windows/watermarks surface promoted from spec-only to hash-gated:
  * windowed aggregation state (w1), arbitrary aggregation state (w2) and
  * dropDuplicates dedup state (w3) each face the batch oracle directly.
  *
  * Scale notes: complete-mode output is aggregate-sized (hours × types,
  * users, type cardinality), never event-sized; a production deployment
  * would bound the w3 dedup state with a watermark TTL — the replayed-log
  * gate here needs the full state to equal the batch distinct. */
private[graft] object StreamingQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // tumbling-window rollup as a STREAMING job: window() state in
    // complete mode, final batch ≡ the q13 batch aggregate by construction
    "w1_stream_hourly" -> ((s, d) => {
      val ev = Tables.eventsStream(s, d)
        .withColumn("t", timestamp_micros(col("ts_us")))
      val agg = ev.groupBy(window(col("t"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), qSum(col("value"), "sum_value"))
      StreamRun.toMemory(agg, "w1_sink")
        .select(unix_micros(col("window.start")).as("hour_us"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("hour_us", "event_type")
    }),

    // per-user lifetime profile as streaming aggregation state (J10's
    // stateful-fold shape with the P6 RMW semantics drained to a table)
    "w2_stream_user_profile" -> ((s, d) => {
      val ev = Tables.eventsStream(s, d)
      val agg = ev.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"),
          qSum(col("value"), "sum_value"))
      StreamRun.toMemory(agg, "w2_sink").orderBy("user_id")
    }),

    // streaming dropDuplicates state: the (event_type, user_id) pairs are
    // deduped IN the stream (append mode — dedup alone needs no aggregate
    // finalization); the reach rollup is batch over the drained sink
    "w3_stream_distinct_reach" -> ((s, d) => {
      val ev = Tables.eventsStream(s, d)
      val dd = StreamRun.toMemory(
        ev.select(col("event_type"), col("user_id"))
          .dropDuplicates("event_type", "user_id"),
        "w3_sink", outputMode = "append")
      dd.groupBy("event_type").agg(count(lit(1)).as("n_users"))
        .orderBy("event_type")
    }),

  )

  val oracles: Map[String, String] = Map(

    "w1_stream_hourly" ->
      s"""SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
         |  COUNT(*) AS n_events, ${qSumSql("value", "sum_value")}
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "w2_stream_user_profile" ->
      s"""SELECT user_id, COUNT(*) AS n_events,
         |  MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us,
         |  ${qSumSql("value", "sum_value")}
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "w3_stream_distinct_reach" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

  )
}
