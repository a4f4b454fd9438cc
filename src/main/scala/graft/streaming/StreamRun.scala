package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Run a Structured Streaming frame to completion and hand back the
  * materialized result — the bridge that lets STREAMING computations face
  * the same DuckDB batch oracle as every batch query (the w* registry):
  * the stream drains the file log with one AvailableNow trigger into an
  * in-memory sink table, and the returned frame is a plain scan of it.
  *
  * Complete-mode aggregations emit their final state in the last batch, so
  * the drained result is by construction equal to the batch aggregate of
  * the same input — which is exactly the property the oracle compare
  * asserts (streaming ≡ batch on a replayed log).
  *
  * Sink names are uniqued per invocation (Verify and Bench call a query
  * function more than once in one session; memory-sink table names are
  * session-global). */
object StreamRun {
  private val counter = new AtomicLong(0)

  def toMemory(df: DataFrame, prefix: String,
      outputMode: String = "complete"): DataFrame = {
    val name = s"${prefix}_${counter.incrementAndGet()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}
