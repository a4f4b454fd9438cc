package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R7 continuous per-key subscription.
  *
  * The reference registers an observer on one key and pushes the initial
  * value plus every subsequent change over a WebSocket
  * (core/.../actor/Partition.scala:155-192 KeyValueMediator,
  * ObservableKVStore). The engine-side re-expression: an update-mode
  * streaming query filtered to the subscribed key — Spark delivers exactly
  * the per-key change feed; the transport (WebSocket, SSE) sits outside the
  * engine, consuming the sink.
  *
  * At scale the filter prunes at the source (partition/predicate pushdown
  * for Kafka/file sources), so a subscription costs the subscribed
  * partition's traffic, not the full stream.
  */
object Subscriptions {

  /** Change feed for one key over a keyed changelog stream: emits every
    * record whose key matches, in event order per micro-batch. */
  def subscribe(stream: DataFrame, keyCol: String, key: Any): DataFrame =
    stream.filter(col(keyCol) === lit(key))

  /** Change feed for a set of keys (fan-out subscription). */
  def subscribeAll(stream: DataFrame, keyCol: String, keys: Seq[Any]): DataFrame =
    stream.filter(col(keyCol).isin(keys.map(lit): _*))
}
