package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** J8 global store: the reference replicates a small KV store to every node
  * and routes writes through a master (core/.../state/KVStoreGlobal.scala:31-43,
  * 117-139). In Spark the read path is simply a broadcast relation — every
  * executor holds the whole table, joins against it are map-side with no
  * shuffle. Writes are batch `upsert` on the backing KVTable followed by a
  * re-broadcast (per-micro-batch refresh in streaming, SURVEY §2.4 J8).
  *
  * At 100 TB the dimension side of star joins (region/nation/part at TPC-H
  * shape) stays in the tens of MB — broadcasting is exactly the plan a
  * 1000-executor cluster wants; the fact table never moves.
  */
final case class GlobalTable(kv: KVTable) {

  /** Broadcast view of the latest-per-key table. */
  def view: DataFrame = broadcast(kv.latest)

  /** Map-side enrich: join `fact` against this global table. */
  def enrich(fact: DataFrame, joinExprs: Column, joinType: String = "inner"): DataFrame =
    fact.join(view, joinExprs, joinType)

  def upsert(batch: DataFrame): GlobalTable = copy(kv = kv.upsert(batch))
}
