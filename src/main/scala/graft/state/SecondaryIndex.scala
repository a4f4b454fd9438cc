package graft.state

import graft.core.TimeRange
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R4–R6 secondary (inverted) index.
  *
  * The reference maintains a derived `IK -> K` store by CDC listener with
  * hash-collision re-checks and de-indexing on tombstone/TTL
  * (reference: core/.../state/KVStoreLocal.scala:195-248, KVStoreIndex.scala:20-66).
  * Declaratively the index is just `primary.select(explode(indexFn), key)`
  * — always consistent with the primary because it is *derived from the same
  * latest view* in the same plan; there is no separate store to drift, which
  * dissolves the reference's tombstone/TTL de-indexing bugs (its own TODO
  * #242/#248 at KVStoreLocal.scala:214). For serving, `build` can be
  * materialized (e.g. written to parquet per batch) and `lookup` becomes an
  * equi-join — one shuffle on the index key, broadcast when the hit set is
  * small.
  */
object SecondaryIndex {

  /** Build the inverted index `(index_key, <primary key cols>)`.
    * `indexFn` is the reference's `indexFunction: Record => List[IK]`
    * (KVStoreLocal.scala:195) — any array-producing Column; distinct per
    * primary key like the reference's `.distinct` (KVStoreLocal.scala:215). */
  def build(primaryLatest: DataFrame, keyCols: Seq[String], indexFn: Column): DataFrame =
    primaryLatest
      .select(explode(indexFn).as("index_key") +: keyCols.map(col): _*)
      .distinct()

  /** R5 lookup: all primary records whose index set contains `indexKey`,
    * optionally event-time bounded. The join is an equi-join on the primary
    * key — Catalyst broadcasts the (small) filtered index side. */
  def lookup(
      index: DataFrame,
      primaryLatest: DataFrame,
      keyCols: Seq[String],
      indexKey: Any,
      tsCol: Option[String] = None,
      range: TimeRange = TimeRange.Unbounded): DataFrame = {
    val hits = index.filter(col("index_key") === lit(indexKey)).select(keyCols.map(col): _*)
    val joined = primaryLatest.join(broadcast(hits), keyCols, "left_semi")
    tsCol.fold(joined)(t => joined.filter(range.contains(col(t))))
  }
}
