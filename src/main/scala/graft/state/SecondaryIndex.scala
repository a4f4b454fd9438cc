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
    // un-hinted (r6 rule): the hit set is bounded only by the term's
    // document frequency — AQE broadcasts from RUNTIME size and falls back
    // to shuffle when a common term makes it corpus-scale
    val hits = index.filter(col("index_key") === lit(indexKey)).select(keyCols.map(col): _*)
    val joined = primaryLatest.join(hits, keyCols, "left_semi")
    tsCol.fold(joined)(t => joined.filter(range.contains(col(t))))
  }

  /** Multi-term AND lookup: primary records whose index set contains EVERY
    * key in `indexKeys` — the inverted-index intersection a search engine
    * runs. `build` is distinct per (index_key, primary key), so a count of
    * matching postings equals the number of distinct terms hit; keeping
    * count == |terms| is the intersection. The `isin` prunes the postings
    * scan to the queried terms before any shuffle; the semi-join is left
    * UN-HINTED (r6 rule) — the hit set is bounded only by min-df over the
    * queried terms, so AQE broadcasts it from runtime size and falls back
    * to a shuffle join when a common-term query makes it corpus-scale. */
  def multiLookup(
      index: DataFrame,
      primaryLatest: DataFrame,
      keyCols: Seq[String],
      indexKeys: Seq[Any]): DataFrame = {
    // dedup the query terms: the postings count is over DISTINCT terms, so
    // a repeated term would make the == |terms| intersection unsatisfiable
    val terms = indexKeys.distinct
    val hits = index
      .filter(col("index_key").isin(terms: _*))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === terms.length)
      .select(keyCols.map(col): _*)
    primaryLatest.join(hits, keyCols, "left_semi")
  }
}
