package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an edge DataFrame.
  *
  * The reference maintains components incrementally per edge mutation with
  * BFS over actor state (reference: examples/example-distributed-graph/
  * src/main/scala/GraphApi.scala:48-117, GraphPartition.scala:34-92). The
  * batch re-expression is the alternating **large-star / small-star**
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14): each round every vertex links its neighbors to the
  * minimum of its closed neighborhood, which converges in O(log n) rounds —
  * unlike plain min-label propagation, whose round count is the graph
  * diameter (a 1M-hop chain at 100 TB would never finish).
  *
  * Scale notes: each half-round is one groupBy (map-side partial min) + one
  * equi-join; `localCheckpoint` truncates lineage per round; convergence is
  * detected by an (edge-count, hash-sum) fingerprint — one tiny aggregate,
  * no edge-set comparison join.
  */
object GraphAlgorithms {

  /** `edges` must have columns `src`, `dst` (undirected, any orderable
    * type). Returns (vertex, component) where component = min vertex label
    * of the connected component. */
  def connectedComponents(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val vertices = edges.select(col("src").as("vertex"))
      .union(edges.select(col("dst").as("vertex")))
      .distinct()
      .localCheckpoint(true)

    var e = edges.select(col("src").as("a"), col("dst").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)

    var converged = e.isEmpty
    var lastFp = (-1L, -1L)
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR: every vertex u links its strictly-larger neighbors to
      // min(Γ(u) ∪ {u}).
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
      // SMALL-STAR: keyed by the larger endpoint, link all smaller
      // neighbors (and the key itself) to the minimum.
      val keyed = large.select(
        greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      val mins2 = keyed.groupBy("u").agg(min(col("v")).as("m"))
      val small = keyed.join(mins2, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .union(mins2.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint(true)

      // (count, xor-of-hashes): order-independent, overflow-free under ANSI
      val fpRow = small.agg(
        count(lit(1)).as("n"), bit_xor(xxhash64(col("a"), col("b"))).as("h")).collect()(0)
      val fp = (fpRow.getLong(0), if (fpRow.isNullAt(1)) 0L else fpRow.getLong(1))
      converged = fp == lastFp
      lastFp = fp
      e = small
      iter += 1
    }

    // converged edge set is a star forest (child -> component root)
    val mapping = e.select(col("a").as("vertex"), col("b").as("component"))
    vertices.join(mapping, Seq("vertex"), "left")
      .select(col("vertex"), coalesce(col("component"), col("vertex")).as("component"))
  }
}
