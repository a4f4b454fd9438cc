package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an edge DataFrame.
  *
  * The reference maintains components incrementally per edge mutation with
  * BFS over actor state (reference: examples/example-distributed-graph/
  * src/main/scala/GraphApi.scala:48-117, GraphPartition.scala:34-92). The
  * batch re-expression is iterative label propagation: every vertex adopts
  * the minimum label in its closed neighborhood until fixpoint — the
  * DataFrame form of the small-star/large-star family (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14).
  *
  * Scale notes: each round is one shuffle (groupBy vertex, map-side partial
  * min); `localCheckpoint` truncates lineage so plans don't grow with
  * iteration count; convergence is detected with a cheap count of changed
  * labels. Rounds needed ≈ graph diameter (≤ log n with star-contraction
  * variants; diameter is small for the co-occurrence graphs we target).
  */
object GraphAlgorithms {

  /** `edges` must have string/long columns `src`, `dst` (undirected).
    * Returns (vertex, component) where component = min vertex label
    * reachable. */
  def connectedComponents(spark: SparkSession, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select(col("src").as("vertex")).distinct()
      .withColumn("component", col("vertex"))
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate label for each vertex: min(own, min over neighbors' labels)
      val neighborLabels = sym
        .join(labels.withColumnRenamed("vertex", "dst"), "dst")
        .select(col("src").as("vertex"), col("component"))
      val next = labels.union(neighborLabels)
        .groupBy("vertex")
        .agg(min("component").as("component"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("component", "old"), "vertex")
        .filter(col("component") =!= col("old"))
        .limit(1).count()
      converged = changed == 0
      labels = next
      iter += 1
    }
    labels
  }
}
