package graft.streaming

import graft.operators.GraphAlgorithms
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Incrementally-maintained connected components over a streamed edge
  * changelog.
  *
  * The reference maintains components transactionally per edge mutation
  * (examples/example-distributed-graph/.../GraphApi.scala:48-117 — BFS +
  * rewrite on every connect/disconnect). The Spark re-expression: edges
  * arrive as a changelog (src, dst, ts_us, tombstone); each micro-batch
  * folds them into the edge table (last-writer-wins per undirected edge,
  * tombstone = disconnect) and recomputes components with the
  * large-star/small-star algorithm, atomically swapping the components
  * table. Per-batch recompute is the right batch trade: component merges
  * are global (an edge can fuse two giant components), so "incremental"
  * means incremental *input*, with output recomputed from the maintained
  * edge state — exactly what the reference's batch analytics view does
  * after replaying its vertex/edge log (AnalyticsSystemSpec.scala:64-101).
  */
object GraphStream {

  /** Canonicalize an undirected edge so (a,b) and (b,a) share a key. */
  private def canonical(df: DataFrame): DataFrame =
    df.withColumn("_src", least(col("src"), col("dst")))
      .withColumn("_dst", greatest(col("src"), col("dst")))
      .drop("src", "dst")
      .withColumnRenamed("_src", "src")
      .withColumnRenamed("_dst", "dst")

  /** Stream (src, dst, ts_us, tombstone) edge changes; maintain
    * `<root>/edges` (latest-per-edge) and `<root>/components`
    * (vertex, component). `tieBreakCols` orders same-timestamp mutations of
    * one edge (e.g. a log offset/sequence column) — without it a connect +
    * disconnect in the same timestamp unit resolves arbitrarily across
    * reruns. */
  def maintainComponents(
      edgeChangelog: DataFrame,
      root: String,
      checkpoint: String,
      tieBreakCols: Seq[String] = Nil): DataStreamWriter[Row] = {
    val spark = edgeChangelog.sparkSession
    edgeChangelog.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val edgesPath = s"$root/edges"
        val compPath = s"$root/components"
        val prior =
          if (AtomicSwap.recover(edgesPath)) Some(spark.read.parquet(edgesPath)) else None
        val all = prior.fold(canonical(batch))(p =>
          p.unionByName(canonical(batch), allowMissingColumns = true))
        val latest = graft.core.Changelog.compact(all, Seq("src", "dst"), "ts_us", tieBreakCols)
        AtomicSwap.swap(latest, edgesPath, batchId)
        val live = graft.core.Changelog.dropTombstones(
          spark.read.parquet(edgesPath), "tombstone")
        AtomicSwap.recover(compPath)
        val components = GraphAlgorithms.connectedComponents(spark, live)
        AtomicSwap.swap(components, compPath, batchId)
        ()
      }
  }
}
