package graft.core

import org.apache.spark.sql.DataFrame

/** CPU fan-out for small-scan inputs.
  *
  * A small parquet file (one row group) scans as ONE partition no matter how
  * many cores the cluster has — `spark.sql.files.maxPartitionBytes` cannot
  * split inside a row group. Any CPU-heavy per-row stage downstream (per-gram
  * md5, minhash permutations, quality scoring) then runs single-threaded
  * while every other core idles.
  *
  * `fanOut` round-robin-repartitions ONLY when the input has fewer
  * partitions than the session's default parallelism, so it is a no-op on
  * any real-scale scan (thousands of splits) and costs one tiny shuffle on
  * the degenerate small-file case. It must sit AFTER caller predicates
  * (operators apply it to their input frame, so the caller's filters still
  * push to the scan) and BEFORE the heavy projection / localCheckpoint
  * (checkpoints preserve partitioning — checkpointing a 1-partition frame
  * pins all downstream work to one task).
  *
  * Round-robin repartition locally sorts rows first (Spark's determinism
  * guard for retried map tasks), so results stay reproducible.
  *
  * Use SPARINGLY — only ahead of work that is super-linear per row (pair
  * joins over blocked candidates). Measured on the sf0.1 bench: it pays for
  * itself in `Dedup.ngramJaccardBlocked` (~1 s of single-threaded per-pair
  * merges → 32-way, −0.6 s) but LOSES on every narrow per-row projection
  * (language ID, token counts, simhash, quantize: the shuffle and its AQE
  * stage barrier cost more than the idle cores). Scan-speed operators stay
  * shuffle-free by design.
  *
  * Smallness is decided from the OPTIMIZED-PLAN size estimate — a pure
  * driver-side statistic. The previous probe (`df.rdd.getNumPartitions`)
  * forced physical planning and, under AQE, materialized upstream query
  * stages: one extra Spark job per invocation, per composition.
  */
object Par {
  /** Inputs estimated below this many bytes per target partition are
    * fanned out. 4 MB/core ≈ the point where a CPU-bound pair-join stage
    * stops benefiting from more splits. */
  private val bytesPerSlot = 4L << 20

  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes < BigInt(bytesPerSlot) * target) df.repartition(target) else df
  }
}
