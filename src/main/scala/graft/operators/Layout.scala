package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for 100 TB write paths: Z-order (Morton)
  * interleaving for multi-dimensional clustering. Writing a huge fact
  * table sorted by a single column gives data skipping on that column
  * only; sorting by the Z-value of two columns bounds BOTH columns'
  * min/max ranges within every file/partition, so scans filtered on
  * either dimension (or a rectangle of both) prune most partitions from
  * footer stats alone — the technique behind Delta/Iceberg `ZORDER BY`.
  *
  * All bit manipulation is plain integer arithmetic (`shiftright`/`and`/
  * `shiftleft` with literal amounts — codegen'd, engine-portable, exactly
  * reproducible in SQL), no UDF.
  */
object Layout {

  /** Morton Z-value of two coordinates: interleaves the low `bits` bits of
    * `x` (even positions) and `y` (odd positions) into a `2·bits`-bit
    * value. Coordinates must already be bucketed to `[0, 2^bits)` —
    * callers clamp with `% (1 << bits)`. Literal shift amounts keep every
    * term inside whole-stage codegen. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { j =>
      val xj = shiftleft(shiftright(x, j).bitwiseAND(1L), 2 * j)
      val yj = shiftleft(shiftright(y, j).bitwiseAND(1L), 2 * j + 1)
      (xj + yj).cast("long")
    }.reduce(_ + _)
  }

  /** The same Z-value as ANSI SQL text (for oracles / pushdown into other
    * engines): `Σ_j ((x>>j & 1) << 2j) + ((y>>j & 1) << 2j+1)`. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { j =>
      s"((($x >> $j) & 1) << ${2 * j}) + ((($y >> $j) & 1) << ${2 * j + 1})"
    }.mkString("(", " + ", ")")

  /** Z-order layout audit: bucket rows by the top bits of their Z-value
    * (`partition id = z ÷ 2^{2·bits−log2(partitions)}`) and report, per
    * partition, the row count and the min/max of each coordinate — the
    * exact stats a file footer would carry. Tight per-partition ranges on
    * BOTH coordinates are the data-skipping win; a single-column sort
    * would show one tight and one full-width range.
    *
    * Scale shape: one partial-agg'd shuffle on ≤ `partitions` keys; at a
    * real write the same Z-value feeds `repartitionByRange(z)` +
    * `sortWithinPartitions(z)` and the stats come free from the footers. */
  /** Range-partition BOUNDS from a mergeable log-histogram sketch
    * ([[Sketches.logHistSketch]]): the `i/numPartitions` quantile bucket
    * lower bounds, ascending. Spark's own `repartitionByRange` SAMPLES the
    * input per job (an extra pass, nondeterministic at that); sketch-derived
    * bounds are deterministic, cost nothing beyond the registers (which a
    * profiling pass or yesterday's run already produced — they MERGE across
    * days/partitions), and are engine-portable. Bounded driver collect:
    * `numPartitions − 1` longs. Duplicate bounds (skewed value domains)
    * simply leave some partitions empty — over-partition, never wrong. */
  def sketchRangeBounds(sketch: DataFrame, numPartitions: Int, s: Int = 3): Array[Long] = {
    require(numPartitions >= 2, "need at least 2 partitions")
    val qs = (1 until numPartitions).map(i => i * 1000000L / numPartitions)
    Sketches.logHistQuantiles(sketch, Seq.empty, qs, s)
      .orderBy("q_ppm").select("q_est").collect().map(_.getLong(0))
  }

  /** Row-local partition id against materialized ascending bounds:
    * `pid = |{b : value > b}|` ∈ [0, bounds.length] — a codegen'd
    * indicator sum, no join, no sampling scan. Feed the result to
    * `repartition(n, col)` (hash on the id) or use it as the write
    * partition column; within-id `sortWithinPartitions` completes the
    * range layout. */
  def rangePartitionId(bounds: Array[Long], value: Column): Column =
    if (bounds.isEmpty) lit(0L)
    else bounds.map(b => when(value > b, 1L).otherwise(0L)).reduce(_ + _)

  /** Audit of the sketch-ranged layout: per assigned partition, row count
    * and value min/max — the footer stats a range-partitioned write would
    * carry. Ranges must be non-overlapping and ordered (each partition's
    * max < the next's min is the data-skipping contract); counts are
    * near-equal within the sketch's `2^−s` relative bucket error. */
  def sketchRangeStats(
      df: DataFrame,
      value: Column,
      numPartitions: Int,
      s: Int = 3): DataFrame = {
    val sketch = Sketches.logHistSketch(df.select(value.as("v")), Seq.empty, "v", s)
    val bounds = sketchRangeBounds(sketch, numPartitions, s)
    df.select(rangePartitionId(bounds, value).as("pid"), value.as("v"))
      .groupBy("pid")
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"))
  }

  def zOrderStats(
      df: DataFrame,
      xCol: Column,
      yCol: Column,
      bits: Int,
      partitions: Int): DataFrame = {
    require(partitions > 0 && (partitions & (partitions - 1)) == 0,
      "partitions must be a power of two")
    val zBits = 2 * bits
    val shift = zBits - (31 - Integer.numberOfLeadingZeros(partitions))
    require(shift >= 0, "more partitions than z-values")
    val mask = (1L << bits) - 1L
    val z = zValue(xCol.bitwiseAND(mask), yCol.bitwiseAND(mask), bits)
    df.select(shiftright(z, shift).as("pid"),
        xCol.bitwiseAND(mask).as("x"), yCol.bitwiseAND(mask).as("y"))
      .groupBy("pid")
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }
}
