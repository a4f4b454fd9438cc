package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-width histograms — the distribution profile of a numeric column,
  * optionally per group.
  *
  * Shape at scale: bin assignment is a row-local projection; the only
  * shuffle is the (group, bin) partial-count aggregation, whose cardinality
  * is bounded by groups × occupied bins, not rows — 100 TB in, kilobytes
  * out. `floor(value / width)` is one IEEE double division + floor on both
  * engines, so bin edges are bit-identical in the oracle.
  */
object Histogram {

  /** Per-(groupCols, bin) row counts; null values are excluded (a null has
    * no bin). Bin b covers [b*width, (b+1)*width). */
  def fixedWidth(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      width: Double): DataFrame = {
    require(width > 0, "bin width must be positive")
    df.filter(col(valueCol).isNotNull)
      .withColumn("bin", floor(col(valueCol) / width).cast("long"))
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Equi-depth binning: per group, `buckets` NTILE buckets over
    * (`valueCol`, tie-break cols) with each bucket's population and value
    * range — the quantization table feature pipelines cut against.
    * Deterministic because the ntile order is total (callers must pass
    * tie-break columns unless valueCol is unique). NTILE's row_number-based
    * fill (first `n mod buckets` buckets get the extra row) is identical in
    * Spark and DuckDB/ANSI engines, so boundaries are oracle-exact.
    *
    * Shape at scale: one shuffle on the group key; the window streams each
    * partition once, and the output is buckets × groups rows. Skewed groups
    * bound throughput (a single group sorts in one task) — for groupless
    * global quantiles prefer approx_percentile or q26's exact percentiles. */
  def equiDepth(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tieBreakCols: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets > 0, "bucket count must be positive")
    val order = (col(valueCol) +: tieBreakCols.map(col)).map(_.asc)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.filter(col(valueCol).isNotNull)
      .withColumn("bucket", ntile(buckets).over(w))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(
        count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
  }
}
