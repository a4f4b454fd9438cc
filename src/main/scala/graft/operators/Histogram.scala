package graft.operators

import org.apache.spark.sql.DataFrame
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
}
