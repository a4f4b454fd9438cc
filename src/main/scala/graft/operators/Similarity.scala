package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - `bruteForceTopK`: exact top-k cosine for a (small, broadcast) query
  *    set against the full corpus. The corpus never shuffles — queries are
  *    broadcast, similarity + per-query top-k run map-side then reduce on
  *    the tiny (query, k) result. This is the correct 100 TB baseline when
  *    |queries| is small.
  *  - `lshTopK`: random-hyperplane LSH. Hyperplane components are
  *    deterministic ±1 derived from md5, applied to integer-quantized
  *    vectors so bucket signs are exact integer arithmetic (no float
  *    order-sensitivity). Candidates = same bucket → per-query top-k within
  *    bucket. At scale this turns the all-pairs problem into a bucket-local
  *    one (the standard IVF/LSH trade: recall vs. candidate count).
  */
object Similarity {

  /** Deterministic ±1 hyperplane component for (plane, dim), derived from
    * md5 — portable to the SQL oracle. */
  def planeComponent(plane: Column, dim: Column): Column =
    when(conv(substring(md5(concat(lit("p"), plane.cast("string"), lit("_"), dim.cast("string"))), 1, 1), 16, 10)
      .cast("int") < 8, lit(1L)).otherwise(lit(-1L))

  /** `numPlanes`-bit LSH bucket id from integer-quantized vector signs. */
  def lshBucket(vec: Column, numPlanes: Int): Column = {
    val q = quantize1000(vec)
    val bitExprs = (0 until numPlanes).map { p =>
      val dotInt = aggregate(
        zip_with(q, sequence(lit(0), size(q) - 1), (v, j) => v * planeComponent(lit(p), j)),
        lit(0L), (acc, x) => acc + x)
      when(dotInt >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitExprs.reduce(_ + _)
  }

  /** Exact top-k cosine neighbors for each query vector (self excluded).
    * `queries` should be small (it is broadcast). */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val sims = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        quantizedCosine(col("query_vec"), col("neighbor_vec")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed top-k: neighbors searched only within the query's bucket. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 8): DataFrame = {
    val bucketed = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"),
      lshBucket(col(vecCol), numPlanes).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"),
      lshBucket(col(vecCol), numPlanes).as("bucket"))
    val sims = bucketed.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        quantizedCosine(col("query_vec"), col("neighbor_vec")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
