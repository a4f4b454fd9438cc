package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables for shuffle-free co-located joins.
  *
  * The reference co-partitions state with its Kafka topic via murmur2 so a
  * join between two keyspaces with equal partition counts never crosses
  * nodes (reference: README.md:84-90, Murmur2Partitioner.java). The Spark
  * batch analogue is bucketing: two tables bucketed by the same key into
  * the same bucket count join with ZERO Exchange — at 100 TB that removes
  * the dominant cost (shuffling the fact table) from every repeated join,
  * amortizing one write-time shuffle across all future reads.
  */
object Bucketed {

  /** Write `df` as a bucketed table registered in the session catalog. */
  def write(df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True iff the physical plan of `df` contains no shuffle exchange —
    * the assertion that bucketing removed the join shuffle. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
