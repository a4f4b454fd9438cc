package graft

import graft.state.Bucketing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Plan-shape proof for bucketed co-location: a join between two tables
  * bucketed identically on the join key plans with ZERO shuffle exchanges,
  * while the same join over unbucketed tables needs one per side. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeLike => e }.size

  private val facts = (1L to 1000L).map(i => (i % 100, i, s"p$i")).toDF("k", "v", "tag")
  private val dims = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "name")

  it should "plan a same-bucketed join with zero shuffle exchanges" in {
    // keep the join a sort-merge join so the exchange question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Bucketing.writeBucketed(facts, "b_facts", Seq("k"), numBuckets = 8)
      Bucketing.writeBucketed(dims, "b_dims", Seq("k"), numBuckets = 8)
      val joined = Bucketing.colocatedJoin(spark, "b_facts", "b_dims", Seq("k"))
      shuffles(joined) shouldBe 0
      joined.count() shouldBe 1000L // correctness unchanged by the layout

      // control: identical join over unbucketed tables shuffles both sides
      facts.write.mode("overwrite").format("parquet").saveAsTable("u_facts")
      dims.write.mode("overwrite").format("parquet").saveAsTable("u_dims")
      val control = Bucketing.colocatedJoin(spark, "u_facts", "u_dims", Seq("k"))
      shuffles(control) shouldBe 2
      control.count() shouldBe 1000L
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  it should "keep the exchange-free plan for aggregations on the bucket key" in {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Bucketing.writeBucketed(facts, "b_facts2", Seq("k"), numBuckets = 8)
      val agg = spark.table("b_facts2").groupBy("k").count()
      shuffles(agg) shouldBe 0 // bucketing satisfies the aggregation's distribution too
      agg.count() shouldBe 100L
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
