package graft

import graft.operators.{Analytics, Sketches}
import org.apache.spark.sql.functions._

/** Physical-plan regression guards for the scale claims the operator
  * scaladocs make — if an optimizer change or a refactor breaks the shape,
  * these fail before a 100 TB run would. */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan.toString
  }

  "kmvRegisters" should "compile the rank filter to WindowGroupLimit" in {
    val rows = (1 to 5000).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
    val plan = planOf(Sketches.kmvRegisters(rows, Seq("g"), "v", k = 32))
    // per-partition top-k before the per-group sort — the full distinct
    // hash set is never globally sorted
    plan should include("WindowGroupLimit")
  }

  "profile" should "scan its input exactly once" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-profile").toString
    (1 to 1000).map(i => (s"e${i % 7}", i.toLong)).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val plan = planOf(Analytics.profile(df, Seq("a", "b")).orderBy("col_name"))
    // both consumers read the checkpointed PROFILE-sized value-count frame
    // — the parquet itself was scanned once, during the checkpoint
    plan should not include "Scan parquet"
  }

  "bloomProbe" should "broadcast the filter, never shuffle it" in {
    val keys = (1 to 500).map(i => s"k$i").toDF("k")
    val bloom = Sketches.bloomBuild(keys, col("k"), words = 64, hashes = 3)
    val plan = planOf(Sketches.bloomProbe(bloom, keys, "k", 64, 3))
    plan should include("BroadcastHashJoin")
  }

  // ------------------------------------------------------------------
  // Skew hygiene for the gram-key joins (t22 first-owner, d17/d19
  // postings): a boilerplate gram is the classic skewed key. The
  // insurance is two-part: (1) AQE skew-join stays enabled in every
  // session (Spark 4 default — this pins it against a future config
  // regression), and (2) the joins stay EQUI-joins that compile to
  // shuffle joins AQE can skew-split — never a nested-loop/cartesian
  // shape, which AQE cannot rescue.
  // ------------------------------------------------------------------

  "the session" should "keep AQE skew-join handling enabled" in {
    spark.conf.get("spark.sql.adaptive.enabled") shouldBe "true"
    spark.conf.get("spark.sql.adaptive.skewJoin.enabled") shouldBe "true"
  }

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  "t22's gram-key first-owner join" should "be a skew-splittable shuffle join" in {
    import graft.functions.GraftFunctions.{tokens, wordNgrams}
    val docs = (1 to 400).map(i => (i.toLong, s"alpha beta w$i x${i % 7} y${i % 3}"))
      .toDF("doc_id", "text")
    val grams = docs.select(col("doc_id"),
      explode(wordNgrams(tokens(col("text")), 2)).as("g"))
    val firstOwner = grams.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    withNoBroadcast {
      val plan = planOf(grams.join(firstOwner, "g")
        .groupBy("doc_id").agg(count(lit(1)).as("n")))
      plan should include("SortMergeJoin")
      (plan should not).include("BroadcastNestedLoopJoin")
      (plan should not).include("CartesianProduct")
    }
  }

  "d19's prefix-posting join" should "never degrade to a nested-loop shape" in {
    val docs = (1 to 200).map(i =>
      (i.toLong, s"the quick brown fox ${i % 9} jumps over dog ${i % 5}"))
      .toDF("doc_id", "text")
    withNoBroadcast {
      val plan = planOf(graft.operators.Dedup.prefixFilterJaccard(
        docs, "doc_id", "text", tNum = 1L, tDen = 2L))
      (plan should not).include("BroadcastNestedLoopJoin")
      (plan should not).include("CartesianProduct")
      plan should include("SortMergeJoin")
    }
  }

  "d30's sorted-neighborhood blocker" should "rank on a window with no cartesian or nested-loop" in {
    val docs = (1 to 200).map(i =>
      (i.toLong, "en", s"the quick brown fox ${i % 9} jumps over dog ${i % 5}"))
      .toDF("doc_id", "lang", "text")
    withNoBroadcast {
      val plan = planOf(graft.operators.Dedup.sortedNeighborhoodJaccard(
        docs, "doc_id", "text", partitionCols = Seq("lang")))
      plan should include("Window") // the one ordered-rank exchange
      (plan should not).include("BroadcastNestedLoopJoin")
      (plan should not).include("CartesianProduct")
    }
  }
}
