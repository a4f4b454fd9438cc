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
}
