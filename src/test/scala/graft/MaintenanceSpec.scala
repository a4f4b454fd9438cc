package graft

import java.nio.file.Files

import graft.core.Changelog
import graft.streaming.CdcMetrics
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

class VacuumSpec extends SparkSpec {
  import spark.implicits._

  "Changelog.vacuum" should "rewrite a changelog to live latest-per-key records only" in {
    val root = Files.createTempDirectory("vac").toFile.getAbsolutePath
    val path = s"$root/log"
    Seq(
      (1, "old", 100L, false), (1, "new", 200L, false), // superseded + live
      (2, "gone", 150L, false), (2, null.asInstanceOf[String], 250L, true), // tombstoned
      (3, "expired", 10L, false)) // beyond TTL
      .toDF("key", "value", "ts_us", "tombstone")
      .write.parquet(path)
    Changelog.vacuum(spark, path, Seq("key"), "ts_us",
      tombstoneCol = Some("tombstone"), ttlUs = Some(500L), nowUs = 600L)
    val after = spark.read.parquet(path).orderBy("key")
      .select("key", "value").as[(Int, String)].collect()
    after shouldBe Seq((1, "new")) // one live record; history/tombstones/expired gone
  }

  "Changelog.compactFiles" should "rewrite many small files into few, preserving data" in {
    val root = Files.createTempDirectory("cfc").toFile.getAbsolutePath
    val path = s"$root/log"
    spark.range(1000).toDF("id").repartition(32).write.parquet(path)
    def parquetFiles = new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    parquetFiles should be >= 16 // genuinely fragmented before
    val parts = Changelog.compactFiles(spark, path, targetFileBytes = 1L << 30)
    parts shouldBe 1
    parquetFiles shouldBe 1
    spark.read.parquet(path).count() shouldBe 1000L
  }
}

class CdcMetricsSpec extends SparkSpec {
  import spark.implicits._

  "CdcMetrics.observed" should "report change/tombstone counts and the event-time frontier" in {
    // use the named-Observation variant for batch collection
    val obs = Observation("cdc_test")
    val df = Seq((1, 100L, false), (2, 200L, true), (3, 300L, false))
      .toDF("key", "ts_us", "tombstone")
      .observe(obs,
        count(lit(1)).as("n_changes"),
        sum(when(col("tombstone"), 1L).otherwise(0L)).as("n_tombstones"),
        max(col("ts_us")).as("max_ts_us"))
    df.count() shouldBe 3
    val m = obs.get
    m("n_changes") shouldBe 3L
    m("n_tombstones") shouldBe 1L
    m("max_ts_us") shouldBe 300L
  }

  it should "attach the standard changelog observations without a second pass" in {
    val df = CdcMetrics.observed(
      Seq((1, 100L, false)).toDF("key", "ts_us", "tombstone"), "ts_us", Some("tombstone"))
    df.count() shouldBe 1 // plan analyzes and runs with the observation node
  }
}
