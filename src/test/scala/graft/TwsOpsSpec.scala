package graft

import graft.streaming.{TwsEvent, TwsOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** transformWithState operators (w22/w23): the batching-independence
  * claims behind the oracle gates, proven on a REAL two-batch run — the
  * file-source gate queries always drain in one batch, so this spec is
  * what pins the cross-batch merge behavior (state carried between
  * micro-batches, monotone-tag / monotone-count dedup of the append-mode
  * emissions). */
class TwsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def withRocks[T](f: => T): T = TwsOps.withRocksDb(spark)(f)

  private val batch1 = Seq(
    TwsEvent(1L, 100L, 1L, "click"),
    TwsEvent(1L, 200L, 2L, "view"),
    TwsEvent(1L, 300L, 3L, "click"),
    TwsEvent(2L, 150L, 4L, "purchase"))
  private val batch2 = Seq(
    TwsEvent(1L, 250L, 5L, "view"),   // lands INSIDE user 1's kept window
    TwsEvent(1L, 400L, 6L, "error"),  // evicts ts=200
    TwsEvent(3L, 500L, 7L, "click"))  // brand-new key in batch 2

  "TwsOps.keepLastN" should "merge ListState across micro-batches; latest n_seen tag wins" in withRocks {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TwsEvent]
    val q = TwsOps.keepLastN(input.toDS(), n = 3).toDF()
      .writeStream.format("memory").queryName("tws_keep")
      .outputMode("append").start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val drained = spark.table("tws_keep").localCheckpoint(true)
    val latest = drained.groupBy(col("user_id").as("u"))
      .agg(max("n_seen").as("mx"))
    val kept = drained.join(latest,
        col("user_id") === col("u") && col("n_seen") === col("mx"))
      .select("user_id", "ts_us", "event_id")
      .as[(Long, Long, Long)].collect().toSet
    // user 1 saw ts 100,200,250,300,400 → last 3 = 250,300,400
    kept shouldBe Set((1L, 250L, 5L), (1L, 300L, 3L), (1L, 400L, 6L),
      (2L, 150L, 4L), (3L, 500L, 7L))
    // the monotone tag reflects the TOTAL rows seen per key
    drained.groupBy("user_id").agg(max("n_seen").as("m"))
      .as[(Long, Long)].collect().toMap shouldBe Map(1L -> 5L, 2L -> 1L, 3L -> 1L)
  }

  "TwsOps.typeCounts" should "accumulate MapState across batches; max(n) is the final register" in withRocks {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TwsEvent]
    val q = TwsOps.typeCounts(input.toDS()).toDF()
      .writeStream.format("memory").queryName("tws_types")
      .outputMode("append").start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val finalCounts = spark.table("tws_types")
      .groupBy("user_id", "event_type").agg(max("n").as("n"))
      .as[(Long, String, Long)].collect().toSet
    finalCounts shouldBe Set(
      (1L, "click", 2L), (1L, "view", 2L), (1L, "error", 1L),
      (2L, "purchase", 1L), (3L, "click", 1L))
  }

  "TwsOps.idleExpiry" should "fire the event-time timer once the watermark passes last+gap, rescheduling on new arrivals" in withRocks {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.{TwsTimedEvent => TE}
    def ev(u: Long, ms: Long) =
      TE(u, new java.sql.Timestamp(ms), ms * 1000L)
    val base = 1700000000000L
    val input = MemoryStream[TE]
    val q = TwsOps.idleExpiry(
        input.toDS().withWatermark("ts", "0 seconds"), gapMs = 60000L)
      .toDF()
      .writeStream.format("memory").queryName("tws_idle")
      .outputMode("append").start()
    try {
      // batch 1: both users at T; batch 2 advances the watermark 10 min
      // via a NEW user-2 event -> user 2's timer reschedules, user 1's
      // (T+60s <= wm=T+600s) fires in the trailing batch
      input.addData(Seq(ev(1L, base), ev(2L, base)))
      q.processAllAvailable()
      input.addData(Seq(ev(2L, base + 600000L)))
      q.processAllAvailable()
    } finally q.stop()
    val fired = spark.table("tws_idle")
      .as[(Long, Long, Long)].collect().toSet
    fired shouldBe Set((1L, base * 1000L, 1L))
  }

  "TwsOps.withRocksDb" should "restore the previous provider setting" in {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    TwsOps.withRocksDb(spark) {
      spark.conf.get(key) should include("RocksDBStateStoreProvider")
    }
    spark.conf.getOption(key) shouldBe before
  }
}
