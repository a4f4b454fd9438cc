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

  "TwsOps.keepLastNTtl" should "expire an idle key's window and count once the TTL passes between batches" in withRocks {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TwsEvent]
    // 2s processing-time TTL; the inter-batch sleep (6s) is 3x the TTL so
    // the expiry is not timing-sensitive. NB processAllAvailable() NEVER
    // RETURNS under TimeMode.ProcessingTime — TTL'd state keeps
    // shouldRunAnotherBatch true, so the engine runs idle batches forever
    // (that idling is also what advances processing time past the TTL
    // here); poll the sink's row count instead.
    val q = TwsOps.keepLastNTtl(input.toDS(), n = 3,
        java.time.Duration.ofSeconds(2)).toDF()
      .writeStream.format("memory").queryName("tws_keep_ttl")
      .outputMode("append").start()
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (spark.table("tws_keep_ttl").count() < n &&
        System.nanoTime() < deadline) Thread.sleep(200L)
      spark.table("tws_keep_ttl").count() should be >= n
    }
    try {
      // batch 1 emits user 1's merged 3-window + user 2's single row
      input.addData(batch1); awaitRows(4L)
      Thread.sleep(6000L)
      // batch 2: user 1's state EXPIRED -> only its 2 fresh rows; user 3 new
      input.addData(batch2); awaitRows(7L)
    } finally q.stop()
    // assert the EXACT emission set — NOT the w22 argmax-n_seen dedup: a
    // TTL reset restarts the counter, so "largest tag = latest" no longer
    // holds after an expiry (which is exactly why the w33 gate's argmax is
    // legal only under its TTL ≫ drain-duration precondition)
    val drained = spark.table("tws_keep_ttl")
      .select("user_id", "ts_us", "event_id", "n_seen")
      .as[(Long, Long, Long, Long)].collect().toSet
    drained shouldBe Set(
      // batch 1: user 1's merged 3-window tagged with its count 3
      (1L, 100L, 1L, 3L), (1L, 200L, 2L, 3L), (1L, 300L, 3L, 3L),
      // batch 2 AFTER the 3x-TTL sleep: user 1's window AND lifetime
      // counter expired — only the fresh rows, count restarted at 2
      // (keepLastN without TTL emits (250,300,400) tagged 5 here)
      (1L, 250L, 5L, 2L), (1L, 400L, 6L, 2L),
      (2L, 150L, 4L, 1L), (3L, 500L, 7L, 1L))
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
