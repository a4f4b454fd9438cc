package graft

import graft.streaming.StatefulOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Port of the reference's stateful word-count system test
  * (ExampleWordCountSpec.scala:83-123): exact running counts per word,
  * emitted on every update — driven through Structured Streaming with a
  * MemoryStream source (no broker in this environment; the Kafka source
  * shares the same canonical changelog columns, ChangelogStream.fromKafka). */
class StatefulWordCountSpec extends SparkSpec {
  import spark.implicits._

  "runningWordCount" should "emit exact running counts per word across batches" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val counts = StatefulOps.runningWordCount(input.toDS())
      .map { case (w, c) => (w, c.getOrElse(0L)) }
      .toDF("word", "count")

    val query = counts.writeStream
      .format("memory")
      .queryName("wordcounts")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData("Hello World")
      query.processAllAvailable()
      var state = spark.sql("SELECT word, count FROM wordcounts")
        .as[(String, Long)].collect().groupBy(_._1).map { case (w, rows) => w -> rows.map(_._2).max }
      state("hello") shouldBe 1L
      state("world") shouldBe 1L

      input.addData("hello hello spark")
      query.processAllAvailable()
      state = spark.sql("SELECT word, count FROM wordcounts")
        .as[(String, Long)].collect().groupBy(_._1).map { case (w, rows) => w -> rows.map(_._2).max }
      state("hello") shouldBe 3L // running count across batches
      state("world") shouldBe 1L
      state("spark") shouldBe 1L
    } finally query.stop()
  }

  it should "run on the RocksDB state store provider (the reference's MemStoreRocksDb)" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[String]
      val counts = StatefulOps.runningWordCount(input.toDS())
        .map { case (w, c) => (w, c.getOrElse(0L)) }.toDF("word", "count")
      val q = counts.writeStream.format("memory").queryName("rocks_wc")
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData("alpha beta")
        q.processAllAvailable()
        input.addData("alpha")
        q.processAllAvailable()
        val st = spark.sql("SELECT word, max(count) FROM rocks_wc GROUP BY 1")
          .as[(String, Long)].collect().toMap
        st("alpha") shouldBe 2L
        st("beta") shouldBe 1L
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  "updateAndGet" should "support delete-on-None like the reference tombstone path" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Int)]
    // state: running sum; a zero value deletes the key
    val out = StatefulOps.updateAndGet[String, Int, Long](
      input.toDS(),
      (st, v) => if (v == 0) None else Some(st.getOrElse(0L) + v))
      .map { case (k, s) => (k, s.map(_.toString).getOrElse("DELETED")) }
      .toDF("key", "state")

    val query = out.writeStream
      .format("memory").queryName("rmw").outputMode(OutputMode.Update()).start()
    try {
      input.addData(("a", 5), ("a", 7), ("b", 1))
      query.processAllAvailable()
      input.addData(("a", 0)) // tombstone
      query.processAllAvailable()
      val rows = spark.sql("SELECT key, state FROM rmw").as[(String, String)].collect()
      rows should contain(("a", "12")) // 5+7 within first batch
      rows should contain(("b", "1"))
      rows should contain(("a", "DELETED"))
    } finally query.stop()
  }

  "firstSeenOnly" should "emit each content key once across batches (streaming exact dedup)" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)] // (content_hash, doc_id)
    val out = StatefulOps.firstSeenOnly(input.toDS()).toDF("hash", "doc_id")
    val query = out.writeStream
      .format("memory").queryName("dedup_stream").outputMode(OutputMode.Append()).start()
    try {
      input.addData(("h1", 7L), ("h1", 3L), ("h2", 9L))
      query.processAllAvailable()
      input.addData(("h1", 1L), ("h3", 4L)) // h1 already seen → dropped
      query.processAllAvailable()
      val rows = spark.sql("SELECT hash, doc_id FROM dedup_stream")
        .as[(String, Long)].collect().sorted
      // within-batch tie for h1 breaks to the smallest doc_id
      rows shouldBe Array(("h1", 3L), ("h2", 9L), ("h3", 4L))
    } finally query.stop()
  }

  "anomalyMonitor" should "flag bit-identically to the batch rollingAnomalies" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // 5 keys × 40 events: quiet baseline with seeded spikes
    val rnd = new scala.util.Random(7)
    val rows = for (key <- 1L to 5L; i <- 0 until 40) yield {
      val v = if (rnd.nextInt(12) == 0) 900L + rnd.nextInt(200)
              else 100L + rnd.nextInt(21) - 10
      (key, i.toLong * 1000L, key * 1000L + i, v) // (key, ts, tie, value)
    }
    val batch = graft.operators.Analytics.rollingAnomalies(
      rows.toDF("u", "ts", "eid", "v"), Seq("u"), "v", Seq("ts", "eid"),
      histRows = 20, minHist = 8, k = 3)
      .select("u", "ts", "eid", "v", "n_hist")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    batch.size should be > 0 // the fixture must actually contain anomalies
    val input = MemoryStream[(Long, Long, Long, Long)]
    val query = StatefulOps.anomalyMonitor(input.toDS(), histRows = 20, minHist = 8, k = 3)
      .toDF("u", "ts", "eid", "v", "n_hist")
      .writeStream.format("memory").queryName("anom").outputMode(OutputMode.Append())
      .start()
    try {
      // arrival in event-time order split across three micro-batches —
      // per-key order is preserved, so streaming ≡ batch
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.grouped(70).foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
      }
      val streamed = spark.sql("SELECT * FROM anom")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      streamed shouldBe batch
    } finally query.stop()
  }

  "cusumMonitor" should "alarm bit-identically to the batch closed-form cusum" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.{col, lit}
    val rnd = new scala.util.Random(13)
    // drifting keys: mean shifts +20 halfway through for odd keys
    val rows = for (key <- 1L to 6L; i <- 0 until 50) yield {
      val base = if (key % 2 == 1 && i >= 25) 120L else 100L
      (key, i.toLong * 1000L, key * 100L + i, base + rnd.nextInt(11) - 5, 100L)
    }
    val batch = graft.operators.Analytics.cusum(
      rows.toDF("u", "ts", "eid", "v", "target"), Seq("u"), "v", "target",
      Seq("ts", "eid"), threshold = 60L)
      .select("u", "n", "max_cusum", "n_alarms")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    batch.values.map(_._3).sum should be > 0L // fixture must actually alarm
    val input = MemoryStream[(Long, Long, Long, Long, Long)]
    val query = StatefulOps.cusumMonitor(input.toDS(), threshold = 60L)
      .toDF("u", "ts", "eid", "cusum")
      .writeStream.format("memory").queryName("cus").outputMode(OutputMode.Append())
      .start()
    try {
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.grouped(80).foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
      }
      // per-key alarm count and peak alarm value match the batch fold
      val streamed = spark.sql("SELECT u, COUNT(*) AS n_alarms, MAX(cusum) AS mx FROM cus GROUP BY u")
        .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
      batch.foreach { case (k, (_, mxBatch, alarmsBatch)) =>
        if (alarmsBatch > 0L) {
          streamed(k)._1 shouldBe alarmsBatch
          // peak cusum is the max over alarmed rows iff the peak alarms
          streamed(k)._2 shouldBe mxBatch
        } else streamed.get(k) shouldBe None
      }
    } finally query.stop()
  }

  "drawdownMonitor" should "reach the same max drawdown as the batch window fold" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, max => fmax, sum => fsum}
    val rnd = new scala.util.Random(29)
    val rows = for (key <- 1L to 5L; i <- 0 until 60)
      yield (key, i.toLong * 1000L, key * 1000L + i, rnd.nextInt(201).toLong - 100L)
    // batch: the q147 pipeline (prefix-sum → prefix-max → deepest gap)
    val w = Window.partitionBy("k").orderBy(col("ts"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val batch = rows.toDF("k", "ts", "eid", "delta")
      .withColumn("bal", fsum(col("delta")).over(w))
      .withColumn("peak", fmax(col("bal")).over(w))
      .groupBy("k").agg(fmax(col("peak") - col("bal")).as("maxdd"))
      .as[(Long, Long)].collect().toMap
    val input = MemoryStream[(Long, Long, Long, Long)]
    val query = StatefulOps.drawdownMonitor(input.toDS())
      .toDF("k", "ts", "eid", "maxdd")
      .writeStream.format("memory").queryName("dd").outputMode(OutputMode.Append())
      .start()
    try {
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.grouped(70).foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
      }
      // the last (deepest) emitted record per key equals the batch fold;
      // emissions are strictly increasing per key by construction
      val streamed = spark.sql("SELECT k, MAX(maxdd) FROM dd GROUP BY k")
        .as[(Long, Long)].collect().toMap
      batch.foreach { case (k, dd) =>
        if (dd > 0L) streamed(k) shouldBe dd
        else streamed.get(k) shouldBe None
      }
    } finally query.stop()
  }

  "clampedFoldMonitor" should "match the batch Lindley closed form across micro-batches" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(47)
    // deltas biased negative so clamps genuinely fire
    val rows = for (key <- 1L to 6L; i <- 0 until 50)
      yield (key, i.toLong * 1000L, key * 1000L + i, rnd.nextInt(201).toLong - 110L)
    val batch = graft.operators.Analytics.clampedRunningFold(
      rows.toDF("k", "ts", "eid", "delta"), Seq("k"), "delta", Seq("ts", "eid"))
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    batch.values.map(_._3).sum should be > 0L // fixture must actually clamp
    val input = MemoryStream[(Long, Long, Long, Long)]
    val query = StatefulOps.clampedFoldMonitor(input.toDS())
      .toDF("k", "bal", "n", "clamped")
      .writeStream.format("memory").queryName("cfold").outputMode(OutputMode.Append())
      .start()
    try {
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.grouped(80).foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
      }
      // final register per key = the row with max n (strictly increasing)
      val streamed = spark.sql(
        "SELECT k, MAX(STRUCT(n, bal, clamped)) AS r FROM cfold GROUP BY k")
        .selectExpr("k", "r.bal", "r.n", "r.clamped")
        .as[(Long, Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      batch.foreach { case (k, (balB, nB, clB)) =>
        streamed(k) shouldBe ((balB, nB, clB))
      }
    } finally query.stop()
  }

  "firstSeenWithTtl" should "emit the greedy TTL chain and re-emit after expiry" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // key 1: 0 emits; 5 and 10 inside TTL=10 of 0 suppressed; 11 > 0+10
    // emits; 21 == 11+10 suppressed (strict >); 22 emits.
    // key 2: tie at ts 0 emits exactly once; 30 emits.
    val rows = Seq(
      (1L, 0L, 1L), (1L, 5L, 2L), (1L, 10L, 3L), (1L, 11L, 4L),
      (1L, 21L, 5L), (1L, 22L, 6L),
      (2L, 0L, 1L), (2L, 0L, 2L), (2L, 30L, 3L))
    val input = MemoryStream[(Long, Long, Long)]
    val query = StatefulOps.firstSeenWithTtl(input.toDS(), ttlUs = 10L)
      .toDF("k", "ts")
      .writeStream.format("memory").queryName("fsttl")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val got = spark.sql("SELECT k, ts FROM fsttl")
        .as[(Long, Long)].collect().sorted.toSeq
      got shouldBe Seq((1L, 0L), (1L, 11L), (1L, 22L), (2L, 0L), (2L, 30L))
    } finally query.stop()
  }

  it should "carry the last-emission state across micro-batches fed in global order" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val rows = (for (key <- 1L to 5L; i <- 0 until 60)
      yield (key, rnd.nextInt(500).toLong, key * 100L + i)).sortBy(r => (r._2, r._3))
    // offline greedy chain per key over globally sorted rows
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
      var last = Option.empty[Long]
      rs.sortBy(r => (r._2, r._3)).flatMap { r =>
        if (last.forall(l => r._2 > l + 50L)) { last = Some(r._2); Some((k, r._2)) }
        else None
      }
    }.toSeq.sorted
    val input = MemoryStream[(Long, Long, Long)]
    val query = StatefulOps.firstSeenWithTtl(input.toDS(), ttlUs = 50L)
      .toDF("k", "ts")
      .writeStream.format("memory").queryName("fsttl2")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch boundaries respect the global (ts, tie) order, so the fold
      // state must carry the chain across batches exactly
      rows.grouped(70).foreach { chunk =>
        input.addData(chunk: _*)
        query.processAllAvailable()
      }
      val got = spark.sql("SELECT k, ts FROM fsttl2")
        .as[(Long, Long)].collect().sorted.toSeq
      got shouldBe expected
    } finally query.stop()
  }
}
