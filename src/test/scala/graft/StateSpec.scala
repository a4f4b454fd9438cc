package graft

import graft.core.{Changelog, TimeRange}
import graft.state.{KVTable, SecondaryIndex}
import org.apache.spark.sql.functions._

/** Port of the reference's state-store unit matrix
  * (core/src/test/scala/.../KVStoreLocalSpec.scala:36-146) and log
  * compaction tests (spark/src/test/.../LogRDDSpec.scala:76-127) onto the
  * declarative changelog/KVTable algebra. */

class TimeRangeSpec extends SparkSpec {
  "TimeRange" should "be half-open [start, end)" in {
    import spark.implicits._
    val df = Seq(5L, 10L, 14L, 15L, 20L).toDF("ts")
    df.filter(TimeRange(10L, 15L).contains(col("ts"))).as[Long].collect() shouldBe Seq(10L, 14L)
  }

  it should "support the reference constructors (until/since/prev/next)" in {
    TimeRange.until(100L).contains _
    TimeRange.until(100L).endUs shouldBe 100L
    TimeRange.since(100L).startUs shouldBe 100L
    TimeRange.prev(10L, 100L) shouldBe TimeRange(90L, 100L)
    TimeRange.next(10L, 100L) shouldBe TimeRange(100L, 110L)
    TimeRange(0L, 50L).intersect(TimeRange(40L, 90L)) shouldBe TimeRange(40L, 50L)
    TimeRange(0L, 10L).intersect(TimeRange(20L, 30L)) shouldBe TimeRange.Empty
  }
}

class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  // LogRDDSpec fixture shape: keys written in eras; latest era must win.
  private def log = Seq(
    // (key, value, ts, tombstone)
    (1, "jan", 200L, false),
    (1, "feb", 300L, false),
    (1, "dec", 100L, false), // written last, oldest event time
    (2, "jan", 200L, false),
    (2, "feb", 300L, false),
    (3, "jan", 200L, false),
    (3, "deleted", 400L, true)).toDF("key", "value", "ts", "tombstone")

  "compact" should "keep exactly the latest record per key (LogRDDSpec semantics)" in {
    val latest = Changelog.compact(log, Seq("key"), "ts")
      .orderBy("key").select("key", "value").as[(Int, String)].collect()
    latest shouldBe Seq((1, "feb"), (2, "feb"), (3, "deleted"))
  }

  it should "drop deleted keys after tombstone filtering" in {
    val live = Changelog.dropTombstones(
      Changelog.compact(log, Seq("key"), "ts"), "tombstone")
      .orderBy("key").select("key", "value").as[(Int, String)].collect()
    live shouldBe Seq((1, "feb"), (2, "feb"))
  }

  it should "break timestamp ties deterministically by tie-break column" in {
    val tied = Seq((1, "a", 100L, 0L), (1, "b", 100L, 1L)).toDF("key", "value", "ts", "offset")
    Changelog.compact(tied, Seq("key"), "ts", Seq("offset"))
      .select("value").as[String].head() shouldBe "b"
  }

  "ttlFilter" should "expire records older than now - ttl by event time (KVStoreLocalSpec TTL)" in {
    val now = 1000L
    val df = Seq((1, 100L), (2, 991L), (3, 990L)).toDF("key", "ts")
    Changelog.ttlFilter(df, "ts", ttlUs = 10L, nowUs = now)
      .orderBy("key").select("key").as[Int].collect() shouldBe Seq(2, 3)
  }

  "keepLastN" should "retain the N most recent per key (ExampleESGateway keep-last-3)" in {
    val df = (1 to 5).map(i => (1, i.toLong)).toDF("key", "ts")
    Changelog.keepLastN(df, Seq("key"), "ts", 3)
      .orderBy("recency_rank").select("ts").as[Long].collect() shouldBe Seq(5L, 4L, 3L)
  }
}

class KVTableSpec extends SparkSpec {
  import spark.implicits._

  // KVStoreLocalSpec compound-prefix matrix: ExampleCompoundKey(key1, key2, subkey)
  private def store = KVTable(
    Seq(
      (1000L, "x", 1, "a", 10L),
      (1000L, "x", 2, "b", 20L),
      (1000L, "y", 1, "c", 30L),
      (2000L, "x", 1, "d", 40L)).toDF("key1", "key2", "subkey", "value", "ts"),
    keyCols = Seq("key1", "key2", "subkey"),
    tsCol = "ts")

  "KVTable.scan" should "reproduce the reference prefix-range matrix" in {
    store.scan(Seq(1000L)).count() shouldBe 3 // (1000) → 3 rows
    store.scan(Seq(1000L, "x")).count() shouldBe 2 // (1000,"x") → 2
    store.scan(Seq(3000L, "!")).count() shouldBe 0 // miss → 0
  }

  it should "apply the event-time range as a residual filter" in {
    store.scan(Seq(1000L), TimeRange(15L, 35L)).count() shouldBe 2
  }

  "KVTable.get" should "point-read one key" in {
    store.get(Seq(1000L, "y", 1)).select("value").as[String].collect() shouldBe Seq("c")
  }

  "KVTable.upsert" should "apply last-writer-wins on the next read" in {
    val updated = store.upsert(
      Seq((1000L, "x", 1, "a2", 50L)).toDF("key1", "key2", "subkey", "value", "ts"))
    updated.get(Seq(1000L, "x", 1)).select("value").as[String].collect() shouldBe Seq("a2")
    updated.numKeys shouldBe 4 // still 4 keys
  }

  "KVTable with TTL" should "hide expired records and shrink numKeys (KVStoreLocalSpec:87-106)" in {
    // ExpirableValue semantics: ttl 5s, record older than now-5s expired
    val t = KVTable(
      Seq((1L, "news", 9_000_000L), (2L, "olds", 3_000_000L)).toDF("key", "value", "ts"),
      Seq("key"), "ts", ttlUs = Some(5_000_000L), nowUs = 10_000_000L)
    t.get(Seq(2L)).count() shouldBe 0
    t.get(Seq(1L)).count() shouldBe 1
    t.numKeys shouldBe 1
  }

  "KVTable.asOf" should "replay to a point in time with TTL evaluated AT that time" in {
    val t = KVTable(
      Seq(
        (1L, "v1", 1_000_000L, false),
        (1L, "v2", 8_000_000L, false), // later overwrite
        (2L, "w1", 2_000_000L, false),
        (2L, null.asInstanceOf[String], 6_000_000L, true), // later tombstone
        (3L, "x1", 7_000_000L, false)) // born after the snapshot
        .toDF("key", "value", "ts", "dead"),
      Seq("key"), "ts", tombstoneCol = Some("dead"))
    val snap = t.asOf(5_000_000L).select("key", "value").as[(Long, String)]
      .collect().toMap
    snap shouldBe Map(1L -> "v1", 2L -> "w1") // pre-overwrite, pre-tombstone, no key 3
    // full latest: overwrite applied, key 2 tombstoned, key 3 live
    t.latest.select("key", "value").as[(Long, String)].collect().toMap shouldBe
      Map(1L -> "v2", 3L -> "x1")
    // TTL at the snapshot time: key 2's w1 (ts=2s) is EXPIRED as of t=8s
    // with ttl=5s even though it was live at t=5s; key 1's t=8s overwrite
    // and key 3 are fresh
    val ttl = t.copy(ttlUs = Some(5_000_000L), nowUs = 99L)
    ttl.asOf(8_000_000L).select("key").as[Long].collect().sorted shouldBe Seq(1L, 3L)
    ttl.asOf(5_000_000L).select("key").as[Long].collect().sorted shouldBe Seq(1L, 2L)
  }

  "getStats" should "report log depth, live keys, tombstones and the event-time span (P11)" in {
    val t = KVTable(
      Seq(
        (1L, "a", 10L, false),
        (1L, "a2", 20L, false),
        (2L, "b", 15L, false),
        (3L, "c", 5L, false),
        (3L, null.asInstanceOf[String], 30L, true)) // 3 deleted
        .toDF("key", "value", "ts", "tombstone"),
      Seq("key"), "ts", tombstoneCol = Some("tombstone"))
    val r = t.getStats.collect()(0)
    r.getAs[Long]("n_log_rows") shouldBe 5L
    r.getAs[Long]("n_keys") shouldBe 2L // key 3 tombstoned out
    r.getAs[Long]("n_tombstones") shouldBe 1L
    r.getAs[Long]("min_ts_us") shouldBe 5L
    r.getAs[Long]("max_ts_us") shouldBe 30L
    // in-memory changelog: no backing files
    r.getAs[Long]("n_files") shouldBe 0L
    r.getAs[Long]("total_bytes") shouldBe 0L
  }

  it should "report file metadata for a parquet-backed changelog" in {
    val dir = java.nio.file.Files.createTempDirectory("kv_stats").toString
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("key", "value", "ts")
      .write.mode("overwrite").parquet(dir)
    val t = KVTable(spark.read.parquet(dir), Seq("key"), "ts")
    val r = t.getStats.collect()(0)
    r.getAs[Long]("n_log_rows") shouldBe 2L
    r.getAs[Long]("n_keys") shouldBe 2L
    r.getAs[Long]("n_files") should be > 0L
    r.getAs[Long]("total_bytes") should be > 0L
  }

  "delete" should "tombstone keys out of the latest view" in {
    val t = KVTable(
      Seq((1L, "a", 10L, false), (2L, "b", 10L, false)).toDF("key", "value", "ts", "tombstone"),
      Seq("key"), "ts", tombstoneCol = Some("tombstone"))
    val afterDelete = t.delete(Seq((1L, null.asInstanceOf[String], 20L, true))
      .toDF("key", "value", "ts", "tombstone"))
    afterDelete.latest.select("key").as[Long].collect() shouldBe Seq(2L)
  }
}

class SecondaryIndexSpec extends SparkSpec {
  import spark.implicits._

  // ESecondaryIndexSpec shape: articles indexed by title words; delete
  // de-indexes (here: derived index is always consistent with the view).
  private val articles = Seq(
    (1, "spark engine fast", 100L),
    (2, "fast data engine", 200L),
    (3, "slow batch", 300L),
    (4, "fast lane", 400L)).toDF("id", "title", "ts")

  "SecondaryIndex" should "find all primary records for an index key" in {
    val idx = SecondaryIndex.build(articles, Seq("id"), split(col("title"), " "))
    SecondaryIndex.lookup(idx, articles, Seq("id"), "fast")
      .orderBy("id").select("id").as[Int].collect() shouldBe Seq(1, 2, 4)
  }

  it should "apply a time-range to lookups (ESecondaryIndexSpec since-filter)" in {
    val idx = SecondaryIndex.build(articles, Seq("id"), split(col("title"), " "))
    SecondaryIndex.lookup(idx, articles, Seq("id"), "fast",
      tsCol = Some("ts"), range = TimeRange.since(150L))
      .orderBy("id").select("id").as[Int].collect() shouldBe Seq(2, 4)
  }

  it should "de-index deleted records because the index derives from the latest view" in {
    val kv = KVTable(
      articles.withColumn("tombstone", lit(false))
        .unionByName(Seq((2, null.asInstanceOf[String], 500L, true))
          .toDF("id", "title", "ts", "tombstone")),
      Seq("id"), "ts", tombstoneCol = Some("tombstone"))
    val idx = SecondaryIndex.build(kv.latest, Seq("id"), split(col("title"), " "))
    SecondaryIndex.lookup(idx, kv.latest, Seq("id"), "fast")
      .orderBy("id").select("id").as[Int].collect() shouldBe Seq(1, 4)
  }
}
