package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.functions.TimeCryptoProof
import graft.serving.{ChangeFeed, Gateway}
import graft.state.{KVTable, Snapshot}

/** The HTTP serving layer (reference GatewayHttp's data plane): point
  * reads, stats, CDC watch buffer, and signed-URL auth — driven over REAL
  * loopback HTTP with the JDK client. */
class GatewaySpec extends SparkSpec {
  import spark.implicits._

  private val client = HttpClient.newHttpClient()
  private def get(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def store = KVTable(
    Seq(
      (1L, "alice", 100L, false),
      (2L, "bob", 100L, false),
      (2L, "robert", 200L, false), // later write wins
      (3L, "carol", 100L, true)) // tombstoned
      .toDF("account", "owner", "ts", "tombstone"),
    Seq("account"), "ts", tombstoneCol = Some("tombstone"))

  it should "serve point reads, misses, and stats from the latest view" in {
    val gw = new Gateway(Snapshot.of(store)).start()
    try {
      val ok = get(s"http://127.0.0.1:${gw.port}/kv/2")
      ok.statusCode() shouldBe 200
      ok.body() should include(""""owner":"robert"""") // compacted: last write
      get(s"http://127.0.0.1:${gw.port}/kv/3").statusCode() shouldBe 404 // tombstoned
      get(s"http://127.0.0.1:${gw.port}/kv/99").statusCode() shouldBe 404
      get(s"http://127.0.0.1:${gw.port}/stats").body() shouldBe """{"num_keys":2}"""
      get(s"http://127.0.0.1:${gw.port}/nope").statusCode() shouldBe 404
    } finally gw.stop()
  }

  it should "enforce signed-URL auth with the ±1-minute window (§2.6h gateway check)" in {
    val salt = "000102030405060708090A0B0C0D0E0F"
    val now = 1704844830L
    val gw = new Gateway(Snapshot.of(store), saltHex = Some(salt), clock = () => now).start()
    try {
      val base = s"http://127.0.0.1:${gw.port}"
      get(s"$base/kv/1").statusCode() shouldBe 401 // unsigned
      val sig = TimeCryptoProof.sign("/kv/1", salt, TimeCryptoProof.wholeMinute(now))
      get(s"$base/kv/1?signature=$sig").statusCode() shouldBe 200
      // previous window still verifies (clock skew tolerance)
      val prev = TimeCryptoProof.sign("/kv/1", salt, TimeCryptoProof.wholeMinute(now) - 60L)
      get(s"$base/kv/1?signature=$prev").statusCode() shouldBe 200
      // two windows back: expired
      val old = TimeCryptoProof.sign("/kv/1", salt, TimeCryptoProof.wholeMinute(now) - 120L)
      get(s"$base/kv/1?signature=$old").statusCode() shouldBe 401
      // a signature never authorizes a DIFFERENT path
      get(s"$base/kv/2?signature=$sig").statusCode() shouldBe 401
    } finally gw.stop()
  }

  it should "push a live streaming query's changes through /watch end-to-end (R7)" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val feed = new ChangeFeed()
    val gw = new Gateway(Snapshot.of(store), feed).start()
    // the engine-side subscription (filter to the key) + the transport-side
    // sink (foreachBatch appending to the gateway's buffer) — the full
    // reference KeyValueMediator path: subscribe, then push every change
    val sub = graft.streaming.Subscriptions.subscribe(
      input.toDS().toDF("account", "balance"), "account", "acct7")
    val q = sub.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          feed.append(r.getAs[String]("account"), s"""{"balance":${r.getAs[Long]("balance")}}"""))
      }.start()
    try {
      input.addData(("acct7", 10L), ("other", 99L))
      q.processAllAvailable()
      input.addData(("acct7", 25L))
      q.processAllAvailable()
      val body = get(s"http://127.0.0.1:${gw.port}/watch/acct7").body()
      body should include(""""balance":10""")
      body should include(""""balance":25""")
      body should not include """"balance":99""" // unsubscribed key never pushed
    } finally { q.stop(); gw.stop() }
  }

  it should "serve the buffered per-key change feed with seq cursors (R7/R8)" in {
    val feed = new ChangeFeed(keepLastN = 2)
    val gw = new Gateway(Snapshot.of(store), feed).start()
    try {
      val base = s"http://127.0.0.1:${gw.port}"
      get(s"$base/watch/acct1").body() shouldBe "[]"
      feed.append("acct1", """{"balance":10}""")
      val s2 = feed.append("acct1", """{"balance":20}""")
      feed.append("other", """{"balance":99}""")
      val all = get(s"$base/watch/acct1").body()
      all should include(""""balance":10""")
      all should include(""""balance":20""")
      all should not include """"balance":99""" // key isolation
      // cursor: only changes after seq=s2's predecessor
      get(s"$base/watch/acct1?from=${s2 - 1}").body() shouldBe
        s"""[{"seq":$s2,"value":{"balance":20}}]"""
      // keep-last-N: a third append evicts the first
      feed.append("acct1", """{"balance":30}""")
      get(s"$base/watch/acct1").body() should not include """"balance":10"""
    } finally gw.stop()
  }

  it should "serve /kv through the bucketed route, scanning exactly ONE bucket dir per request (r13 verdict #6)" in {
    import graft.streaming.BucketedStore
    val root = java.nio.file.Files.createTempDirectory("graft-gwb")
      .toFile.getAbsolutePath
    val df = Seq(
      (1L, "alice", false),
      (2L, "robert", false),
      (3L, "carol", true)) // tombstoned key: a 404, same as the snapshot route
      .toDF("account", "owner", "tombstone")
    BucketedStore.writeBuckets(df, BucketedStore.bucketCol(Seq("account"), 4),
      root, Seq(0, 1, 2, 3), 0L, arity = 4)

    val route = new Gateway.BucketedRoute(spark, root, Seq("account"))
    route.keyTypes shouldBe Seq(org.apache.spark.sql.types.LongType) // from the STORE schema
    val gw = new Gateway(Snapshot.of(store), bucketed = Some(route)).start()
    try {
      val base = s"http://127.0.0.1:${gw.port}"
      val ok = get(s"$base/kv/2")
      ok.statusCode() shouldBe 200
      ok.body() should include(""""owner":"robert"""")
      // the stamped scan metric: one bucket dir, never the table — the
      // reference's partition-routed read cost model (Group.scala:78-82)
      route.lastScanDirs.size shouldBe 1
      new java.io.File(route.lastScanDirs.head).getName should
        fullyMatch regex "b\\d+"
      get(s"$base/kv/3").statusCode() shouldBe 404 // tombstoned
      get(s"$base/kv/99").statusCode() shouldBe 404 // miss
      get(s"$base/kv/not-a-long").statusCode() shouldBe 404 // uncoercible
    } finally gw.stop()
  }

  it should "serve multi-term index lookups from the live bucketed index (R5 over HTTP)" in {
    import graft.streaming.BucketedStore
    val root = java.nio.file.Files.createTempDirectory("graft-gwi")
      .toFile.getAbsolutePath
    val tbl = Seq(
      (1L, "alice etl", false),
      (2L, "bob etl gpu", false),
      (3L, "carol gpu", false),
      (4L, "dan etl gpu", true)) // tombstoned: indexed nowhere served
      .toDF("account", "tags", "tombstone")
    val bexpr = BucketedStore.bucketCol(Seq("account"), 4)
    BucketedStore.writeBuckets(tbl, bexpr, s"$root/t", Seq(0, 1, 2, 3), 0L, 4)
    val idx = graft.state.SecondaryIndex.build(
      tbl.filter(!org.apache.spark.sql.functions.col("tombstone")),
      Seq("account"),
      org.apache.spark.sql.functions.split($"tags", " "))
    BucketedStore.writeBuckets(idx, bexpr, s"$root/i", Seq(0, 1, 2, 3), 0L, 4)

    val route = new Gateway.IndexRoute(spark, s"$root/t", s"$root/i", Seq("account"))
    val gw = new Gateway(Snapshot.of(store), index = Some(route)).start()
    try {
      val base = s"http://127.0.0.1:${gw.port}"
      val both = get(s"$base/index/etl,gpu").body()
      both should include(""""account":2""")
      both should not include """"account":1""" // etl only
      both should not include """"account":3""" // gpu only
      both should not include """"account":4""" // tombstoned
      get(s"$base/index/gpu").body() should include(""""account":3""")
      get(s"$base/index/nope").body() shouldBe "[]"
    } finally gw.stop()
  }
}
