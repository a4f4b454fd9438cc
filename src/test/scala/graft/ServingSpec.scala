package graft

import graft.state.{KVTable, Snapshot}
import graft.streaming.Subscriptions
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  "Snapshot" should "serve point reads from the latest view" in {
    val kv = KVTable(
      Seq((1L, "old", 10L), (1L, "new", 20L), (2L, "b", 10L)).toDF("k", "v", "ts"),
      Seq("k"), "ts")
    val snap = Snapshot.of(kv)
    snap.size shouldBe 2
    snap.get(Seq(1L)).map(_.getAs[String]("v")) shouldBe Some("new")
    snap.get(Seq(99L)) shouldBe None
  }

  it should "refuse to snapshot oversized keyspaces" in {
    val big = KVTable(
      spark.range(0, 1000).select(col("id").as("k"), col("id").as("ts")),
      Seq("k"), "ts")
    an[IllegalArgumentException] should be thrownBy Snapshot.of(big, maxRows = 100)
  }
}

/** R7: per-key subscription = update stream filtered to the key — the
  * reference pushes initial value + every change (KeyValueMediator,
  * Partition.scala:155-192). */
class SubscriptionsSpec extends SparkSpec {
  import spark.implicits._

  "subscribe" should "deliver every change for exactly the subscribed key, in order" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val feed = Subscriptions.subscribe(
      input.toDF().toDF("key", "value", "ts_us"), "key", 7L)

    val q = feed.writeStream.format("memory").queryName("sub7")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((7L, "v1", 1L), (8L, "other", 1L), (7L, "v2", 2L))
      q.processAllAvailable()
      input.addData((9L, "noise", 3L), (7L, "v3", 3L))
      q.processAllAvailable()
      val got = spark.sql("SELECT value FROM sub7 ORDER BY ts_us").as[String].collect()
      got shouldBe Seq("v1", "v2", "v3") // only key 7, every change
    } finally q.stop()
  }
}

class RecordViewsSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.GraftFunctions._

  "jsonView/xmlView" should "parse raw log values with explicit schemas (S9)" in {
    val json = Seq("""{"k": 69, "tag": "x"}""").toDF("value")
      .select(jsonView(col("value"), "k INT, tag STRING").as("r"))
      .select("r.k", "r.tag").as[(Int, String)].head()
    json shouldBe ((69, "x"))

    val xml = Seq("<rec><k>42</k><tag>y</tag></rec>").toDF("value")
      .select(xmlView(col("value"), "k INT, tag STRING").as("r"))
      .select("r.k", "r.tag").as[(Int, String)].head()
    xml shouldBe ((42, "y"))
  }
}
