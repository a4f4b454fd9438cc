package graft

import java.sql.Timestamp

import graft.streaming.StreamingJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream tolerance enrich (SURVEY §2.7): two unbounded inputs,
  * watermarks on both, time-range condition bounding the join state. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(3600_000L + minute * 60_000L)

  "enrichWithinTolerance" should "match right events within the window before each left event" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp)]
    val views = MemoryStream[(String, Timestamp)]
    val left = clicks.toDS().toDF("cu", "click_ts").withWatermark("click_ts", "1 hour")
    val right = views.toDS().toDF("vu", "view_ts").withWatermark("view_ts", "1 hour")

    val joined = StreamingJoins.enrichWithinTolerance(
      left, right, Seq(("cu", "vu")), "click_ts", "view_ts", "10 minutes")
      .select(col("cu"), unix_micros(col("click_ts")).as("c_us"),
        unix_micros(col("view_ts")).as("v_us"))

    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      views.addData(("u1", ts(0)), ("u1", ts(5)), ("u1", ts(30)), ("u2", ts(9)))
      clicks.addData(("u1", ts(10)), ("u2", ts(40)))
      q.processAllAvailable()
      val got = spark.sql("SELECT cu, c_us, v_us FROM ss_join")
        .as[(String, Long, Long)].collect().sorted.toSeq
      // u1 click@10 matches views @0 (boundary: 10 min before) and @5;
      // view @30 is AFTER the click; u2 click@40 has no view within 10 min
      got shouldBe Seq(
        ("u1", unixUs(10), unixUs(0)),
        ("u1", unixUs(10), unixUs(5)))
    } finally q.stop()
  }

  private def unixUs(minute: Int): Long = (3600_000L + minute * 60_000L) * 1000L
}
