package graft

import graft.core.EventTimes
import org.apache.spark.sql.functions._

class EventTimesSpec extends SparkSpec {
  import spark.implicits._

  "parseEventTimeUs" should "parse ISO-offset and the legacy dd.MM.yyyy pattern (EventTime.java:92-102)" in {
    val parsed = Seq(
      "2018-06-26T10:00:00+00:00",
      "26.06.2018 12:00:00+02", // legacy pattern, +02 offset → same 10:00 UTC
      "garbage")
      .toDF("s").select(EventTimes.parseEventTimeUs(col("s"))).as[Option[Long]].collect()
    val want = java.time.Instant.parse("2018-06-26T10:00:00Z").getEpochSecond * 1000000L
    parsed(0) shouldBe Some(want)
    parsed(1) shouldBe Some(want)
    parsed(2) shouldBe None // unparseable → null, not an exception
  }

  "fixed-width coercions" should "round-trip ints and longs through big-endian bytes" in {
    val r = Seq((42, 123456789012345L)).toDF("i", "l").select(
      EventTimes.fixedToLong(EventTimes.intToFixed(col("i"))).as("i2"),
      EventTimes.fixedToLong(EventTimes.longToFixed(col("l"))).as("l2"),
      octet_length(EventTimes.intToFixed(col("i"))).as("ilen"),
      octet_length(EventTimes.longToFixed(col("l"))).as("llen"),
      EventTimes.toHexString(EventTimes.intToFixed(col("i"))).as("hex"))
      .collect()(0)
    r.getAs[Long]("i2") shouldBe 42L
    r.getAs[Long]("l2") shouldBe 123456789012345L
    r.getAs[Int]("ilen") shouldBe 4 // @Fixed(4)
    r.getAs[Int]("llen") shouldBe 8 // @Fixed(8)
    r.getAs[String]("hex") shouldBe "0000002a"
  }

  it should "round-trip NEGATIVE keys distinctly (two's complement, no lpad truncation)" in {
    val r = Seq((-2, -100, -2L)).toDF("a", "b", "l").select(
      EventTimes.fixedToLong(EventTimes.intToFixed(col("a"))).as("a2"),
      EventTimes.fixedToLong(EventTimes.intToFixed(col("b"))).as("b2"),
      EventTimes.fixedToLong(EventTimes.longToFixed(col("l"))).as("l2"),
      octet_length(EventTimes.intToFixed(col("a"))).as("alen"))
      .collect()(0)
    // ints decode to their unsigned 32-bit value — but DISTINCT per key
    r.getAs[Long]("a2") shouldBe 4294967294L // 0xFFFFFFFE
    r.getAs[Long]("b2") shouldBe 4294967196L // 0xFFFFFF9C — no collision
    r.getAs[Long]("l2") shouldBe -2L // longs round-trip signed
    r.getAs[Int]("alen") shouldBe 4 // still Fixed(4), not 8
  }

  it should "preserve unsigned byte ordering for positive keys (prefix-scan property)" in {
    // the reference relies on BE fixed bytes sorting like their numeric keys
    val df = Seq(1L, 255L, 256L, 65535L, 1000000L).toDF("k")
      .select(col("k"), EventTimes.toHexString(EventTimes.longToFixed(col("k"))).as("h"))
      .orderBy("h").as[(Long, String)].collect()
    df.map(_._1).toSeq shouldBe Seq(1L, 255L, 256L, 65535L, 1000000L)
  }
}
