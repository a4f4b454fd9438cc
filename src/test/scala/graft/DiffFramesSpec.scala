package graft

import graft.core.Changelog
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class DiffFramesSpec extends SparkSpec {
  import spark.implicits._

  "scd2History" should "chain validity intervals per key with an open current record" in {
    val log = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 300L, "c"),
      (2L, 150L, "x")
    ).toDF("k", "ts_us", "v")
    val h = Changelog.scd2History(log, Seq("k"), "ts_us")
      .orderBy("k", "valid_from_us")
      .select("k", "v", "valid_from_us", "valid_to_us")
      .as[(Long, String, Long, Option[Long])].collect()
    h shouldBe Array(
      (1L, "a", 100L, Some(200L)), (1L, "b", 200L, Some(300L)),
      (1L, "c", 300L, None), (2L, "x", 150L, None))
    // "as was at T" is a row-local filter over the intervals
    val at250 = Changelog.scd2History(log, Seq("k"), "ts_us")
      .filter(col("valid_from_us") <= 250L &&
        (col("valid_to_us").isNull || col("valid_to_us") > 250L))
      .select("k", "v").as[(Long, String)].collect().toMap
    at250 shouldBe Map(1L -> "b", 2L -> "x")
  }

  "diffSnapshots" should "classify inserts, deletes, updates and drop unchanged keys" in {
    val old = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c")).toDF("k", "n", "v")
    val neu = Seq((2L, 20L, "b"), (3L, 31L, "c"), (4L, 40L, "d")).toDF("k", "n", "v")
    val d = Changelog.diffSnapshots(old, neu, Seq("k"))
      .select("k", "change_type").orderBy("k").as[(Long, String)].collect()
    d shouldBe Array((1L, "delete"), (3L, "update"), (4L, "insert"))
  }

  it should "treat null values null-safely (null == null is unchanged)" in {
    val old = Seq((1L, Option.empty[String]), (2L, Option("x"))).toDF("k", "v")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "v")
    val d = Changelog.diffSnapshots(old, neu, Seq("k"))
      .select("k", "change_type").as[(Long, String)].collect()
    d shouldBe Array((2L, "update")) // key 1 unchanged: null <=> null
  }

  it should "reject mismatched snapshot schemas" in {
    val old = Seq((1L, 1L)).toDF("k", "a")
    val neu = Seq((1L, 1L)).toDF("k", "b")
    an[IllegalArgumentException] should be thrownBy
      Changelog.diffSnapshots(old, neu, Seq("k"))
  }

  "sampleFrames" should "emit every stride-th full frame with its fingerprint" in {
    // 40 chars -> 10 frames of 4 chars; stride 3 -> frames 0,3,6,9
    val text = (0 until 40).map(i => ('a' + i % 26).toChar).mkString
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val out = Multimodal.sampleFrames(df, "doc_id", "text", frameChars = 4, stride = 3)
      .orderBy("frame_idx")
      .select("frame_idx", "frame_md5").as[(Long, String)].collect()
    out.map(_._1) shouldBe Array(0L, 3L, 6L, 9L)
    val expected = Array(0, 3, 6, 9).map(i => text.substring(i * 4, i * 4 + 4))
    val got = out.map(_._1).map(i => text.substring(i.toInt * 4, i.toInt * 4 + 4))
    got shouldBe expected // index arithmetic lines up with the content slices
    out.map(_._2).distinct.length shouldBe 4 // distinct frames hash distinctly
  }

  it should "drop documents shorter than one frame and ignore a trailing partial frame" in {
    val df = Seq((1L, "abc"), (2L, "abcdefgh")).toDF("doc_id", "text")
    val out = Multimodal.sampleFrames(df, "doc_id", "text", frameChars = 4, stride = 1)
      .select("doc_id", "frame_idx").orderBy("doc_id", "frame_idx")
      .as[(Long, Long)].collect()
    out shouldBe Array((2L, 0L), (2L, 1L)) // doc 1 has no full frame; 8 chars = 2 frames
  }
}
