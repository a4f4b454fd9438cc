package graft

import org.apache.spark.sql.functions._

/** LogTool report: block segmentation, compaction preview, density chart
  * (spec-driven by reference cli/TimeLogTool.scala semantics — fuzz-window
  * block splitting over a time-ordered log). */
class LogToolSpec extends SparkSpec {
  import spark.implicits._

  private val MinUs = 60L * 1000000L

  "LogTool.report" should "segment fuzz-separated blocks and preview compaction" in {
    // two activity bursts 30 min apart, fuzz 5 min → exactly 2 blocks;
    // 6 rows over 3 keys → compaction keeps 3
    val log = Seq(
      ("a", 0L), ("b", 1 * MinUs), ("a", 2 * MinUs),
      ("c", 32 * MinUs), ("b", 33 * MinUs), ("c", 34 * MinUs)
    ).toDF("k", "ts_us")
    val lines = LogTool.report(log, Seq("k"), "ts_us", fuzzMinutes = 5)
    lines.head shouldBe "number of records: 6"
    lines should contain("live keys after compaction: 3")
    lines should contain("compaction would drop: 3 records (50%)")
    lines.find(_.startsWith("blocks")).get should endWith(": 2")
    val blockLines = lines.filter(_.startsWith("  block "))
    blockLines should have size 2
    all(blockLines) should include("3 records")
  }

  it should "render a density chart bounded by the requested geometry" in {
    val log = (0 until 100).map(i => ("k" + i, i * MinUs)).toDF("k", "ts_us")
    val lines = LogTool.report(log, Seq("k"), "ts_us", fuzzMinutes = 5,
      chartWidth = 40, chartHeight = 6)
    val bars = lines.filter(_.startsWith("  |"))
    bars should have size 6
    all(bars.map(_.length)) should be <= (3 + 40)
    // uniform density → the bottom row is fully dark
    bars.last.drop(3).count(_ == '#') shouldBe 40
  }

  it should "handle an empty log" in {
    val log = Seq.empty[(String, Long)].toDF("k", "ts_us")
    LogTool.report(log, Seq("k"), "ts_us", 5) shouldBe Seq("number of records: 0")
  }
}
