package graft

import graft.functions.GraftFunctions.md5Hash60
import graft.operators.Sketches
import graft.streaming.StreamingSketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch ↔ streaming parity for the sketch registers: the same values fed
  * as micro-batches must leave EXACTLY the registers the batch builders
  * compute in one pass. For HLL/CMS this is the update-mode run of the
  * UNCHANGED batch code (their merges are plain aggregates); KMV goes
  * through the capped-state op. Pattern from StreamingParitySpec. */
class StreamingSketchesSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1 to 300).map(i => (s"g${i % 2}", s"v${i % 120}"))

  it should "stream HLL registers identical to the batch build" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = Sketches.hllRegisters(rows.toDF("g", "v"), Seq("g"), "v", m = 32)
      .as[(String, Long, Int)].collect().toSet

    val input = MemoryStream[(String, String)]
    val regs = StreamingSketches.hllRegisterStream(
      input.toDF().toDF("g", "v"), "g", "v", m = 32)
    val q = regs.writeStream.format("memory").queryName("hll_regs")
      .outputMode("update").start()
    try {
      rows.grouped(100).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // registers only grow → final value per (g, idx) = max emitted
    val streamed = spark.sql(
      "SELECT g, idx, max(mreg) AS mreg FROM hll_regs GROUP BY g, idx")
      .as[(String, Long, Int)].collect().toSet
    streamed shouldBe batch
  }

  it should "stream CMS registers identical to the batch build" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = Sketches.cmsBuild(rows.toDF("g", "v"), col("v"), lit(1L), 4, 64)
      .as[(Int, Long, Long)].collect().toSet

    val input = MemoryStream[(String, String)]
    val regs = StreamingSketches.cmsRegisterStream(
      input.toDF().toDF("g", "v"), "v", depth = 4, width = 64)
    val q = regs.writeStream.format("memory").queryName("cms_regs")
      .outputMode("update").start()
    try {
      rows.grouped(75).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // counters only grow → final value per (r, b) = max emitted
    val streamed = spark.sql(
      "SELECT r, b, max(c) AS c FROM cms_regs GROUP BY r, b")
      .as[(Int, Long, Long)].collect().toSet
    streamed shouldBe batch
  }

  it should "stream KMV registers identical to the batch build" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = Sketches.kmvRegisters(rows.toDF("g", "v"), Seq("g"), "v", k = 16)
      .groupBy("g").agg(sort_array(collect_list(col("hv"))).as("regs"))
      .as[(String, Seq[Long])].collect().toMap

    val input = MemoryStream[(String, String)]
    val hashed = input.toDF().toDF("g", "v")
      .select(col("g"), md5Hash60(col("v")).as("hv"))
      .as[(String, Long)]
    val out = StreamingSketches.kmvRegisterStream(hashed, k = 16)
      .toDF("g", "n_updates", "regs")
    val q = out.writeStream.format("memory").queryName("kmv_regs")
      .outputMode("update").start()
    try {
      rows.grouped(60).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // n_updates strictly increases → newest row per group wins
    val streamed = spark.sql(
      "SELECT g, max_by(regs, n_updates) AS regs FROM kmv_regs GROUP BY g")
      .as[(String, Seq[Long])].collect().toMap
    streamed shouldBe batch
  }

  it should "stream log-histogram registers identical to the batch build" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vals = (1 to 300).map(i => (s"g${i % 2}", (i * i).toLong))
    val batch = Sketches.logHistSketch(vals.toDF("g", "v"), Seq("g"), "v", s = 3)
      .as[(String, Long, Long)].collect().toSet

    val input = MemoryStream[(String, Long)]
    val regs = StreamingSketches.logHistRegisterStream(
      input.toDF().toDF("g", "v"), "g", "v", s = 3)
    val q = regs.writeStream.format("memory").queryName("lh_regs")
      .outputMode("update").start()
    try {
      vals.grouped(90).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // bucket counts only grow → final value per (g, id) = max emitted
    val streamed = spark.sql(
      "SELECT g, id, max(cnt) AS cnt FROM lh_regs GROUP BY g, id")
      .as[(String, Long, Long)].collect().toSet
    streamed shouldBe batch
  }
}
