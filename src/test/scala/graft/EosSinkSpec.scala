package graft

import java.io.File
import java.nio.file.Files

import graft.streaming.EosSink

/** Exactly-once output (SURVEY §2.2 S6): replay-tested per the reference's
  * transaction protocol (TransactionCoordinator.scala:46-134) — a replayed
  * batch id must not duplicate output, and a batch torn between data write
  * and ledger commit must heal on replay with exactly one copy visible. */
class EosSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  "EosSink" should "skip a replayed batchId (no duplicates)" in {
    val out = tmpDir("eos1")
    val batch = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    EosSink.processBatch(batch, 0L, out) shouldBe true
    // crash-replay: the SAME batchId arrives again (foreachBatch redelivery)
    EosSink.processBatch(batch, 0L, out) shouldBe false
    EosSink.committed(out) shouldBe Set(0L)
    EosSink.committedView(spark, out).count() shouldBe 2L
  }

  it should "heal a batch torn between data write and ledger commit" in {
    val out = tmpDir("eos2")
    val batch = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    // simulate the crash: data landed, ledger marker never committed
    batch.write.mode("overwrite").parquet(s"$out/batch=5")
    EosSink.committed(out) shouldBe empty // torn batch invisible to readers
    // replay of batch 5 overwrites the same path, then commits
    EosSink.processBatch(batch, 5L, out) shouldBe true
    EosSink.committedView(spark, out).count() shouldBe 2L // exactly one copy
  }

  it should "deliver each input row exactly once across a re-run stream" in {
    val out = tmpDir("eos3")
    val src = tmpDir("eos3src")
    val cp = tmpDir("eos3cp")
    Seq(("k1", 10L), ("k2", 20L)).toDF("k", "v").write.mode("append").parquet(src)
    val stream = spark.readStream.schema("k STRING, v BIGINT").parquet(src)
    EosSink.writer(stream, out, cp).start().awaitTermination()
    val afterFirst = EosSink.committedView(spark, out).as[(String, Long)].collect().sorted
    afterFirst shouldBe Seq(("k1", 10L), ("k2", 20L))

    // second AvailableNow run, same checkpoint: no new input → no new batch
    EosSink.writer(stream, out, cp).start().awaitTermination()
    EosSink.committedView(spark, out).count() shouldBe 2L

    // checkpoint lost (worst-case replay): Spark re-reads everything as
    // fresh batch ids, but each (batchId, content) write is idempotent and
    // ledgered — rows appear once per committed batch, never torn. Batch
    // numbering restarts at 0, which the first run already committed, so
    // the replayed batch 0 is recognized and SKIPPED — the ledger is the
    // single source of truth, exactly the reference's replay semantics.
    val cp2 = tmpDir("eos3cp2")
    EosSink.writer(stream, out, cp2).start().awaitTermination()
    EosSink.committedView(spark, out).as[(String, Long)].collect().sorted shouldBe
      Seq(("k1", 10L), ("k2", 20L))
    new File(s"$out/_ledger").listFiles().count(!_.getName.startsWith(".")) shouldBe 1
  }
}
