package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Exactly-once streaming output: batchId-keyed idempotent writes plus a
  * committed-batch ledger (SURVEY §2.2 S6).
  *
  * The reference brackets each output batch in a transaction keyed by its
  * position in the input log — begin / append / commit, with replayed
  * batches recognized and skipped (core/.../TransactionCoordinator.scala:46-134;
  * kafka/.../TransactionalProducer.scala). Spark's foreachBatch gives
  * at-least-once delivery of (batch, batchId) with batchId strictly
  * monotonic per checkpoint; this object upgrades it to exactly-once the
  * same way the reference does:
  *
  *  1. `committed(ledger)` — the set of batch ids already committed.
  *  2. A replayed batchId (after a crash between sink write and checkpoint
  *     commit, or a checkpoint rolled back) is SKIPPED entirely.
  *  3. An uncommitted batch writes its output under a batchId-keyed
  *     directory (`out/batch=<id>`) with mode=overwrite — so a crash AFTER
  *     the data write but BEFORE the ledger commit is healed by the replay
  *     overwriting the same path with the same deterministic content.
  *  4. The ledger commit is an atomic rename of an empty marker file —
  *     the single point that flips the batch from "maybe written" to
  *     "exactly once". Readers take `committedView` which joins output
  *     directories against the ledger, so a torn batch (data present,
  *     marker absent) is invisible.
  *
  * Kafka variant: step 3/4 become producer.beginTransaction / send /
  * commitTransaction with `transactional.id = <sinkId>-<batchId>` — same
  * protocol, broker-held ledger. No broker exists in this container, so the
  * file form is the tested one and the Kafka mapping is documented here.
  */
object EosSink {

  private def ledgerDir(outDir: String) = new File(outDir, "_ledger")

  /** Batch ids whose output is committed (marker file present). */
  def committed(outDir: String): Set[Long] =
    Option(ledgerDir(outDir).listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName.toLongOption).toSet

  /** Process one micro-batch exactly once. Returns true if this call wrote
    * and committed the batch, false if the ledger showed it already
    * committed (replay ⇒ no-op). */
  def processBatch(batch: DataFrame, batchId: Long, outDir: String): Boolean = {
    if (committed(outDir).contains(batchId)) return false
    // idempotent data write: batchId-keyed path, overwrite heals torn writes
    batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    // atomic commit point: tmp marker renamed into the ledger
    val dir = ledgerDir(outDir)
    dir.mkdirs()
    val tmp = new File(dir, s".$batchId.tmp")
    if (!tmp.createNewFile() && !tmp.exists())
      throw new java.io.IOException(s"cannot stage ledger marker for batch $batchId")
    val marker = new File(dir, batchId.toString)
    if (!tmp.renameTo(marker) && !marker.exists())
      throw new java.io.IOException(s"ledger commit failed for batch $batchId")
    true
  }

  /** The exactly-once view of the sink: union of committed batch outputs
    * only — data directories without a ledger marker (torn batches) are
    * excluded. */
  def committedView(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    val dirs = committed(outDir).toSeq.sorted.map(id => s"$outDir/batch=$id")
    require(dirs.nonEmpty, s"no committed batches under $outDir")
    spark.read.parquet(dirs: _*)
  }

  /** Wire a streaming frame to the sink (AvailableNow, one ledger per
    * outDir). `outputMode` defaults to append; `tag` lets the caller
    * stamp each batch before the idempotent write (e.g. a batchId column
    * for last-writer-wins compaction, the w9 shape) — it must be a pure
    * function of (batch, batchId) or replay healing breaks. */
  def writer(stream: DataFrame, outDir: String, checkpoint: String,
      outputMode: String = "append",
      tag: (DataFrame, Long) => DataFrame = (b, _) => b): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(tag(batch, batchId), batchId, outDir)
        ()
      }
}
