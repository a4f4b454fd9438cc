package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming changelog ingestion & materialization.
  *
  * Kafka-backed in production (`readStream.format("kafka")` carries key,
  * value, timestamp, partition, offset — the reference's LogEntry,
  * api/.../storage/LogEntry.java:22-27); file-backed for tests (this
  * container has no broker). Either way the canonical changelog columns are
  * (key, value, ts_us, tombstone) and materialization is
  * `foreachBatch` upsert into a latest-per-key parquet table — the batch
  * `MERGE` analogue of the reference's write-through memstore
  * (KVStoreLocal.put:477-513).
  */
object ChangelogStream {

  /** Kafka source → canonical changelog columns. Tombstone = null value,
    * like the reference (KafkaLogStorage.append/delete:302-320).
    * Untestable without a broker; the shape is the documented contract. */
  def fromKafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(
        col("key"),
        col("value"),
        unix_micros(col("timestamp")).as("ts_us"),
        col("value").isNull.as("tombstone"),
        col("partition"),
        col("offset"))

  /** S1 bounded Kafka read: one batch covering exactly a [start, end) event
    * -time range, pushed down to offsets via startingOffsetsByTimestamp —
    * the reference's `reset(partition, TimeRange)` → `offsetsForTimes` path
    * (KafkaLogStorage.scala:168-204) — plus the residual timestamp filter
    * for records that slip inside the offset bounds. Untestable without a
    * broker in this environment; the contract is pinned here. */
  def kafkaBounded(
      spark: SparkSession,
      bootstrap: String,
      topic: String,
      startUs: Long,
      endUs: Long): DataFrame = {
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsetsByTimestampStrategy", "latest")
      .option("startingTimestamp", KafkaBounds.startMs(startUs).toString)
      // bound the scan at the offsets for endUs too - otherwise the batch
      // reads to the topic head and discards the tail with the residual
      // filter (ceil so boundary-ms records are kept for the us filter);
      // the floor/ceil/residual arithmetic lives in KafkaBounds so it is
      // unit-testable without a broker
      .option("endingTimestamp", KafkaBounds.endMsCeil(endUs).toString)
      .load()
      .select(
        col("key"), col("value"),
        unix_micros(col("timestamp")).as("ts_us"),
        col("value").isNull.as("tombstone"),
        col("partition"), col("offset"))
      .filter(KafkaBounds.residual(col("ts_us"), startUs, endUs))
  }

  /** File (parquet dir) source with the canonical changelog schema —
    * the test-friendly LogStorage. */
  def fromFiles(spark: SparkSession, dir: String, schemaDdl: String): DataFrame =
    spark.readStream.schema(schemaDdl).parquet(dir)

  /** Materialize a streaming changelog to a latest-per-key parquet table,
    * exactly-once per micro-batch via idempotent overwrite keyed by batch —
    * the reference's transactional sink intent (TransactionCoordinator.scala:46-134)
    * expressed as foreachBatch + deterministic rewrite. */
  /** `tieBreakCols`: ordering for same-timestamp updates to one key — pass
    * `Seq("offset")` for Kafka-sourced changelogs (Kafka timestamps are
    * MILLISECOND resolution, so two updates to a key in one ms tie on
    * `tsCol` alone and the survivor would be arbitrary across reruns,
    * breaking the idempotent-overwrite guarantee). */
  def materializeLatest(
      changelog: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tablePath: String,
      checkpoint: String,
      tieBreakCols: Seq[String] = Nil): DataStreamWriter[Row] = {
    val spark = changelog.sparkSession
    changelog.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val existing =
          if (AtomicSwap.recover(tablePath)) Some(spark.read.parquet(tablePath)) else None
        val all = existing.fold(batch)(e => e.unionByName(batch, allowMissingColumns = true))
        val latest = graft.core.Changelog.compact(all, keyCols, tsCol, tieBreakCols)
        // crash-safe swap (see AtomicSwap): never overwrite the table we are
        // reading from mid-plan; interrupted swaps roll back on the next
        // batch before the table is read.
        AtomicSwap.swap(latest, tablePath, batchId)
        ()
      }
  }

  /** [[materializeLatest]] plus LIVE secondary-index maintenance (w34 —
    * the R4/R6 surface in streaming form): each micro-batch compacts the
    * changelog into the latest-per-key table AND re-derives the inverted
    * index from the compacted non-tombstone view (SecondaryIndex.build),
    * swapping both crash-safely. Because the index is DERIVED from the
    * same latest view every batch (never incrementally patched), tombstone
    * de-indexing and stale-posting removal hold by construction — the
    * declarative dissolution of the reference's CDC-listener de-indexing
    * bugs (KVStoreLocal.scala:214 TODO #242/#248), now also live under
    * streaming ingest. The index is re-read from the freshly swapped
    * table path so its lineage never spans the swap. */
  def maintainIndexed(
      changelog: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      indexFn: org.apache.spark.sql.Column,
      tablePath: String,
      indexPath: String,
      checkpoint: String,
      tieBreakCols: Seq[String] = Nil): DataStreamWriter[Row] = {
    val spark = changelog.sparkSession
    changelog.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val existing =
          if (AtomicSwap.recover(tablePath)) Some(spark.read.parquet(tablePath)) else None
        val all = existing.fold(batch)(e => e.unionByName(batch, allowMissingColumns = true))
        val latest = graft.core.Changelog.compact(all, keyCols, tsCol, tieBreakCols)
        AtomicSwap.swap(latest, tablePath, batchId)
        val live = spark.read.parquet(tablePath).filter(!col("tombstone"))
        AtomicSwap.recover(indexPath)
        AtomicSwap.swap(
          graft.state.SecondaryIndex.build(live, keyCols, indexFn),
          indexPath, batchId)
        ()
      }
  }

  def start(w: DataStreamWriter[Row]): StreamingQuery = w.start()
}
