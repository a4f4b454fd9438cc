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
    val startMs = startUs / 1000L
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsetsByTimestampStrategy", "latest")
      .option("startingTimestamp", startMs.toString)
      .load()
      .select(
        col("key"), col("value"),
        unix_micros(col("timestamp")).as("ts_us"),
        col("value").isNull.as("tombstone"),
        col("partition"), col("offset"))
      .filter(col("ts_us") >= startUs && col("ts_us") < endUs)
  }

  /** File (parquet dir) source with the canonical changelog schema —
    * the test-friendly LogStorage. */
  def fromFiles(spark: SparkSession, dir: String, schemaDdl: String): DataFrame =
    spark.readStream.schema(schemaDdl).parquet(dir)

  /** Materialize a streaming changelog to a latest-per-key parquet table,
    * exactly-once per micro-batch via idempotent overwrite keyed by batch —
    * the reference's transactional sink intent (TransactionCoordinator.scala:46-134)
    * expressed as foreachBatch + deterministic rewrite. */
  def materializeLatest(
      changelog: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tablePath: String,
      checkpoint: String): DataStreamWriter[Row] = {
    val spark = changelog.sparkSession
    changelog.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val target = new java.io.File(tablePath)
        val existing =
          if (target.exists()) Some(spark.read.parquet(tablePath)) else None
        val all = existing.fold(batch)(e => e.unionByName(batch, allowMissingColumns = true))
        val latest = graft.core.Changelog.compact(all, keyCols, tsCol)
        // write-to-temp + atomic swap: never overwrite the table we are
        // reading from mid-plan, and a crash mid-batch leaves the old table
        // intact (re-running the batch is idempotent — same batchId, same
        // deterministic result).
        val tmp = s"$tablePath.tmp-$batchId"
        latest.write.mode("overwrite").parquet(tmp)
        val old = new java.io.File(s"$tablePath.old-$batchId")
        if (target.exists()) target.renameTo(old)
        new java.io.File(tmp).renameTo(target)
        deleteRecursively(old)
        ()
      }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
    ()
  }

  def start(w: DataStreamWriter[Row]): StreamingQuery = w.start()
}
