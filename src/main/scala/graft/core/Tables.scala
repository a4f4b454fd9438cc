package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's vectorized
  * parquet reader rejects by default; we read nanos as Long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and expose the canonical
  * event-time as epoch **microseconds** (`ts_us`), matching DuckDB's
  * truncation of ns→µs on read. Event time as a first-class column follows
  * the reference's Record/EventTime model
  * (reference: api/src/main/java/io/amient/affinity/core/storage/Record.java:26-31,
  * api/src/main/java/io/amient/affinity/core/util/EventTime.java:26-34).
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(path(dir, name))
  }

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Events with `ts_us: Long` (epoch microseconds) replacing the raw ts.
    *
    * Schema-adaptive: the driver has shipped `events.parquet` both as INT64
    * TIMESTAMP(NANOS) (loads as LongType under `nanosAsLong`) and as INT64
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (loads as TIMESTAMP_NTZ).
    *  - LongType (epoch ns): `ts div 1000`. NB `div`, not `/`: Spark's `/`
    *    on longs is DOUBLE division, which loses precision above 2^53 —
    *    epoch-ns values are ~2^61.
    *  - timestamp / timestamp_ntz: `unix_micros(cast(ts as timestamp))`
    *    (session tz is UTC, so NTZ≡LTZ) ≡ DuckDB `epoch_us(ts)` exactly.
    * Any other type fails fast with a schema message rather than 43 opaque
    * per-query analysis errors (round-7 regression). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = read(s, d, "events")
    raw.withColumn("ts_us", tsUsOf(raw.schema)).drop("ts")
  }

  /** The schema-adaptive ts→epoch-µs expression shared by [[events]] and
    * [[eventsStream]] (single source: the streaming view can never drift
    * from the batch one when the driver regenerates the parquet). */
  private def tsUsOf(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    schema("ts").dataType match {
      case LongType                          => expr("ts div 1000")
      case TimestampType | TimestampNTZType  => epochUs(col("ts"))
      case other => throw new IllegalStateException(
        s"events.parquet 'ts' has unsupported type $other; expected epoch-ns LongType " +
          "(INT64 TIMESTAMP(NANOS) under nanosAsLong) or timestamp/timestamp_ntz (INT64 TIMESTAMP(MICROS))")
    }
  }

  /** Structured-Streaming view of events with the same `ts_us: Long` as
    * [[events]] (S2's unbounded-source shape over the file log). The
    * batch-read schema seeds the stream reader, so the nanos/micros
    * adaptivity applies identically. */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(s)
    val schema = s.read.parquet(path(d, "events")).schema
    // FileStreamSource requires a DIRECTORY path; select the single log
    // file with a glob filter over the testdata dir
    val raw = streamRead(s, d, "events", schema)
    raw.withColumn("ts_us", tsUsOf(schema)).drop("ts")
  }

  /** Structured-Streaming view of the documents table — the streaming
    * ingest side of the LLM-data pipeline (w15's quality gate): same
    * batch-seeded schema discipline as [[eventsStream]]. */
  def documentsStream(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val schema = s.read.parquet(path(d, "documents")).schema
    streamRead(s, d, "documents", schema)
  }

  /** Structured-Streaming view of the embeddings table — the streaming
    * vector-ingest side of the ANN pipeline (w31's frozen-index
    * assignment): same batch-seeded schema discipline as
    * [[eventsStream]]/[[documentsStream]]. */
  def embeddingsStream(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val schema = s.read.parquet(path(d, "embeddings")).schema
    streamRead(s, d, "embeddings", schema)
  }


  /** Layout-adaptive FileStreamSource reader shared by every *Stream view.
    * Driver testdata ships each table as ONE parquet FILE (stream the
    * parent dir with a pathGlobFilter — FileStreamSource needs a
    * directory), but Spark-written tables (ScaleProbe's inflated sf1
    * world) are DIRECTORIES of part files, where that glob matches
    * NOTHING and a stream silently drains empty (caught r12: every
    * streaming sf1 probe ratio read 0.0x). A directory streams directly. */
  private def streamRead(s: SparkSession, d: String, name: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    // layout check via the Hadoop FileSystem API, not java.io.File: a
    // Hadoop-scheme dir (hdfs://, s3a://) is never a local File, so the
    // File form would silently fall back to the glob that matches nothing
    // and the stream drains empty (r12 advice) — the exact failure this
    // adaptive read exists to prevent
    val p = new org.apache.hadoop.fs.Path(path(d, name))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val isDir = fs.exists(p) && fs.getFileStatus(p).isDirectory
    if (isDir) s.readStream.schema(schema).parquet(p.toString)
    else s.readStream.schema(schema)
      .option("pathGlobFilter", s"$name.parquet").parquet(d)
  }

  /** Epoch microseconds of any timestamp/timestamp_ntz column (session tz is
    * UTC everywhere, so NTZ and LTZ agree). Output contract: query results
    * never expose raw timestamp columns — always epoch µs BIGINT. */
  def epochUs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_micros(c.cast("timestamp"))
}
