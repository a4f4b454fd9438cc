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

  /** Events with `ts_us: Long` (epoch microseconds) replacing the raw ns ts.
    * NB `div`, not `/`: Spark's `/` on longs is DOUBLE division, which loses
    * precision above 2^53 — epoch-ns values are ~2^61. */
  def events(s: SparkSession, d: String): DataFrame =
    read(s, d, "events").withColumn("ts_us", expr("ts div 1000")).drop("ts")

  /** Epoch microseconds of any timestamp/timestamp_ntz column (session tz is
    * UTC everywhere, so NTZ and LTZ agree). Output contract: query results
    * never expose raw timestamp columns — always epoch µs BIGINT. */
  def epochUs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_micros(c.cast("timestamp"))
}
