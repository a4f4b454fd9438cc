package graft

import org.apache.spark.sql.types.LongType

import graft.core.Tables

/** Canary for the driver-provided testdata schemas. Round 7 burned a full
  * driver run because `events.parquet` silently changed physical type
  * (INT64 TIMESTAMP(NANOS) → TIMESTAMP(MICROS, NTZ)) and 43 queries failed
  * with opaque per-query analysis errors. This spec fails FIRST, with a
  * clear message, if the testdata shape drifts outside what
  * [[graft.core.Tables]] adapts to.
  */
class TestdataSchemaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  "events" should "load with ts_us as epoch-microsecond BIGINT under either supported physical type" in {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts_us").dataType == LongType,
      s"events.ts_us must be LongType (epoch µs); got ${ev.schema("ts_us").dataType}")
    assert(!ev.columns.contains("ts"), "raw ts column must be dropped (never expose raw timestamps)")
    val r = ev.selectExpr("min(ts_us) as lo", "max(ts_us) as hi", "count(*) as n").head()
    assert(r.getLong(2) > 0, "events is empty")
    // epoch-µs sanity window: 2000-01-01..2100-01-01. A nanos value read as
    // µs would land ~1000x past the window; a seconds/millis value far before.
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    assert(lo > 946684800000000L && hi < 4102444800000000L,
      s"events.ts_us outside the plausible epoch-µs window: [$lo, $hi] — " +
        "testdata timestamp unit drifted; fix Tables.events adaptation")
  }

  it should "carry the expected column set" in {
    val ev = Tables.events(spark, dir)
    assert(ev.columns.toSet == Set("event_id", "ts_us", "user_id", "event_type", "value", "props"),
      s"events columns drifted: ${ev.columns.mkString(",")}")
  }

  "core tables" should "exist with their key columns" in {
    val expect = Map(
      "lineitem" -> "l_orderkey", "orders" -> "o_orderkey", "customer" -> "c_custkey",
      "supplier" -> "s_suppkey", "part" -> "p_partkey", "nation" -> "n_nationkey",
      "region" -> "r_regionkey", "documents" -> "doc_id", "embeddings" -> "vec_id")
    for ((t, key) <- expect) {
      val df = spark.read.parquet(Tables.path(dir, t))
      assert(df.columns.contains(key), s"$t missing key column $key (has ${df.columns.mkString(",")})")
    }
  }
}
