package graft.state

import graft.core.{Changelog, TimeRange}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's KVStore algebra re-expressed as a declarative view over a
  * changelog DataFrame (reference: core/.../state/KVStore.scala:10-137,
  * KVStoreLocal.scala).
  *
  * A `KVTable` is (changelog rows, key columns, event-time column). All
  * operators return DataFrames/KVTables lazily — nothing executes until an
  * action, so Catalyst sees the whole pipeline and can push filters below the
  * compaction aggregate where legal (point lookups prune at the parquet scan,
  * the columnar analogue of the reference's RocksDB prefix seek,
  * MemStoreRocksDb.java:198-230).
  *
  * Batch write semantics are last-writer-wins per (ts, tieBreak) — the
  * reference's per-key serialization collapses to the same outcome for a
  * bounded batch (KVStoreLocal.put:477-513 writes log-first, latest wins on
  * replay).
  */
final case class KVTable(
    changelog: DataFrame,
    keyCols: Seq[String],
    tsCol: String,
    tieBreakCols: Seq[String] = Nil,
    tombstoneCol: Option[String] = None,
    ttlUs: Option[Long] = None,
    nowUs: Long = 0L) {

  /** The materialized latest-per-key view: TTL filter (write-side drop,
    * reference KVStoreLocal.scala:484-485) → compact → drop tombstones. */
  def latest: DataFrame = {
    val live = ttlUs.fold(changelog)(t => Changelog.ttlFilter(changelog, tsCol, t, nowUs))
    val compacted = Changelog.compact(live, keyCols, tsCol, tieBreakCols)
    tombstoneCol.fold(compacted)(tc => Changelog.dropTombstones(compacted, tc))
  }

  /** P1 `apply(key)` — point read. Equality on all key columns; Catalyst
    * pushes this below the aggregate to the scan. */
  def get(key: Seq[Any]): DataFrame = {
    require(key.length == keyCols.length, "key arity mismatch")
    latest.filter(keyCols.zip(key).map { case (c, v) => col(c) === lit(v) }.reduce(_ && _))
  }

  /** R2 prefix + time-range scan: equality on *leading* key columns plus an
    * event-time range — the reference's binary-prefix iterator
    * (KVStoreLocal.scala:272-293) as a pushed-down conjunction. */
  def scan(prefix: Seq[Any], range: TimeRange = TimeRange.Unbounded): DataFrame = {
    require(prefix.length <= keyCols.length, "prefix longer than key")
    val prefixPred = keyCols.zip(prefix).map { case (c, v) => col(c) === lit(v) }
    val preds = prefixPred :+ range.contains(col(tsCol))
    latest.filter(preds.reduce(_ && _))
  }

  /** General predicate scan over the latest view. */
  def where(pred: Column): DataFrame = latest.filter(pred)

  /** P2/P3/P4 upsert batch: append to the changelog; last writer (by ts,
    * tieBreak) wins at the next `latest`. Blind — no read-before-write, like
    * reference `replace` (KVStoreLocal.scala:367-374). */
  def upsert(batch: DataFrame): KVTable = copy(changelog = changelog.unionByName(batch))

  /** P5 delete: append tombstone records (requires a tombstone column). */
  def delete(tombstones: DataFrame): KVTable = {
    require(tombstoneCol.isDefined, "delete requires a tombstone column")
    copy(changelog = changelog.unionByName(tombstones))
  }

  /** P10 `numKeys` — exact and approximate key counts (approx hashes the
    * key tuple; concatenation would alias composite keys). */
  def numKeys: Long = latest.count()
  def approxNumKeys: DataFrame =
    latest.agg(approx_count_distinct(xxhash64(keyCols.map(col): _*)).as("approx_num_keys"))

  /** P11 `getStats` — DESCRIBE-style store diagnostics as ONE row
    * (reference `KVStoreLocal.getStats`:636-639 dumps log + memstore stats
    * as text; here both planes are DataFrames, so the stats are a query).
    * Columns: changelog depth, live-key count, tombstone count, event-time
    * span, and — for a file-backed changelog — file count and total bytes
    * read from filesystem METADATA (a catalog-sized listing, never a data
    * scan). Two partial-agg'd jobs (raw log + compacted view) composed by
    * cross join; nothing is collected. */
  def getStats: DataFrame = {
    val tombRows = tombstoneCol.fold(lit(0L))(tc =>
      coalesce(sum(when(coalesce(col(tc), lit(false)), 1L).otherwise(0L)), lit(0L)))
    val logStats = changelog.agg(
      count(lit(1)).as("n_log_rows"),
      tombRows.as("n_tombstones"),
      min(col(tsCol)).cast("long").as("min_ts_us"),
      max(col(tsCol)).cast("long").as("max_ts_us"))
    val keyStats = latest.agg(count(lit(1)).as("n_keys"))
    val files = changelog.inputFiles
    val bytes =
      if (files.isEmpty) 0L
      else {
        val conf = changelog.sparkSession.sparkContext.hadoopConfiguration
        files.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(conf).getFileStatus(p).getLen
        }.sum
      }
    logStats.crossJoin(keyStats)
      .withColumn("n_files", lit(files.length.toLong))
      .withColumn("total_bytes", lit(bytes))
      .select(col("n_log_rows"), col("n_keys"), col("n_tombstones"),
        col("min_ts_us"), col("max_ts_us"), col("n_files"), col("total_bytes"))
  }

  /** Point-in-time (time-travel) view: the latest-per-key state AS OF
    * `tUs` — the reference's bootstrap-to-checkpoint replay
    * (Log.bootstrap, api/.../Log.java:133-161) as a declarative filter:
    * drop every log row after `tUs`, then the usual compact/tombstone
    * pipeline. TTL is evaluated AT `tUs` (a record live then but expired
    * now is present, matching what a replay to that moment would have
    * served). The ts predicate sits below the aggregate, so parquet
    * row-group pruning on the time column applies — replaying "yesterday's
    * state" scans only yesterday's files on a time-partitioned log. */
  def asOf(tUs: Long): DataFrame = {
    val upTo = changelog.filter(col(tsCol) <= tUs)
    val live = ttlUs.fold(upTo)(t => Changelog.ttlFilter(upTo, tsCol, t, tUs))
    val compacted = Changelog.compact(live, keyCols, tsCol, tieBreakCols)
    tombstoneCol.fold(compacted)(tc => Changelog.dropTombstones(compacted, tc))
  }

  /** R8 keep-last-N CDC view (not compacted — history retained per key). */
  def keepLastN(n: Int): DataFrame =
    Changelog.keepLastN(changelog, keyCols, tsCol, n, tieBreakCols)

  def withTtl(ttl: Long, now: Long): KVTable = copy(ttlUs = Some(ttl), nowUs = now)
}
