package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage for co-located joins (SURVEY §4: "pre-partition both
  * sides on the join key so repeated joins never shuffle").
  *
  * The reference co-locates state by routing every key through the same
  * murmur2 partitioner on both the ingest and query paths
  * (api/.../Murmur2Partitioner.java; SURVEY §2.4 J1), so a join between
  * two stores on the same key space is node-local by construction. The
  * Spark-native equivalent is hash bucketing at WRITE time: both tables
  * persist pre-shuffled into the same number of hash buckets, and every
  * subsequent equi-join on the bucket key skips BOTH exchanges — at 100 TB
  * that turns the recurring cost of a fact-fact join from "reshuffle the
  * corpus per query" into a one-time write-side layout decision, exactly
  * the trade the reference makes.
  *
  * Buckets also bound task input (`numBuckets` ≈ corpus / healthy-task-
  * size) and survive across sessions — any job that reads the table gets
  * the exchange-free plan, not just the one that wrote it. BucketingSpec
  * proves the plan shape: same-bucketing join → zero shuffle exchanges;
  * the unbucketed control → two.
  */
object Bucketing {

  /** Deterministic catalog-table suffix for a source-data directory:
    * 64-bit md5 prefix of the FULL path (a 32-bit `String.hashCode` can
    * collide across two dataset dirs in one JVM) salted with the dir's
    * newest modification time, so regenerating the same dir's parquet
    * mid-session yields a fresh table name instead of `tableExists`
    * silently short-circuiting onto stale bucketed data. */
  def tableSuffix(dir: String): String = {
    val f = new java.io.File(dir)
    val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
    val mtime = (f.lastModified() +: kids.map(_.lastModified())).max
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir@$mtime".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** Persist `df` hash-bucketed (and within-bucket sorted) by `keys` as
    * catalog table `table`. Sorting makes downstream sort-merge joins
    * skip their per-task sort as well. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      numBuckets: Int): Unit = {
    require(keys.nonEmpty && numBuckets > 0, "need keys and positive numBuckets")
    val spark = df.sparkSession
    // with the in-memory catalog, a table written by a PREVIOUS JVM leaves
    // its warehouse directory behind while the catalog entry is gone —
    // saveAsTable then fails LOCATION_ALREADY_EXISTS. Clear the stale
    // location (default database only, matching this engine's usage).
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on their bucket keys — planned
    * exchange-free when both sides were written with the same `numBuckets`
    * over `keys`. `forceMerge` adds a sort-merge-join hint: at small SF the
    * planner would broadcast one side (hiding the exchange-free property
    * this layout exists for); at 100 TB both facts exceed any broadcast
    * threshold and SMJ-over-buckets is the plan regardless. */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      forceMerge: Boolean = false): DataFrame = {
    val left = spark.table(leftTable)
    (if (forceMerge) left.hint("merge") else left).join(spark.table(rightTable), keys)
  }
}
