package graft

import graft.core.{Changelog, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-log inspection + compaction preview — the one reference CLI
  * capability expressible without a Kafka broker (reference:
  * cli/src/main/scala/TimeLogTool.scala — "Utility for analyzing log
  * compaction": segments a topic partition into fuzz-separated time
  * blocks, reports record counts / time-offset extents, and renders an
  * ASCII plot).
  *
  * Spark-first re-expression over a file-backed changelog:
  *  - block detection is ONE ordered window (lag + running sum of
  *    block-start flags) instead of a sequential consumer loop — same
  *    output, distributed; at real scale you bound the time range first
  *    (the predicate pushes to the parquet scan) exactly like the
  *    reference bounds (from, until) before iterating;
  *  - the compaction stats the reference estimates from block overlap come
  *    EXACTLY from `Changelog.compact` (live keys vs log rows);
  *  - the time-density ASCII chart replaces the time×offset block render
  *    (parquet has no meaningful offset axis).
  *
  * Usage (runMain graft.LogTool):
  *   <sfDir> <table> <keyColsCsv> [fuzzMinutes=5] [fromUs] [untilUs]
  * e.g. `runMain graft.LogTool /root/testdata/sf0.001 events user_id 5`
  */
object LogTool {

  /** Pure report builder (unit-testable): summary lines + block table +
    * density chart for a changelog with epoch-µs `tsCol`. */
  def report(
      log: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      fuzzMinutes: Long,
      chartWidth: Int = 60,
      chartHeight: Int = 12): Seq[String] = {
    val fuzzUs = fuzzMinutes * 60L * 1000000L
    val summary = log.agg(
      count(lit(1)).as("n"),
      min(col(tsCol)).as("mn"),
      max(col(tsCol)).as("mx")).collect()(0)
    val n = summary.getLong(0)
    if (n == 0) return Seq("number of records: 0")
    val (mn, mx) = (summary.getLong(1), summary.getLong(2))
    val nKeys = Changelog.compact(log, keyCols, tsCol).count()

    // fuzz-separated blocks: one ordered window, the distributed form of
    // the reference's maybeAddBlock loop (TimeLogTool.scala:91-95)
    val w = Window.orderBy(col("ts"))
    val blockFrame = log.select(col(tsCol).as("ts"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("nb", (col("prev").isNull || col("ts") - col("prev") > fuzzUs)
        .cast("long"))
      .withColumn("blk", sum(col("nb")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("blk")
      .agg(min(col("ts")).as("start_us"), max(col("ts")).as("end_us"),
        count(lit(1)).as("n_records"))
    // bounded driver footprint: total via count, detail rows via limit —
    // a pathological log (every record its own block) must not OOM the tool
    val nBlocks = blockFrame.count()
    val blocks = blockFrame.orderBy("blk").limit(50).collect()

    // time-density chart: records per time bucket, bar-rendered
    val span = math.max(1L, mx - mn)
    val hist = log
      .select(least(lit(chartWidth - 1),
        (col(tsCol) - mn) * chartWidth / span).cast("int").as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxC = math.max(1L, hist.values.max)
    val rows = (chartHeight to 1 by -1).map { level =>
      val thresh = maxC.toDouble * level / chartHeight
      (0 until chartWidth).map { b =>
        if (hist.getOrElse(b, 0L) >= thresh) '#' else ' '
      }.mkString
    }

    def pretty(us: Long): String =
      java.time.Instant.ofEpochMilli(us / 1000).toString.replace("Z", "").replace("T", " ")

    Seq(
      s"number of records: $n",
      s"minimum timestamp: ${pretty(mn)}",
      s"maximum timestamp: ${pretty(mx)}",
      s"live keys after compaction: $nKeys",
      s"compaction would drop: ${n - nKeys} records (${(n - nKeys) * 100 / n}%)",
      s"blocks (fuzz = $fuzzMinutes min): $nBlocks") ++
      blocks.map { r =>
        f"  block ${r.getLong(0)}%3d: ${pretty(r.getLong(1))} .. ${pretty(r.getLong(2))}  ${r.getLong(3)}%8d records"
      } ++
      (if (nBlocks > 50) Seq(s"  ... ${nBlocks - 50} more blocks") else Nil) ++
      Seq(s"record density over time (${pretty(mn)} .. ${pretty(mx)}):") ++
      rows.map("  |" + _)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: LogTool <sfDir> <table> <keyColsCsv> [fuzzMinutes=5] [fromUs] [untilUs]")
      sys.exit(2)
    }
    val Array(sfDir, table, keyCsv) = args.take(3)
    val fuzz = if (args.length > 3) args(3).toLong else 5L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val (df0, tsCol) = table match {
      case "events" => (Tables.events(spark, sfDir), "ts_us")
      case t =>
        val raw = spark.read.parquet(s"$sfDir/$t.parquet")
        val ts = raw.columns.find(_.endsWith("date")).getOrElse(
          sys.error(s"no epoch/date column found in $t — pass events or a *date table"))
        (raw.withColumn("__ts_us", Tables.epochUs(col(ts))), "__ts_us")
    }
    val df1 = if (args.length > 4) df0.filter(col(tsCol) >= args(4).toLong) else df0
    val df = if (args.length > 5) df1.filter(col(tsCol) < args(5).toLong) else df1
    report(df, keyCsv.split(',').toSeq, tsCol, fuzz).foreach(println)
    spark.stop()
  }
}
