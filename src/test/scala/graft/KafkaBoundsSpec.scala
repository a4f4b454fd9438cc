package graft

import graft.streaming.KafkaBounds

/** Drives the bounded-Kafka-read arithmetic (ms-floor start, ms-ceil end,
  * µs residual filter) over a simulated broker — a synthetic per-partition
  * (offset, tsMs) log and an `offsetsForTimes` model — since no broker runs
  * in this container. The invariant under test: offset bounds + residual
  * select EXACTLY the records with ts_us in [startUs, endUs). */
class KafkaBoundsSpec extends SparkSpec {
  import spark.implicits._

  "startMs/endMsCeil" should "floor the start and ceil the end to ms" in {
    KafkaBounds.startMs(1_000_500L) shouldBe 1000L
    KafkaBounds.startMs(1_000_000L) shouldBe 1000L
    KafkaBounds.startMs(999L) shouldBe 0L
    KafkaBounds.endMsCeil(2_000_500L) shouldBe 2001L
    KafkaBounds.endMsCeil(2_000_000L) shouldBe 2000L // exact ms: no extra ms needed
    KafkaBounds.endMsCeil(2_000_001L) shouldBe 2001L
  }

  "offsetForTime" should "return the earliest offset at or after the target ms" in {
    val log = Seq((0L, 10L), (1L, 10L), (2L, 12L), (3L, 15L))
    KafkaBounds.offsetForTime(log, 10L) shouldBe Some(0L)
    KafkaBounds.offsetForTime(log, 11L) shouldBe Some(2L)
    KafkaBounds.offsetForTime(log, 15L) shouldBe Some(3L)
    KafkaBounds.offsetForTime(log, 16L) shouldBe None // past the log: bound = log end
    KafkaBounds.offsetForTime(Nil, 0L) shouldBe None
  }

  // Two partitions; several records share a millisecond (Kafka's index
  // resolution) while the query range is µs. In the real path ts_us =
  // unix_micros(timestamp) = tsMs * 1000 exactly — Kafka timestamps ARE
  // milliseconds, the µs range comes from the caller.
  private val partitionLogs: Map[Int, Seq[(Long, Long)]] = Map(
    0 -> Seq((0L, 999L), (1L, 1000L), (2L, 1000L), (3L, 1500L), (4L, 2000L), (5L, 2001L)),
    1 -> Seq((0L, 1000L), (1L, 1999L), (2L, 2000L), (3L, 3000L)))

  private def slice(startUs: Long, endUs: Long): Seq[(Int, Long, Long)] =
    partitionLogs.toSeq.flatMap { case (p, log) =>
      KafkaBounds
        .boundedSlice(log, KafkaBounds.startMs(startUs), KafkaBounds.endMsCeil(endUs))
        .map { case (offset, tsMs) => (p, offset, tsMs * 1000L) }
    }

  /** Full Spark path: offset slice → DataFrame → residual Column filter. */
  private def boundedRead(startUs: Long, endUs: Long): Seq[(Int, Long, Long)] = {
    val df = slice(startUs, endUs).toDF("partition", "offset", "ts_us")
    KafkaBounds.applyResidual(df, "ts_us", startUs, endUs)
      .as[(Int, Long, Long)].collect().toSeq.sorted
  }

  /** Pure path for the boundary sweep (same arithmetic, no Spark job per
    * probe pair — the Column form of the residual is covered above). */
  private def boundedReadPure(startUs: Long, endUs: Long): Seq[(Int, Long, Long)] =
    slice(startUs, endUs)
      .filter { case (_, _, us) => us >= startUs && us < endUs }.sorted

  private def oracle(startUs: Long, endUs: Long): Seq[(Int, Long, Long)] =
    partitionLogs.toSeq.flatMap { case (p, log) =>
      log.map { case (o, tsMs) => (p, o, tsMs * 1000L) }
        .filter { case (_, _, us) => us >= startUs && us < endUs }
    }.sorted

  "bounded read + residual" should "select exactly [startUs, endUs) across boundary-ms records" in {
    // sub-ms bounds on both sides: start mid-ms-1000, end mid-ms-2000
    boundedRead(1_000_500L, 2_000_500L) shouldBe oracle(1_000_500L, 2_000_500L)
    // exact-ms bounds: start inclusive, end exclusive
    boundedRead(1_000_000L, 2_000_000L) shouldBe oracle(1_000_000L, 2_000_000L)
    // range entirely inside one ms (ts_us are all *000 here, so empty)
    boundedRead(1_000_100L, 1_000_900L) shouldBe oracle(1_000_100L, 1_000_900L)
    boundedRead(1_000_100L, 1_000_900L) shouldBe empty
    // range past the whole log
    boundedRead(9_000_000L, 10_000_000L) shouldBe empty
    // range before the whole log start
    boundedRead(0L, 999_000L) shouldBe oracle(0L, 999_000L)
  }

  it should "never let the ms bounds exclude an in-range record (sweep)" in {
    // sweep µs bounds across every boundary neighbourhood of the logs
    val probes = for {
      ms <- Seq(999L, 1000L, 1500L, 1999L, 2000L, 2001L, 3000L)
      dUs <- Seq(-1L, 0L, 1L)
    } yield ms * 1000L + dUs
    for (s <- probes; e <- probes if s < e)
      boundedReadPure(s, e) shouldBe oracle(s, e)
  }
}
