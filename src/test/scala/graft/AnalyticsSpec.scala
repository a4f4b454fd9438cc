package graft

import graft.operators.Analytics
import graft.state.SecondaryIndex
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val DayUs = 24L * 3600 * 1000000L

  "Analytics.clampedRunningFold" should "match the literal sequential fold on random histories" in {
    val rnd = new scala.util.Random(19)
    val rows = for (k <- 0L until 20L; i <- 0L until 30L)
      yield (k, rnd.nextInt(201) - 100L, i)
    val df = rows.toDF("k", "d", "ord")
    val got = Analytics.clampedRunningFold(df, Seq("k"), "d", Seq("ord"))
      .select("k", "final_balance", "n_updates", "n_clamped")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // literal fold: b = max(0, b + d), counting the clamps
    rows.groupBy(_._1).foreach { case (k, h) =>
      var b = 0L; var clamps = 0L
      h.sortBy(_._3).foreach { case (_, d, _) =>
        if (b + d < 0L) { b = 0L; clamps += 1 } else b += d
      }
      got(k) shouldBe ((b, h.size.toLong, clamps))
    }
  }

  "Analytics.profile" should "report nulls, distincts, bounds and deterministic top value" in {
    val df = Seq(
      (Some("b"), 10L), (Some("a"), 10L), (Some("a"), 20L),
      (None, 30L), (Some("b"), 40L))
      .toDF("s", "n")
    val r = Analytics.profile(df, Seq("s", "n"))
      .as[(String, Long, Long, Long, String, String, String, Long)]
      .collect().map(t => t._1 -> t).toMap
    val s = r("s")
    (s._2, s._3, s._4) shouldBe ((5L, 1L, 2L)) // rows, nulls, distincts
    (s._5, s._6) shouldBe (("a", "b"))
    (s._7, s._8) shouldBe (("a", 2L)) // a/b tie on 2 → smallest value wins
    val n = r("n")
    (n._2, n._3, n._4) shouldBe ((5L, 0L, 4L))
    (n._7, n._8) shouldBe (("10", 2L)) // stringified longs
  }

  "Analytics.funnel" should "count entities by furthest strictly-ordered stage" in {
    val events = Seq(
      (1L, "click", 1L), (1L, "view", 2L), (1L, "purchase", 3L), // full funnel
      (2L, "click", 1L), (2L, "view", 2L), (2L, "purchase", 1L), // purchase BEFORE view → stage 2
      (3L, "view", 1L), (3L, "click", 2L),                       // view only before click → stage 1
      (4L, "view", 9L)                                           // never clicked → absent
    ).toDF("user_id", "event_type", "ts_us")
    val out = Analytics.funnel(events, "user_id", "event_type", "ts_us",
      Seq("click", "view", "purchase"))
      .orderBy("stage").as[(Int, Long)].collect()
    out shouldBe Array((1, 1L), (2, 1L), (3, 1L))
  }

  it should "require strictly increasing timestamps across stages" in {
    // same-timestamp stage-2 event does not count (strict >)
    val events = Seq((1L, "click", 5L), (1L, "view", 5L)).toDF("user_id", "event_type", "ts_us")
    Analytics.funnel(events, "user_id", "event_type", "ts_us", Seq("click", "view"))
      .as[(Int, Long)].collect() shouldBe Array((1, 1L))
  }

  "Analytics.cohortRetention" should "cohort by first-event period and count distinct actives" in {
    val events = Seq(
      (1L, 0L * DayUs), (1L, 0L * DayUs + 1), (1L, 2L * DayUs), // cohort day0, active d0+d2
      (2L, 1L * DayUs + 5), (2L, 2L * DayUs)                    // cohort day1, active d1+d2
    ).toDF("user_id", "ts_us")
    val out = Analytics.cohortRetention(events, "user_id", "ts_us", "day")
      .orderBy("cohort_us", "period_offset")
      .as[(Long, Long, Long)].collect()
    out shouldBe Array(
      (0L, 0L, 1L), (0L, 2L, 1L),
      (1L * DayUs, 0L, 1L), (1L * DayUs, 1L, 1L))
  }

  "Analytics.rollingActive" should "count distinct entities over the trailing window" in {
    val events = Seq(
      (1L, 0L * DayUs + 5), (2L, 0L * DayUs + 9), // day 0: users 1,2
      (1L, 1L * DayUs + 1),                       // day 1: user 1
      (3L, 4L * DayUs + 2)                        // day 4: user 3
    ).toDF("user_id", "ts_us")
    val out = Analytics.rollingActive(events, "user_id", "ts_us", periods = 3, truncUnit = "day")
      .orderBy("end_us").as[(Long, Long)].collect()
    // observed days: 0, 1, 4. Trailing-3 windows: d0 → {1,2}; d1 → {1,2};
    // d4 → {3} (days 0-1 fell out of the [2,4] window)
    out shouldBe Array((0L, 2L), (1L * DayUs, 2L), (4L * DayUs, 1L))
  }

  "Analytics.zscoreOutliers" should "flag exactly the rows beyond k sigma, per group" in {
    // group a: nine 10s and one 100 → μ=19, σ=27; |100−19|=81 > 2σ=54, 10s are not
    val rows = (Seq.fill(9)(10L) :+ 100L).zipWithIndex.map { case (v, i) => (i.toLong, "a", v) } ++
      Seq((100L, "b", 5L), (101L, "b", 5L)) // zero variance group: nothing flagged
    val df = rows.toDF("id", "g", "x")
    val out = Analytics.zscoreOutliers(df, Seq("g"), "x", k = 2)
      .select("id").as[Long].collect()
    out shouldBe Array(9L)
  }

  it should "be exact at magnitudes where float variance drifts and long squares overflow" in {
    // values ~4e9: x*x overflows Long (the decimal cast must precede the
    // square), and double (x-mean)^2 sums lose the low bits; the decimal
    // algebra must still separate 3σ exactly
    val base = 4000000000L
    val df = ((1 to 40).map(i => (i.toLong, base + (i % 2))) :+ (99L, base + 1000L))
      .toDF("id", "x").withColumn("g", lit(1))
    Analytics.zscoreOutliers(df, Seq("g"), "x", k = 3)
      .select("id").as[Long].collect() shouldBe Array(99L)
  }

  it should "report outliers inside a NULL group (null-safe stats join)" in {
    val rows = (Seq.fill(9)(10L) :+ 100L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("id", "x")
      .withColumn("g", lit(null).cast("string"))
    Analytics.zscoreOutliers(df, Seq("g"), "x", k = 2)
      .select("id").as[Long].collect() shouldBe Array(9L)
  }

  "Analytics.resampleLocf" should "densify the per-key grid and carry values forward" in {
    // user A: events in slots 0 and 3 (step 10) — slots 1,2 carry slot-0's
    // value; user B: single event → single-slot grid
    val ev = Seq(
      ("a", 5L, 1L, 100L), ("a", 7L, 2L, 110L), // same slot: latest (ts=7) wins
      ("a", 35L, 3L, 300L),
      ("b", 42L, 4L, 400L))
      .toDF("u", "ts", "eid", "v")
    val got = Analytics.resampleLocf(ev, Seq("u"), "ts", "v", stepUs = 10L, tieBreakCols = Seq("eid"))
      .orderBy("u", "slot")
      .select("u", "slot", "v", "observed").as[(String, Long, Long, Boolean)].collect().toSeq
    got shouldBe Seq(
      ("a", 0L, 110L, true),
      ("a", 1L, 110L, false),
      ("a", 2L, 110L, false),
      ("a", 3L, 300L, true),
      ("b", 4L, 400L, true))
  }

  it should "break same-timestamp ties by the tie-break column" in {
    val ev = Seq(("a", 5L, 1L, 100L), ("a", 5L, 9L, 900L)).toDF("u", "ts", "eid", "v")
    Analytics.resampleLocf(ev, Seq("u"), "ts", "v", 10L, Seq("eid"))
      .select("v").as[Long].collect() shouldBe Array(900L)
  }

  "SecondaryIndex.multiLookup" should "intersect postings across all query terms" in {
    val docs = Seq(
      (1L, "spark window table"),
      (2L, "spark only here"),
      (3L, "window pane"),
      (4L, "spark spark window") // duplicate tokens must not double-count
    ).toDF("doc_id", "text")
    val index = SecondaryIndex.build(docs, Seq("doc_id"), tokens(col("text")))
    SecondaryIndex.multiLookup(index, docs, Seq("doc_id"), Seq("spark", "window"))
      .select("doc_id").orderBy("doc_id").as[Long].collect() shouldBe Array(1L, 4L)
    // duplicate query terms dedup — NOT an unsatisfiable count
    SecondaryIndex.multiLookup(index, docs, Seq("doc_id"), Seq("spark", "spark"))
      .select("doc_id").orderBy("doc_id").as[Long].collect() shouldBe Array(1L, 2L, 4L)
  }

  "Analytics.winsorizedStats" should "clamp outliers at sketch bounds, raw sums intact" in {
    // 998 values of 96 (a bucket lower bound at s=3 — quantile estimates
    // are bucket LOWER bounds, so non-representative values would read as
    // "clamped" by the bucket-width error) plus two gross outliers
    val rows = (1 to 998).map(_ => ("g", 96L)) ++ Seq(("g", 0L), ("g", 1000000L))
    val df = rows.toDF("grp", "v")
    val r = Analytics.winsorizedStats(df, Seq("grp"), "v",
      loPpm = 10000L, hiPpm = 990000L, s = 3)
      .as[(String, Long, Long, Long, Long, Long)].head()
    val (_, n, raw, wins, nLo, nHi) = r
    n shouldBe 1000L
    raw shouldBe 998L * 96L + 1000000L // raw sum keeps the outlier
    // the high outlier clamps to the p99 bound (96: >98.9% of the mass),
    // the low one is raised to the p1 bound (also 96)
    nHi shouldBe 1L
    nLo shouldBe 1L
    wins shouldBe 1000L * 96L
    // a clean group of a bucket-representative value is untouched
    val clean = (1 to 100).map(i => ("c", 48L)).toDF("grp", "v")
    val rc = Analytics.winsorizedStats(clean, Seq("grp"), "v")
      .as[(String, Long, Long, Long, Long, Long)].head()
    rc._3 shouldBe rc._4 // sum_raw == sum_winsorized
    rc._5 + rc._6 shouldBe 0L
  }

  "Analytics additive MV maintenance" should "merge split states to the full-recompute state" in {
    val ev = Seq(
      ("a", 10L, 100L), ("a", 20L, 200L), ("a", 30L, 50L),
      ("b", 15L, 7L), ("b", 25L, 9L))
      .toDF("u", "ts", "cents")
    val full = Analytics.additiveAggState(ev, Seq("u"), "cents", "ts")
    val base = Analytics.additiveAggState(ev.filter(col("ts") <= 20L), Seq("u"), "cents", "ts")
    val delta = Analytics.additiveAggState(ev.filter(col("ts") > 20L), Seq("u"), "cents", "ts")
    val merged = Analytics.mergeAdditiveStates(Seq(base, delta), Seq("u"))
    merged.orderBy("u").collect() shouldBe full.orderBy("u").collect()
    merged.orderBy("u").as[(String, Long, Long, Long)].collect() shouldBe Array(
      ("a", 3L, 350L, 30L), ("b", 2L, 16L, 25L))
  }

  it should "merge a key present in only one state" in {
    val ev = Seq(("a", 10L, 5L), ("b", 90L, 7L)).toDF("u", "ts", "cents")
    val merged = Analytics.mergeAdditiveStates(Seq(
      Analytics.additiveAggState(ev.filter(col("ts") <= 50L), Seq("u"), "cents", "ts"),
      Analytics.additiveAggState(ev.filter(col("ts") > 50L), Seq("u"), "cents", "ts")),
      Seq("u"))
    merged.orderBy("u").as[(String, Long, Long, Long)].collect() shouldBe Array(
      ("a", 1L, 5L, 10L), ("b", 1L, 7L, 90L))
  }

  "Analytics.rollingAnomalies" should "flag a spike against its trailing window only" in {
    // key "a": 8 quiet values (var 0), then a spike, then quiet again —
    // only the spike row flags (later rows include the spike in their
    // history, inflating sigma)
    val quiet = (1 to 8).map(i => ("a", i.toLong, i.toLong, 100L))
    val spike = Seq(("a", 9L, 9L, 500L))
    val after = (10 to 12).map(i => ("a", i.toLong, i.toLong, 100L))
    val ev = (quiet ++ spike ++ after).toDF("u", "ts", "eid", "v")
    val got = Analytics.rollingAnomalies(ev, Seq("u"), "v", Seq("ts", "eid"),
      histRows = 20, minHist = 8, k = 3)
      .select("eid", "v", "n_hist").as[(Long, Long, Long)].collect().toSeq
    got shouldBe Seq((9L, 500L, 8L))
  }

  it should "not flag with fewer than minHist history rows" in {
    val ev = (1 to 5).map(i => ("a", i.toLong, i.toLong, 100L)) :+ ("a", 6L, 6L, 9999L)
    Analytics.rollingAnomalies(ev.toDF("u", "ts", "eid", "v"), Seq("u"), "v",
      Seq("ts", "eid"), histRows = 20, minHist = 8, k = 3)
      .count() shouldBe 0L
  }

  it should "use the exact variance test, not a degenerate zero-sigma shortcut" in {
    // history alternates 90/110 (mean 100, var 100, sigma 10): x=131 is
    // 3.1σ (flag), x=129 is 2.9σ (no flag) — the integer test must
    // distinguish them
    val hist = (1 to 8).map(i => ("a", i.toLong, i.toLong, if (i % 2 == 0) 110L else 90L))
    def run(x: Long) = Analytics.rollingAnomalies(
      (hist :+ ("a", 9L, 9L, x)).toDF("u", "ts", "eid", "v"),
      Seq("u"), "v", Seq("ts", "eid"), histRows = 20, minHist = 8, k = 3).count()
    run(131L) shouldBe 1L
    run(129L) shouldBe 0L
  }

  "Analytics.mergeIntervals" should "coalesce overlapping intervals into islands" in {
    val iv = Seq(
      ("a", 0L, 10L, 1L), ("a", 5L, 12L, 2L), ("a", 12L, 20L, 3L), // touching end==start merges
      ("a", 21L, 30L, 4L),                                          // gap of 1 → new island
      ("b", 100L, 110L, 5L))
      .toDF("u", "s", "e", "eid")
    val got = Analytics.mergeIntervals(iv, Seq("u"), "s", "e", Seq("eid"))
      .orderBy("u", "island")
      .select("u", "island", "island_start", "island_end", "n_rows")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      ("a", 1L, 0L, 20L, 3L),
      ("a", 2L, 21L, 30L, 1L),
      ("b", 1L, 100L, 110L, 1L))
  }

  it should "not split an island when a short interval nests inside a long one" in {
    // [0,100] then [10,20] then [30,40]: the running-max (not lag) rule
    // keeps everything in one island even though 30 > 20
    val iv = Seq(("a", 0L, 100L, 1L), ("a", 10L, 20L, 2L), ("a", 30L, 40L, 3L))
      .toDF("u", "s", "e", "eid")
    Analytics.mergeIntervals(iv, Seq("a").map(_ => "u"), "s", "e", Seq("eid"))
      .select("island_start", "island_end", "n_rows")
      .as[(Long, Long, Long)].collect().toSeq shouldBe Seq((0L, 100L, 3L))
  }

  "Analytics.markovTransitions" should "count time-ordered transitions with exact ppm rows" in {
    val ev = Seq(
      ("a", 1L, 1L, "x"), ("a", 2L, 2L, "y"), ("a", 3L, 3L, "x"), ("a", 4L, 4L, "y"),
      ("b", 1L, 5L, "x"), ("b", 2L, 6L, "z"))
      .toDF("u", "ts", "eid", "s")
    val got = Analytics.markovTransitions(ev, Seq("u"), "s", Seq("ts", "eid"))
      .orderBy("from_state", "to_state")
      .as[(String, String, Long, Long)].collect().toSeq
    // from x: x→y twice, x→z once (p = 666666 / 333333 ppm, floor); y→x once
    got shouldBe Seq(
      ("x", "y", 2L, 666666L),
      ("x", "z", 1L, 333333L),
      ("y", "x", 1L, 1000000L))
  }

  it should "not fabricate a transition across keys" in {
    // last event of key a and first of key b must not chain
    val ev = Seq(("a", 1L, 1L, "x"), ("b", 2L, 2L, "y")).toDF("u", "ts", "eid", "s")
    Analytics.markovTransitions(ev, Seq("u"), "s", Seq("ts", "eid")).count() shouldBe 0L
  }

  "Analytics.groupedCorrelation" should "match the closed form on hand data" in {
    // y = 2x exactly → r = 1; anti-correlated pair → r = -1; constant → NULL
    val rows = Seq(
      ("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      ("b", 1L, 3L), ("b", 2L, 2L), ("b", 3L, 1L),
      ("c", 5L, 7L), ("c", 5L, 9L))
      .toDF("g", "x", "y")
    val got = Analytics.groupedCorrelation(rows, Seq("g"), "x", "y")
      .orderBy("g").select("g", "n", "corr")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    got(0) shouldBe ("a", 3L, Some(1.0))
    got(1) shouldBe ("b", 3L, Some(-1.0))
    got(2) shouldBe ("c", 2L, None) // zero x-variance → undefined
  }

  "Analytics.peakConcurrency" should "count live intervals with half-open ends" in {
    val iv = Seq(
      ("g", 0L, 10L), ("g", 5L, 15L), ("g", 8L, 12L), // 3 live at t=8
      ("g", 10L, 20L),  // starts exactly when the first ends → still 3
      ("g", 30L, 40L),
      ("h", 0L, 5L), ("h", 5L, 9L)) // half-open: never concurrent
      .toDF("k", "s", "e")
    val got = Analytics.peakConcurrency(iv, Seq("k"), "s", "e")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    got shouldBe Seq(("g", 3L, 8L), ("h", 1L, 0L))
  }

  "Analytics.distributionDrift" should "compute exact total-variation ppm" in {
    // group g: cohort1 = {bin0 x2, bin1 x2}, cohort2 = {bin0 x1, bin1 x3}
    // → TV = ½(|½−¼| + |½−¾|) = ¼ → 250000 ppm exactly
    val rows = Seq(
      ("g", 0L, 1), ("g", 0L, 1), ("g", 1L, 1), ("g", 1L, 1),
      ("g", 0L, 2), ("g", 1L, 2), ("g", 1L, 2), ("g", 1L, 2),
      // group h: identical distributions → 0 ppm
      ("h", 0L, 1), ("h", 1L, 1), ("h", 0L, 2), ("h", 1L, 2),
      // group i: cohort 2 empty → sentinel 1000000
      ("i", 0L, 1))
      .toDF("grp", "bin", "cohort")
    val got = Analytics.distributionDrift(rows, Seq("grp"), "bin", "cohort")
      .orderBy("grp")
      .select("grp", "n_bins", "n_cohort1", "n_cohort2", "tv_ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      ("g", 2L, 4L, 4L, 250000L),
      ("h", 2L, 2L, 2L, 0L),
      ("i", 1L, 1L, 0L, 1000000L))
  }

  it should "report full drift for disjoint supports" in {
    val rows = Seq(("g", 0L, 1), ("g", 1L, 2)).toDF("grp", "bin", "cohort")
    Analytics.distributionDrift(rows, Seq("grp"), "bin", "cohort")
      .select("tv_ppm").as[Long].head() shouldBe 1000000L
  }

  "Analytics.kAnonymity" should "flag buckets meeting the threshold" in {
    val rows = (1 to 5).map(i => ("en", "srcA")) ++ Seq(("en", "srcB"), ("fr", "srcA"))
    val got = Analytics.kAnonymity(rows.toDF("lang", "source"), Seq("lang", "source"), k = 5L)
      .orderBy("lang", "source")
      .as[(String, String, Long, Int)].collect().toSeq
    got shouldBe Seq(("en", "srcA", 5L, 1), ("en", "srcB", 1L, 0), ("fr", "srcA", 1L, 0))
  }

  "Analytics.cumulativeDistinct" should "equal a brute-force distinct count at every period" in {
    val day = 86400000000L
    val ev = Seq(
      ("a", "x", 0L, 1L), ("a", "x", 10L, 2L),          // day 0: x new
      ("a", "y", day + 5L, 3L), ("a", "x", day + 9L, 4L), // day 1: y new
      ("a", "y", 3 * day, 5L),                           // day 3: nothing new
      ("b", "z", 2 * day, 6L))
      .toDF("u", "t", "ts", "eid")
    val got = Analytics.cumulativeDistinct(ev, Seq("u"), "t", "ts", Seq("eid"))
      .orderBy("u", "period_us")
      .select("u", "period_us", "n_new", "n_events", "cum_distinct")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      ("a", 0L, 1L, 2L, 1L),
      ("a", day, 1L, 2L, 2L),
      ("a", 3 * day, 0L, 1L, 2L),
      ("b", 2 * day, 1L, 1L, 1L))
  }

  "Analytics.weightedMedian" should "match the literal smallest-v-with-half-weight rule" in {
    val rnd = new scala.util.Random(31)
    val rows = for (k <- 0L until 8L; _ <- 0 until 40)
      yield (k, rnd.nextInt(10).toLong, 1L + rnd.nextInt(5).toLong)
    val got = Analytics.weightedMedian(rows.toDF("k", "v", "wq"), Seq("k"), "v", "wq")
      .select("k", "wmedian").as[(Long, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (k, h) =>
      val tot = h.map(_._3).sum
      val expect = h.map(_._2).distinct.sorted
        .find(v => 2 * h.filter(_._2 <= v).map(_._3).sum >= tot).get
      got(k) shouldBe expect
    }
  }

  it should "be unaffected by tied values (RANGE frame includes all ties)" in {
    // all weight sits on one tied value
    val df = Seq(("g", 5L, 1L), ("g", 5L, 1L), ("g", 5L, 1L), ("g", 9L, 1L))
      .toDF("k", "v", "wq")
    Analytics.weightedMedian(df, Seq("k"), "v", "wq")
      .select("wmedian").as[Long].head() shouldBe 5L
  }

  "Analytics.groupedOls" should "recover slope/intercept from exact moments" in {
    // group a: exact line y = 3x + 7 → slope 3, intercept 7, r² = 1
    // group b: constant x → all-null fit
    val df = (Seq((1L, 10L), (2L, 13L), (5L, 22L), (9L, 34L)).map { case (x, y) => ("a", x, y) } ++
      Seq(("b", 4L, 1L), ("b", 4L, 9L))).toDF("g", "x", "y")
    val got = Analytics.groupedOls(df, Seq("g"), "x", "y")
      .orderBy("g")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    got(0) shouldBe (("a", 4L, Some(3.0), Some(7.0), Some(1.0)))
    got(1) shouldBe (("b", 2L, None, None, None))
  }

  "Analytics.m4Downsample" should "keep min/max/first/last per series bucket" in {
    // one series, bucket width 10: bucket 0 = ts 1,3,7; bucket 1 = ts 12
    val df = Seq(
      ("a", 1L, 1L, 50L), ("a", 3L, 2L, 10L), ("a", 7L, 3L, 99L),
      ("a", 12L, 4L, 5L),
      // tie on ts within a bucket: tie col decides first/last
      ("b", 5L, 1L, 7L), ("b", 5L, 2L, 3L))
      .toDF("series", "ts", "tie", "v")
    val got = Analytics.m4Downsample(df, Seq("series"), "ts", "tie", "v", 10L)
      .orderBy("series", "bucket")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      ("a", 0L, 3L, 10L, 99L, 50L, 99L),
      ("a", 1L, 1L, 5L, 5L, 5L, 5L),
      ("b", 0L, 2L, 3L, 7L, 7L, 3L))
  }

  "Analytics.cusum" should "match the literal sequential max(0, C+x-t) monitor" in {
    val rnd = new scala.util.Random(7)
    val rows = for (k <- 0L until 10L; i <- 0L until 50L)
      yield (k, rnd.nextInt(101).toLong, i)
    val df = rows.toDF("k", "x", "ord").withColumn("target", lit(50L))
    val got = Analytics.cusum(df, Seq("k"), "x", "target", Seq("ord"), threshold = 30L)
      .select("k", "n", "max_cusum", "n_alarms")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    rows.groupBy(_._1).foreach { case (k, h) =>
      var c = 0L; var mx = 0L; var alarms = 0L
      h.sortBy(_._3).foreach { case (_, x, _) =>
        c = math.max(0L, c + x - 50L)
        mx = math.max(mx, c)
        if (c > 30L) alarms += 1
      }
      got(k) shouldBe ((h.size.toLong, mx, alarms))
    }
  }

  "Analytics.paretoFrontier" should "keep exactly the non-dominated rows" in {
    val pts = Seq(
      ("g", 1L, 5L, 9L),  // frontier (max y)
      ("g", 2L, 7L, 7L),  // frontier
      ("g", 3L, 7L, 5L),  // dominated by eid=2 (same x, lower y)
      ("g", 4L, 9L, 3L),  // frontier (max x)
      ("g", 5L, 6L, 6L),  // dominated by eid=2
      ("g", 6L, 9L, 3L))  // duplicate of eid=4 — both kept
      .toDF("grp", "eid", "x", "y")
    Analytics.paretoFrontier(pts, Seq("grp"), "x", "y")
      .select("eid").orderBy("eid").as[Long].collect().toSeq shouldBe Seq(1L, 2L, 4L, 6L)
  }

  it should "match the brute-force dominance definition on random points" in {
    val rnd = new scala.util.Random(42)
    val pts = (1 to 200).map(i =>
      ("g", i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val df = pts.toDF("grp", "eid", "x", "y")
    val fast = Analytics.paretoFrontier(df, Seq("grp"), "x", "y")
      .select("eid").as[Long].collect().toSet
    val brute = pts.filter { case (_, _, x, y) =>
      !pts.exists { case (_, _, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._2).toSet
    fast shouldBe brute
  }
}
