package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the keyed event log: funnel conversion and
  * cohort retention. Both generalize the reference's per-key time-range
  * scans (SURVEY §2.3 R2, ExampleBank branch/time queries J3/J4) from
  * "fetch a key's events" to corpus-wide ordered-sequence aggregation.
  *
  * Scale shape: every join/aggregate here keys on the entity column, so the
  * whole pipeline is a chain of co-partitioned hash aggregations — AQE
  * reuses the exchange across stages; nothing ever materializes per-event
  * state wider than (entity, one timestamp).
  */
object Analytics {

  /** Column profile — the first query anyone runs on a new 100 TB table:
    * per column, row/null/distinct counts, lexicographic min/max of the
    * stringified values, and the most frequent value (plurality; ties by
    * smallest value, so the result is deterministic).
    *
    * Scale shape: ONE scan of the table — the per-column tall frame comes
    * from a row-local `explode(array(struct...))`, not one scan per column
    * — into ONE partial-agg'd shuffle keyed (column, value). Every other
    * stat derives from that value-count frame (row count = Σn, distincts =
    * its non-null row count, nulls = the null group's n, bounds = min/max
    * over its keys, top value = its top-1 rank → WindowGroupLimit), so the
    * frame both consumers re-read is PROFILE-sized (distinct values), not
    * corpus-sized — checkpointed once per the repo's re-read rule. All
    * values compare as strings (cast documented in the output contract);
    * profile doubles via quantized longs if exact numeric order matters.
    * Guarded by PlanShapeSpec: the final plan contains no second scan. */
  def profile(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val t = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("e"))
      .select(col("e.c").as("col_name"), col("e.v").as("v"))
      .groupBy("col_name", "v")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val base = t.groupBy("col_name").agg(
      sum(col("n")).as("n_rows"),
      coalesce(sum(when(col("v").isNull, col("n"))), lit(0L)).as("n_null"),
      count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
      min(col("v")).as("v_min"),
      max(col("v")).as("v_max"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name")).orderBy(col("n").desc, col("v"))
    val top = t.filter(col("v").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("col_name"), col("v").as("top_value"), col("n").as("top_n"))
    base.join(top, Seq("col_name"), "left")
  }

  /** Ordered funnel: for each entity, how deep into `stages` (event types
    * that must occur in strictly increasing event-time order) it progressed.
    * Returns `(stage, n_entities)` — entities whose FURTHEST ordered stage
    * is `stage` (1-based; entities with no stage-1 event are absent).
    *
    * Stage k's frontier is min event time of `stages(k)` strictly after the
    * stage-k-1 frontier — computed as one filtered aggregation per stage
    * joined on the entity key, all co-partitioned. */
  /** Per-key clamp-at-zero running fold in CLOSED FORM — the batch oracle
    * for the reference's `getAndUpdate` read-modify-write loop (P6;
    * KVStore.java getAndUpdate, the ExampleBank balance semantics where a
    * withdrawal can never take a balance below zero).
    *
    * The fold `b_i = max(0, b_{i−1} + δ_i)` looks sequential, but has the
    * prefix-sum identity `b_n = S_n − min(0, min_{k≤n} S_k)` — so the
    * WHOLE per-key history folds with ONE ordered window (running sum) +
    * ONE aggregate, no `mapGroupsWithState`, no per-key iteration, fully
    * shuffle-parallel by key. `n_clamped` counts the updates where the
    * clamp actually fired (the running min strictly decreased below zero —
    * each new strict minimum is exactly one clamped update).
    *
    * Returns one row per key: (keyCols*, final_balance, n_updates,
    * n_clamped). Deterministic when (keyCols, orderCols) is unique. */
  /** Holt double-exponential smoothing (level + trend) over an ORDERED
    * register frame — time-series forecasting in exact integers, the
    * recursive-smoother tier next to the closed-form folds (q80/q101).
    * Smoothing constants α = β = 1/4 carried as rationals:
    * `l_t = ⌊(x_t + 3(l_{t−1}+b_{t−1}))/4⌋`,
    * `b_t = ⌊((l_t − l_{t−1}) + 3·b_{t−1})/4⌋`, seeded l₁ = x₁, b₁ = 0;
    * the one-step-ahead forecast is `f_t = l_{t−1} + b_{t−1}` (f₁ = x₁,
    * so err₁ = 0). Every division is Scala Long `/` (truncation toward
    * zero) ≡ DuckDB `//` at any sign (probed: −7 // 2 = −3 — DuckDB `//`
    * TRUNCATES on negatives, same as Spark's IntegralDivide; the trend
    * numerator goes negative on down-turns, so the convention matters),
    * so the oracle runs the IDENTICAL recursion as a RECURSIVE CTE.
    *
    * The input must be a CALENDAR-bounded register frame (months, days —
    * never the corpus): the fold is a bounded driver collect under the
    * sketch-register rule, exactly like the BPE merge tables and greedy
    * rounds; a 100 TB history still aggregates to the same few hundred
    * calendar rows before this runs. Output columns:
    * (orderCol, valueCol, level, trend, forecast, err). */
  def holtLinearForecast(
      registers: DataFrame,
      orderCol: String,
      valueCol: String,
      maxRegisters: Int = 100000): DataFrame = {
    val s = registers.sparkSession
    // bound the collect BEFORE it happens: limit(max+1) caps driver memory
    // even when a caller hands over a corpus-sized frame by mistake — the
    // require below then fails with the message instead of an OOM
    val rows = registers
      .select(col(orderCol).cast("long"), col(valueCol).cast("long"))
      .limit(maxRegisters + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    require(rows.nonEmpty, "holtLinearForecast needs a non-empty register frame")
    require(rows.length <= maxRegisters,
      s"register frame exceeds $maxRegisters rows — " +
        "pre-aggregate to a calendar-bounded frame before smoothing")
    // the recursion is order-sensitive and ties on orderCol would make the
    // fold partition-order-dependent (and oracle-divergent): refuse them
    require(rows.iterator.map(_._1).toSet.size == rows.length,
      s"holtLinearForecast needs unique '$orderCol' values — " +
        "aggregate duplicates before smoothing")
    val out = Vector.newBuilder[(Long, Long, Long, Long, Long, Long)]
    var l = rows.head._2
    var b = 0L
    out += ((rows.head._1, rows.head._2, l, b, rows.head._2, 0L))
    rows.tail.foreach { case (t, x) =>
      val f = l + b
      val l2 = (x + 3L * (l + b)) / 4L
      val b2 = ((l2 - l) + 3L * b) / 4L
      l = l2; b = b2
      out += ((t, x, l, b, f, x - f))
    }
    import s.implicits._
    out.result().toDF(orderCol, valueCol, "level", "trend", "forecast", "err")
  }

  def clampedRunningFold(
      df: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String],
      deltaCol: String,
      orderCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = df
      .withColumn("__s", sum(col(deltaCol)).over(w))
      // a clamp fires exactly when the running sum sets a NEW strict
      // minimum below zero (prefix-min before this row, null-safe at head)
      .withColumn("__clamped",
        (col("__s") < 0L && (col("__s") < coalesce(min(col("__s")).over(wPrev), lit(0L))))
          .cast("long"))
    // order-free final aggregates: S_n = Σδ, min prefix = min(__s) — no
    // `last()` (grouped `last` is row-order nondeterministic in Spark)
    run.groupBy(keyCols.map(col): _*)
      .agg(
        (sum(col(deltaCol)) - least(lit(0L), min(col("__s")))).as("final_balance"),
        count(lit(1)).as("n_updates"),
        sum(col("__clamped")).as("n_clamped"))
  }

  def funnel(
      events: DataFrame,
      entityCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = events.select(col(entityCol), col(typeCol), col(tsCol))
    // frontier(k): (entity, t_k) — min ts of stage k after the prior frontier
    val first = e.filter(col(typeCol) === stages.head)
      .groupBy(entityCol).agg(min(tsCol).as("t1"))
    val frontiers = stages.zipWithIndex.tail.scanLeft(first) {
      case (prev, (stage, i)) =>
        e.filter(col(typeCol) === stage)
          .join(prev.select(col(entityCol), col(s"t$i")), entityCol)
          .filter(col(tsCol) > col(s"t$i"))
          .groupBy(entityCol).agg(min(tsCol).as(s"t${i + 1}"))
    }
    val joined = frontiers.tail.foldLeft(first) { (acc, f) =>
      acc.join(f, Seq(entityCol), "left")
    }
    val stageExpr = (stages.indices.reverse.init.map { i =>
      when(col(s"t${i + 1}").isNotNull, lit(i + 1))
    } :+ lit(1)).reduce((a, b) => coalesce(a, b))
    joined.select(stageExpr.cast("int").as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_entities"))
  }

  /** Rolling `periods`-unit distinct actives: for every observed period end
    * P, the count of distinct entities active in [P-(periods-1), P] — the
    * rolling-DAU/WAU family, exact (no sketch).
    *
    * Shape at scale: dedup to (period, entity) first (bounded by entities ×
    * periods, not events), explode each pair to the `periods` window ends
    * it feeds (a constant fan-out), keep only observed period ends, then
    * one distinct aggregation. No window function, no per-entity state —
    * the fan-out join is the sketch-free way to make "distinct over a
    * sliding window" associative. */
  def rollingActive(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      periods: Int,
      truncUnit: String = "day"): DataFrame = {
    require(periods > 0, "periods must be positive")
    val unitUs: Long = truncUnit match {
      case "week" => 7L * 24 * 3600 * 1000000L
      case "day" => 24L * 3600 * 1000000L
      case "hour" => 3600L * 1000000L
      case u => throw new IllegalArgumentException(s"unsupported unit: $u")
    }
    val e = events.select(
      unix_micros(date_trunc(truncUnit, timestamp_micros(col(tsCol)))).as("period_us"),
      col(entityCol)).distinct()
    val observed = e.select(col("period_us").as("end_us")).distinct()
    val contrib = e.select(
      explode(sequence(col("period_us"),
        col("period_us") + lit((periods - 1) * unitUs), lit(unitUs))).as("end_us"),
      col(entityCol))
    contrib.join(observed, "end_us")
      .groupBy("end_us")
      .agg(countDistinct(col(entityCol)).as("n_active"))
  }

  /** Per-group z-score outliers with EXACT integer algebra: keep rows where
    * (x−μ)² > k²σ², rewritten multiply-through so no float mean/variance
    * ever exists: `(n·x − Σx)² > k²·(n·Σx² − (Σx)²)`. `valueCol` must be an
    * integer column (quantize doubles first, e.g. to cents); all products
    * run in decimal(38,0) (HUGEINT in the oracle) — bit-exact on any
    * engine, any partitioning. Headroom: needs n·max(x)² < 10³⁸, i.e.
    * ~10²⁷ rows/group at x ≤ 10⁵ — unbounded in practice.
    *
    * Scale shape: one partial+final aggregation for the per-group moments,
    * broadcast back into a row-local filter — the data column streams once. */
  /** Winsorized (sketch-clamped) robust aggregation: per group, clamp the
    * value column at the sketch's `loPpm`/`hiPpm` quantile bounds and
    * report raw vs clamped sums plus clamp counts — the standard
    * outlier-robust statistic for corpus metrics (one pathological
    * document's 10⁹-token length no longer owns the mean). Bounds come
    * from the MERGEABLE log-histogram ([[Sketches.logHistSketch]]), so at
    * scale they can be yesterday's registers — no extra pass; the bounds
    * frame is one row per group and broadcasts into a row-local clamp.
    * All-integer arithmetic end to end (values are pre-quantized longs per
    * the repo convention), deterministic, oracle-able. */
  def winsorizedStats(
      df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      loPpm: Long = 10000L,
      hiPpm: Long = 990000L,
      s: Int = 3): org.apache.spark.sql.DataFrame = {
    require(loPpm < hiPpm, "loPpm must be below hiPpm")
    val g = groupCols.map(org.apache.spark.sql.functions.col)
    val sketch = Sketches.logHistSketch(df, groupCols, valueCol, s)
    val bounds = Sketches.logHistQuantiles(sketch, groupCols, Seq(loPpm, hiPpm), s)
      .groupBy(g: _*)
      .agg(
        min(when(col("q_ppm") === loPpm, col("q_est"))).as("lo"),
        min(when(col("q_ppm") === hiPpm, col("q_est"))).as("hi"))
    val v = col(valueCol)
    df.join(broadcast(bounds), groupCols)
      .select(g :+ v.as("v") :+ col("lo") :+ col("hi"): _*)
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("sum_raw"),
        sum(greatest(col("lo"), least(col("v"), col("hi")))).as("sum_winsorized"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_clamped_low"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_clamped_high"))
  }

  def zscoreOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val x = col(valueCol)
    // square AFTER the decimal cast: dec(x*x) would square in long space
    // first and overflow at max(x) >= 2^31.5 under ANSI
    val stats0 = df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("zs_n"),
        sum(dec(x)).as("zs_s"),
        sum(dec(x) * dec(x)).as("zs_s2"))
    // null-safe join keys: a NULL group is still a group with outliers
    val stats = groupCols.foldLeft(stats0)((s, c) => s.withColumnRenamed(c, s"zs_$c"))
    val cond = groupCols.map(c => col(c) <=> col(s"zs_$c")).reduce(_ && _)
    val dev = dec(col("zs_n")) * dec(x) - col("zs_s")
    val varN2 = dec(col("zs_n")) * col("zs_s2") - col("zs_s") * col("zs_s")
    df.join(broadcast(stats), cond)
      .filter(dev * dev > lit(k * k) * varN2)
      .drop((Seq("zs_n", "zs_s", "zs_s2") ++ groupCols.map(c => s"zs_$c")): _*)
  }

  /** Cohort retention: entities are cohorted by the `truncUnit` (e.g.
    * "week") of their first event; for every (cohort, period offset) count
    * the distinct entities active in that period. Timestamps are epoch-µs
    * longs; offsets are exact integer periods (UTC truncation boundaries
    * make the difference an exact multiple of the unit). */
  /** Gap-fill resampling with last-observation-carried-forward: one row per
    * (key, slot) for EVERY `stepUs`-wide slot between each key's first and
    * last event — missing slots get the most recent prior value (LOCF), the
    * standard time-series densification before joins/aggregations that
    * assume a regular grid.
    *
    * Within a slot the surviving value is the latest by (`tsUsCol`,
    * `tieBreakCols`) — the compaction tie-break rule, so re-runs are
    * bit-identical. Scale shape: one aggregation per (key, slot), a
    * per-key min/max aggregate for the grid, one explode (bounded by the
    * key's time span ÷ step), and a window partitioned on the SAME key the
    * aggregations shuffled on — the exchange is reused; fill cost is
    * O(slots), never O(slots × events). */
  def resampleLocf(
      events: DataFrame,
      keyCols: Seq[String],
      tsUsCol: String,
      valCol: String,
      stepUs: Long,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    val keys = keyCols.map(col)
    val slotted = events.withColumn("slot", expr(s"`$tsUsCol` div ${stepUs}L"))
    // latest value per occupied (key, slot): max_by over the ordering tuple
    val ordering = struct((col(tsUsCol) +: tieBreakCols.map(col)): _*)
    val daily = slotted
      .groupBy(keys :+ col("slot"): _*)
      .agg(max_by(col(valCol), ordering).as("v_obs"))
    val grid = slotted
      .groupBy(keys: _*)
      .agg(min(col("slot")).as("s0"), max(col("slot")).as("s1"))
      .select(keys :+ explode(sequence(col("s0"), col("s1"))).as("slot"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col("slot"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(daily, keyCols :+ "slot", "left")
      .select(keys ++ Seq(
        col("slot"),
        last(col("v_obs"), ignoreNulls = true).over(w).as(valCol),
        col("v_obs").isNotNull.as("observed")): _*)
  }

  def cohortRetention(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      truncUnit: String = "week"): DataFrame = {
    val unitUs: Long = truncUnit match {
      case "week" => 7L * 24 * 3600 * 1000000L
      case "day" => 24L * 3600 * 1000000L
      case "hour" => 3600L * 1000000L
      case u => throw new IllegalArgumentException(s"unsupported cohort unit: $u")
    }
    def truncUs(c: org.apache.spark.sql.Column) =
      unix_micros(date_trunc(truncUnit, timestamp_micros(c)))
    val firsts = events.groupBy(entityCol).agg(min(col(tsCol)).as("first_us"))
    events.select(col(entityCol), col(tsCol))
      .join(firsts, entityCol)
      .select(
        col(entityCol),
        truncUs(col("first_us")).as("cohort_us"),
        // exact: both are UTC unit boundaries → the difference is an exact
        // multiple of unitUs and < 2^53, so the double quotient is integral
        ((truncUs(col(tsCol)) - truncUs(col("first_us"))) / unitUs).cast("long")
          .as("period_offset"))
      .groupBy("cohort_us", "period_offset")
      .agg(countDistinct(col(entityCol)).as("n_active"))
  }

  /** Additive aggregate STATE of a keyed frame: per key, (n_events,
    * sum_cents, last_ts_us). This is the per-partition/per-epoch register
    * an incrementally-maintained materialized view stores — every field is
    * mergeable (counts and sums add, maxes max), so yesterday's state plus
    * today's delta state recombine without touching yesterday's rows.
    * (Reference: the compacted-state + CDC-tail model of
    * api/.../storage/Log.java bootstrap/tail, lifted from latest-per-key
    * to additive aggregates.) */
  def additiveAggState(
      df: DataFrame,
      keyCols: Seq[String],
      centsCol: String,
      tsUsCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(centsCol)).as("sum_cents"),
        max(col(tsUsCol)).as("last_ts_us"))

  /** Merge additive aggregate states ([[additiveAggState]] outputs) — the
    * incremental-view-maintenance step: `merge(state(base), state(delta))
    * ≡ state(base ∪ delta)`, proven by the oracle recomputing from the
    * full log. Scale shape: the merge aggregates STATE-sized frames (one
    * row per key each), never the underlying corpus — the 100 TB history
    * is only ever scanned once, on the day it arrives. */
  def mergeAdditiveStates(states: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state to merge")
    states.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_cents")).as("sum_cents"),
        max(col("last_ts_us")).as("last_ts_us"))
  }

  /** Trailing-window anomaly detection — the batch form of the streaming
    * "is this value surprising vs this key's recent history" monitor. A
    * row is anomalous when its value deviates from the mean of the
    * preceding `histRows` values by more than `k` sample-free standard
    * deviations, with at least `minHist` history rows.
    *
    * EXACT integer arithmetic: with n = |hist|, S = Σv, Q = Σv², the test
    * `(x − S/n)² > k²·(Q/n − (S/n)²)` multiplies through by n² to
    * `(n·x − S)² > k²·(n·Q − S²)` — all integer products (squares in
    * decimal(38,0) so ANSI never overflows), no division, no doubles, so
    * the flag is bit-deterministic and oracle-exact. One ordered window
    * per key; at scale this is a single shuffle on the key, state per row
    * is three registers. Returns only the flagged rows. */
  def rollingAnomalies(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      orderCols: Seq[String],
      histRows: Int = 20,
      minHist: Int = 8,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val wHist = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-histRows, -1)
    val x = col(valueCol)
    val withStats = df
      .withColumn("__n", count(x).over(wHist))
      .withColumn("__s", sum(dec(x)).over(wHist))
      .withColumn("__q", sum(dec(x) * dec(x)).over(wHist))
    val dev = dec(col("__n")) * dec(x) - col("__s")
    val varN2 = dec(col("__n")) * col("__q") - col("__s") * col("__s")
    withStats
      .filter(col("__n") >= minHist && dev * dev > lit(k.toLong * k) * varN2)
      .withColumn("n_hist", col("__n"))
      .drop("__n", "__s", "__q")
  }

  /** Gaps-and-islands interval coalescing: merge overlapping/touching
    * `[start, end]` intervals per key into islands, returning one row per
    * island with its span and member count. A new island starts exactly
    * when an interval's start exceeds the running max end of everything
    * before it — one ordered window per key (running max + running flag
    * sum), then a co-partitioned aggregate; the window and the groupBy
    * share the key partitioning so AQE reuses the exchange. Deterministic
    * for any total `orderCols` extension of (start, end). */
  def mergeIntervals(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = (Seq(startCol, endCol) ++ tieBreakCols).map(col)
    val wPrev = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*).rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = df
      .withColumn("__new",
        (col(startCol) > coalesce(max(col(endCol)).over(wPrev), lit(Long.MinValue)))
          .cast("long"))
      .withColumn("island", sum(col("__new")).over(wRun))
    flagged.groupBy((keyCols :+ "island").map(col): _*)
      .agg(
        min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_rows"))
  }

  /** Cumulative distinct count per key over time periods — the scale-safe
    * spelling of `COUNT(DISTINCT x) OVER (ORDER BY t)`, which Spark does
    * not support and which would be O(n²) state anyway. The trick: a
    * value's FIRST occurrence per key (row_number = 1 over (key, value)
    * ordered by time) contributes exactly 1 to the distinct count forever
    * after, so cumulative-distinct = running sum of first-seen flags —
    * one high-cardinality-but-narrow window keyed (key, value), a
    * per-period aggregate, and a running sum over PERIOD-sized rows.
    * Returns (key*, period_us, n_new, n_events, cum_distinct). */
  def cumulativeDistinct(
      df: DataFrame,
      keyCols: Seq[String],
      distinctCol: String,
      tsUsCol: String,
      tieBreakCols: Seq[String] = Nil,
      truncUnit: String = "day"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wFirst = Window.partitionBy((keyCols :+ distinctCol).map(col): _*)
      .orderBy((tsUsCol +: tieBreakCols).map(col): _*)
    val flagged = df
      .withColumn("__first", (row_number().over(wFirst) === 1).cast("long"))
      .withColumn("period_us",
        unix_micros(date_trunc(truncUnit, timestamp_micros(col(tsUsCol)))))
    val daily = flagged
      .groupBy((keyCols :+ "period_us").map(col): _*)
      .agg(sum(col("__first")).as("n_new"), count(lit(1)).as("n_events"))
    val wCum = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("period_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_distinct", sum(col("n_new")).over(wCum))
  }

  /** First-order Markov transition matrix over per-key event sequences:
    * counts of (state → next state) across every key's time-ordered
    * history, with exact floor-ppm transition probabilities. The standard
    * behavioral model behind "what usually follows a click".
    *
    * Scale shape: one `lead` window per key (the only corpus-sized
    * shuffle), then a partial-agg'd count on (from, to) — state-space-
    * sized, tiny. Probabilities divide by the from-state row total via a
    * window over the COUNT frame, never the data. */
  def markovTransitions(
      df: DataFrame,
      keyCols: Seq[String],
      stateCol: String,
      orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wNext = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val wFrom = Window.partitionBy(col("from_state"))
    df
      .withColumn("__next", lead(col(stateCol), 1).over(wNext))
      .filter(col("__next").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("__next").as("to_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_ppm",
        call_function("div", col("n") * 1000000L, sum(col("n")).over(wFrom)))
  }

  /** Distribution drift between two cohorts, as exact integer total
    * variation distance. Per group, both cohorts histogram into shared
    * `binCol` bins; TV = ½·Σ|p₁ − p₂| computed over the common
    * denominator — `(10⁶·Σ|n₁·N₂ − n₂·N₁|) div (2·N₁·N₂)` — so the drift
    * score is floor-ppm exact with no float probabilities. The
    * training-data drift monitor: a spike in tv_ppm for a slice means the
    * new cohort's distribution moved.
    *
    * `cohortCol` must be 1 or 2. Scale shape: one partial-agg'd shuffle
    * on (group, bin), totals via a window over BIN-sized rows, final agg
    * per group. Decimal(38,0) products so a 100 TB cohort can't overflow
    * the cross terms. */
  def distributionDrift(
      df: DataFrame,
      groupCols: Seq[String],
      binCol: String,
      cohortCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val g = groupCols.map(col)
    val binned = df
      .groupBy((groupCols :+ binCol).map(col): _*)
      .agg(
        sum(when(col(cohortCol) === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col(cohortCol) === 2, 1L).otherwise(0L)).as("n2"))
    val wg = Window.partitionBy(g: _*)
    val withTotals = binned
      .withColumn("t1", sum(col("n1")).over(wg))
      .withColumn("t2", sum(col("n2")).over(wg))
    withTotals
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n_bins"),
        min(col("t1")).as("n_cohort1"),
        min(col("t2")).as("n_cohort2"),
        sum(abs(dec(col("n1")) * dec(col("t2")) - dec(col("n2")) * dec(col("t1"))))
          .as("__num"))
      .withColumn("tv_ppm",
        // IntegralDivide (`div`) on decimals ≡ DuckDB `//` — exact floor
        // at any magnitude; decimal `/` would ROUND and break parity
        when(col("n_cohort1") > 0 && col("n_cohort2") > 0,
          call_function("div", dec(lit(1000000L)) * col("__num"),
            dec(lit(2L)) * dec(col("n_cohort1")) * dec(col("n_cohort2"))))
          .otherwise(lit(1000000L)))
      .drop("__num")
  }

  /** Pearson correlation per group with EXACT integer moments: the five
    * sums (n, Σx, Σy, Σx², Σy², Σxy) accumulate in decimal(38,0) —
    * order-free and overflow-free — and only the final
    * `num / √(d₁·d₂)` touches doubles. Both factors are correctly-rounded
    * casts of exact integers, so the result is bit-identical to the
    * oracle's HUGEINT arithmetic (built-in `corr` is a float fold —
    * partial-order nondeterministic, never hash-stable). Returns NULL
    * correlation for degenerate groups (zero variance). */
  def groupedCorrelation(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val x = dec(col(xCol))
    val y = dec(col(yCol))
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
        sum(x * y).as("__sxy"))
      .withColumn("__num", dec(col("n")) * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__d1", dec(col("n")) * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__d2", dec(col("n")) * col("__syy") - col("__sy") * col("__sy"))
      .withColumn("corr",
        when(col("__d1") > 0 && col("__d2") > 0,
          col("__num").cast("double") /
            sqrt(col("__d1").cast("double") * col("__d2").cast("double"))))
      .drop("__sx", "__sy", "__sxx", "__syy", "__sxy", "__num", "__d1", "__d2")
  }

  /** Grouped simple OLS y = intercept + slope·x from the same five exact
    * integer moments as [[groupedCorrelation]] — one partial-agg'd shuffle,
    * hash-stable where a float fold is not.
    *
    * slope = (n·Σxy − Σx·Σy)/(n·Σxx − Σx²): exact decimal numerator and
    * denominator, ONE double division. The intercept's exact-rational form
    * (Σy·d1 − num·Σx)/(n·d1) would overflow decimal(38) at ~1e11 rows, so
    * it is computed as (Σy − slope·Σx)/n on correctly-rounded double casts
    * of the exact moments — a fixed IEEE expression tree, bit-identical
    * across engines (the repo's canonical-double rule). r² = corr², squared
    * in double space rather than as num²/(d1·d2) for the same overflow
    * reason. Constant x (d1 = 0) yields nulls. */
  def groupedOls(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val x = dec(col(xCol))
    val y = dec(col(yCol))
    val corrD = col("__num").cast("double") /
      sqrt(col("__d1").cast("double") * col("__d2").cast("double"))
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
        sum(x * y).as("__sxy"))
      .withColumn("__num", dec(col("n")) * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__d1", dec(col("n")) * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__d2", dec(col("n")) * col("__syy") - col("__sy") * col("__sy"))
      .withColumn("slope",
        when(col("__d1") > 0, col("__num").cast("double") / col("__d1").cast("double")))
      .withColumn("intercept",
        when(col("__d1") > 0,
          (col("__sy").cast("double") - col("slope") * col("__sx").cast("double")) /
            col("n").cast("double")))
      .withColumn("r2", when(col("__d1") > 0 && col("__d2") > 0, corrD * corrD))
      .drop("__sx", "__sy", "__sxx", "__syy", "__sxy", "__num", "__d1", "__d2")
  }

  /** Peak concurrency per group via sweep line: intervals `[start, end)`
    * become +1/−1 delta points; the running sum ordered by (time, delta)
    * is the live-interval count, its max the peak, and the earliest time
    * attaining the peak the answer to "when were we busiest". Half-open
    * semantics: an end at t frees its slot before a start at t claims one
    * (delta −1 sorts first). Deterministic despite tied timestamps — the
    * delta SEQUENCE under (t, delta) ordering is identical for any
    * tie-break, so the prefix-sum multiset, its max, and the attaining t
    * are all order-free.
    *
    * Scale shape: one union projection (2 rows per interval), ONE ordered
    * window per group, a group-sized final aggregate — the classic
    * alternative (self-join counting overlaps) is O(n²) and never forms. */
  def peakConcurrency(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = keyCols.map(col)
    val pts = df.select(g :+ col(startCol).as("t") :+ lit(1L).as("delta"): _*)
      .unionByName(df.select(g :+ col(endCol).as("t") :+ lit(-1L).as("delta"): _*))
    val wRun = Window.partitionBy(g: _*).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    pts
      .withColumn("__run", sum(col("delta")).over(wRun))
      .withColumn("__max", max(col("__run")).over(wAll))
      .groupBy(g: _*)
      .agg(
        min(col("__max")).as("max_concurrent"),
        min(when(col("__run") === col("__max"), col("t"))).as("peak_ts_us"))
  }

  /** k-anonymity audit over quasi-identifier buckets: per bucket, the row
    * count and whether it meets the anonymity threshold (a bucket smaller
    * than `k` re-identifies its members — the groups a release would have
    * to suppress or generalize). One partial-agg'd shuffle on the
    * quasi-identifier key; the flag is row-local on bucket-sized rows. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("is_anonymous", (col("n") >= k).cast("int"))
  }

  /** Pareto frontier (skyline) per group, maximizing integer columns
    * (`xCol`, `yCol`): keep a row iff no other row in its group weakly
    * dominates it (≥ on both, > on at least one). Duplicated (x, y)
    * points are all kept (neither dominates).
    *
    * O(n log n), not O(n²): sort each group by x descending once; a row is
    * dominated iff (a) some row with STRICTLY larger x has y ≥ this y —
    * `max(y) RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING` on the
    * descending integer x ordering is exactly "x > current" — or (b) some
    * row with EQUAL x has strictly larger y (`max(y)` over the x-tie
    * partition). Two windows, one shuffle, no self-join — the all-pairs
    * dominance check never materializes. */
  def paretoFrontier(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wStrict = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wTies = Window.partitionBy((keyCols :+ xCol).map(col): _*)
    df
      .withColumn("__mxy", max(col(yCol)).over(wStrict))
      .withColumn("__mty", max(col(yCol)).over(wTies))
      .filter(
        (col("__mxy").isNull || col("__mxy") < col(yCol)) &&
          col("__mty") === col(yCol))
      .drop("__mxy", "__mty")
  }

  /** M4 time-series downsampling (Jugel et al., VLDB 2014): per (series,
    * time bucket) keep exactly the four values a pixel-perfect line chart
    * needs — min, max, first, last — plus the row count. The canonical
    * "render a billion points" reduction: output is bucket-count-sized
    * regardless of input scale.
    *
    * Scale shape: one shuffle on (series, bucket); first/last come from
    * `first()` over the two ordered windows (ASC and DESC on the total
    * (ts, tie) order — deterministic, unlike grouped `first`), which share
    * the group-by partitioning, so the whole operator is sort-within-
    * partitions work on top of a single exchange.
    *
    * Returns (seriesCols*, bucket, n, min_v, max_v, first_v, last_v) with
    * bucket = tsCol div bucketWidth (integer µs arithmetic). */
  def m4Downsample(
      df: DataFrame,
      seriesCols: Seq[String],
      tsCol: String,
      tieCol: String,
      valueCol: String,
      bucketWidthUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withBucket = df.withColumn("bucket", expr(s"$tsCol div ${bucketWidthUs}L"))
    val part = Window.partitionBy((seriesCols :+ "bucket").map(col): _*)
    val asc = part.orderBy(col(tsCol), col(tieCol))
    val desc = part.orderBy(col(tsCol).desc, col(tieCol).desc)
    withBucket
      .withColumn("__first", first(col(valueCol)).over(asc))
      .withColumn("__last", first(col(valueCol)).over(desc))
      .groupBy((seriesCols :+ "bucket").map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"),
        min(col("__first")).as("first_v"),
        min(col("__last")).as("last_v"))
  }

  /** Exact weighted median per group: the smallest value v such that
    * Σ weight(rows with value ≤ v) ≥ half the group's total weight.
    *
    * Scale shape — bucketed two-phase election over (group, value) weight
    * REGISTERS (cumulative register sum at v ≡ the tie-inclusive RANGE
    * cumulative over raw rows, so the 2·cum ≥ tot integer test is
    * unchanged): the registers roll up once more to (group, bucket =
    * value >> 12) weights, the MEDIAN BUCKET is elected on that tiny frame
    * (cum is monotone, so the first bucket whose end-cumulative passes the
    * half test provably contains the elected value), and only the winning
    * bucket's registers see an ordered window. No stage sorts more than
    * max(buckets per group, values per bucket) rows, even when the value
    * domain is as large as the corpus (measured: a near-unique cents
    * domain made the single-window register form SLOWER than raw at
    * sf0.1) — and a low-cardinality group key caps nothing but the two
    * tiny per-group passes. The ≥-half test stays the integer comparison
    * 2·cum ≥ total (no halving, no doubles).
    *
    * Output is identical to the raw-frame form: `n` counts RAW input rows
    * (carried through the registers as a count column), `total_weight` is
    * the group's Σ weight.
    *
    * PRECONDITION: weights must be non-negative — the cumulative-sum-
    * crosses-half rule needs a monotone running sum; a negative weight
    * silently yields a wrong median (same sign caveat as [[cusum]]). */
  def weightedMedian(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      weightCol: String): DataFrame =
    bucketedRankElection(df, keyCols, valueCol, weightCol,
      Seq(("wmedian", 1L, 2L)))
      .select(keyCols.map(col) ++ Seq(
        col("quantile_value").as("wmedian"), col("n"), col("total_weight")): _*)

  /** Exact weighted quantiles per group — the same bucketed two-phase
    * election at any rational rank: quantile `num/den` is the smallest
    * value v with `den · cumw(v) ≥ num · tot` (tie-inclusive; (1, 2) is
    * exactly the median test). ONE register pass and ONE bucket rollup
    * serve ALL requested quantiles — each rank elects its bucket
    * independently off the exploded literal quantile array, and the
    * in-bucket windows partition by (group, quantile) so p25 and p99 sort
    * concurrently. Same preconditions and scale bounds as
    * [[weightedMedian]]; overflow-safe while
    * `max total weight · max den < 2⁶³`.
    *
    * Returns one row per (group, quantile): `(keys…, quantile,
    * quantile_value)`. */
  def weightedQuantiles(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      weightCol: String,
      quantiles: Seq[(String, Long, Long)]): DataFrame =
    bucketedRankElection(df, keyCols, valueCol, weightCol, quantiles)
      .select(keyCols.map(col) ++ Seq(col("quantile"), col("quantile_value")): _*)

  /** The shared bucketed two-phase election behind [[weightedMedian]] and
    * [[weightedQuantiles]].
    *
    * Phase 0: (group, value) weight registers — the only corpus-sized
    * shuffle, partial-agg'd map-side, checkpointed once for its two
    * readers. Values must be NON-NULL integrals (the bucket is
    * `value >> 12`; arithmetic shift ≡ floor-division for negatives — a
    * null value would elect an unjoinable null bucket and silently drop
    * its group, so nulls are the caller's to filter).
    * Phase A: bucket rollup to the tiny (group, bucket) frame.
    * Phase B: each rank elects the first bucket whose END-cumulative
    * passes `den · cum ≥ num · tot` — cum is monotone, so that bucket
    * provably contains the elected value.
    * Phase C: only the winning buckets' registers see an ordered window.
    * No stage sorts more than max(buckets per group, values per bucket)
    * rows, even on a near-unique value domain (which made a single-window
    * register form SLOWER than raw at sf0.1). The elected-bucket side is
    * |groups|·|ranks| rows — left un-hinted so AQE broadcasts from runtime
    * size (round-6 rule). */
  private def bucketedRankElection(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      weightCol: String,
      quantiles: Seq[(String, Long, Long)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quantiles.nonEmpty &&
      quantiles.forall { case (_, n, d) => n >= 0 && d > 0 && n <= d },
      "quantile ranks must satisfy 0 <= num <= den, den > 0")
    require(quantiles.map(_._1).distinct.size == quantiles.size,
      "quantile names must be distinct (Phase B groups by name)")
    val g = keyCols.map(col)
    val reg = df
      .groupBy((keyCols :+ valueCol).map(col): _*)
      .agg(sum(col(weightCol)).as("__w"), count(lit(1)).as("__c"))
      .withColumn("__b", shiftright(col(valueCol).cast("long"), 12))
      .localCheckpoint(true)
    val bw = reg.groupBy(g :+ col("__b"): _*)
      .agg(sum(col("__w")).as("__bw"), sum(col("__c")).as("__bc"))
    val wOrd = Window.partitionBy(g: _*).orderBy(col("__b"))
    val wAll = Window.partitionBy(g: _*)
    val qArr = array(quantiles.map { case (name, n, d) =>
      struct(lit(name).as("__q"), lit(n).as("__num"), lit(d).as("__den"))
    }: _*)
    val elected = bw
      .withColumn("__cumEnd", sum(col("__bw")).over(wOrd))
      .withColumn("__tot", sum(col("__bw")).over(wAll))
      .withColumn("__n", sum(col("__bc")).over(wAll))
      .withColumn("__qs", explode(qArr))
      .select(g ++ Seq(col("__b"), col("__bw"), col("__cumEnd"), col("__tot"),
        col("__n"), col("__qs.__q").as("__q"), col("__qs.__num").as("__num"),
        col("__qs.__den").as("__den")): _*)
      .filter(col("__cumEnd") * col("__den") >= col("__tot") * col("__num"))
      .groupBy(g :+ col("__q"): _*)
      .agg(
        min(struct(col("__b"), (col("__cumEnd") - col("__bw")).as("__prev"))).as("__e"),
        max(col("__tot")).as("__tot"), max(col("__n")).as("__n"),
        max(col("__num")).as("__num"), max(col("__den")).as("__den"))
      .select(g ++ Seq(col("__q"), col("__e.__b").as("__b"),
        col("__e.__prev").as("__prev"), col("__tot"), col("__n"),
        col("__num"), col("__den")): _*)
    reg.join(elected, keyCols :+ "__b")
      .withColumn("__cum", col("__prev") + sum(col("__w")).over(
        Window.partitionBy(g :+ col("__q"): _*).orderBy(col(valueCol))))
      .groupBy(g :+ col("__q"): _*)
      .agg(
        min(when(col("__cum") * col("__den") >= col("__tot") * col("__num"),
          col(valueCol))).as("quantile_value"),
        max(col("__n")).as("n"),
        max(col("__tot")).as("total_weight"))
      .withColumnRenamed("__q", "quantile")
  }

  /** One-sided CUSUM change detection (Page 1954) against a per-group
    * integer target: C_n = max(0, C_{n−1} + (x_n − target)).
    *
    * The sequential recurrence has the same closed form as
    * [[clampedRunningFold]]: C_n = S_n − min(0, min_{k≤n} S_k) over prefix
    * sums S of the deviations — so the "stateful" monitor is two stacked
    * window passes on ONE (group) shuffle, no sequential fold, no state
    * store. `target` must be integer-exact on both engines: callers pass it
    * pre-joined (e.g. `sum div count`, non-negative operands only — Spark
    * `div` truncates toward zero where DuckDB `//` floors).
    *
    * Returns per group: n, max_cusum (peak cumulative excess), n_alarms
    * (rows where C_n > threshold). */
  def cusum(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      targetCol: String,
      orderCols: Seq[String],
      threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__s", sum(col(valueCol) - col(targetCol)).over(w))
      .withColumn("__c", col("__s") - least(lit(0L), min(col("__s")).over(w)))
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        max(col("__c")).as("max_cusum"),
        sum((col("__c") > threshold).cast("long")).as("n_alarms"))
  }
}
