package graft.queries

import graft.core.{Changelog, Tables, TimeRange}
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import graft.multimodal.Multimodal
import graft.operators._
import graft.state.{GlobalTable, KVTable, SecondaryIndex}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Support._

/** Business analytics, control charts, migrations (q120+). Registry split from the former monolithic
  * SparkEntry maps; aggregated by [[graft.SparkEntry]]. Each query entry
  * has its DuckDB oracle adjacent in [[CoreQueries3.oracles]]. */
private[graft] object CoreQueries3 {

  /** (o_orderpriority, delay_days) — the ship-delay frame shared by q134's
    * latency profile and q179's quantile profile (single-source rule: the
    * two profiles must agree on the delay definition). */
  /** One-row (chi2_ppm, nn, n_dow, n_types) register of the day-of-week ×
    * event-type contingency — q144's staged-floor χ² (each cell term
    * floored to ppm; the documented q144/q169 convention) single-sourced
    * so q190's effect size can never drift from q144's statistic. */
  private def chi2DowType(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(expr(s"((ts_us div $DayUs) + 4) % 7").as("dow"), col("event_type"))
    val obs = ev.groupBy("dow", "event_type").agg(count(lit(1)).as("o"))
    val rowm = obs.groupBy("dow").agg(sum(col("o")).as("r"))
    val colm = obs.groupBy("event_type").agg(sum(col("o")).as("c"))
    val tot = obs.agg(sum(col("o")).as("nn"))
    val cells = obs.join(rowm, "dow").join(broadcast(colm), "event_type")
      .crossJoin(broadcast(tot))
      .select(expr("((o*nn - r*c) * (o*nn - r*c)) div ((nn*r*c) div 1000000)")
        .as("term_ppm"))
    val dims = rowm.agg(count(lit(1)).as("n_dow"))
      .crossJoin(colm.agg(count(lit(1)).as("n_types")))
    cells.agg(sum(col("term_ppm")).as("chi2_ppm"))
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(dims))
  }

  private def shipDelayDays(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), Tables.epochUs(col("l_shipdate")).as("sd_us"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"),
        Tables.epochUs(col("o_orderdate")).as("od_us")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        expr(s"(sd_us - od_us) div $DayUs").as("delay_days"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // purchase cadence: median days between a customer's consecutive
    // orders, per segment — one lag window on the customer key feeding the
    // exact weighted-median machinery (unit weights)
    "q127_purchase_cadence" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_custkey"), col("o_orderkey"),
          Tables.epochUs(col("o_orderdate")).as("od_us"))
      val w = Window.partitionBy("o_custkey").orderBy(col("od_us"), col("o_orderkey"))
      val gaps = o.withColumn("prev", lag(col("od_us"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("c_mktsegment"),
          expr(s"(od_us - prev) div $DayUs").as("gap_days"))
        .withColumn("one", lit(1L))
      Analytics.weightedMedian(gaps, Seq("c_mktsegment"), "gap_days", "one")
        .select(col("c_mktsegment"), col("n"), col("wmedian").as("median_gap_days"))
        .orderBy("c_mktsegment")
    }),


    // session conversion by week: sessions flagged (had click, had
    // purchase) via two bool-max aggregates on the session key — the
    // abandoned-cart rate; exact ppm over session-sized frames
    "q125_session_conversion" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      val sess = Sessionize.assign(ev, "user_id", "ts_us",
        gapUs = 3600000000L, tieBreakCols = Seq("event_id"))
      val flags = sess.groupBy("user_id", "session_seq")
        .agg(min(col("ts_us")).as("t0"),
          max((col("event_type") === "click").cast("long")).as("had_click"),
          max((col("event_type") === "purchase").cast("long")).as("had_purchase"))
      flags.filter(col("had_click") === 1L)
        .groupBy(expr(s"t0 div $WeekUs").as("week"))
        .agg(count(lit(1)).as("n_click_sessions"),
          sum(col("had_purchase")).as("n_converted"))
        .withColumn("conv_ppm", expr("(n_converted * 1000000) div n_click_sessions"))
        .orderBy("week")
    }),


    // late-order audit (TPC-H Q4 shape): orders with AT LEAST ONE lineitem
    // shipped >30 days after the order date, counted per priority — the
    // EXISTS is a left-semi join on the order key
    "q126_priority_late" -> ((s, d) => {
      val late = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select(col("o_orderkey").as("ok2"),
          Tables.epochUs(col("o_orderdate")).as("od_us")),
          col("l_orderkey") === col("ok2"))
        .filter(Tables.epochUs(col("l_shipdate")) - col("od_us") > lit(30L * DayUs))
        .select(col("l_orderkey")).distinct()
      Tables.orders(s, d)
        .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_late_orders"))
        .orderBy("o_orderpriority")
    }),


    // 80/20 analysis: per segment, how many top customers cover 80% of
    // revenue — descending cumulative window, threshold crossed via the
    // integer test 5·cum ≥ 4·total (no percentage doubles)
    "q124_pareto_8020" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("cents").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy("c_mktsegment")
      rev
        .withColumn("cum", sum(col("cents")).over(w))
        .withColumn("tot", sum(col("cents")).over(tot))
        // first row where the running 80% threshold is met still counts
        .withColumn("pre", col("cum") - col("cents"))
        .filter(col("pre") * 5L < col("tot") * 4L)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_top"),
          max(expr("(cum * 1000000) div tot")).as("covered_ppm"))
        .orderBy("c_mktsegment")
    }),


    // double-charge detector: purchases by the same user for the same
    // whole-dollar amount within 24 h — one lag window on (user, amount),
    // no self-join; surfaces the later event of each suspicious pair
    "q123_double_charge" -> ((s, d) => {
      val p = Tables.events(s, d).filter(col("event_type") === "purchase")
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          round(col("value")).cast("long").as("amt"))
      val w = Window.partitionBy("user_id", "amt").orderBy(col("ts_us"), col("event_id"))
      p.withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
        .withColumn("prev_id", lag(col("event_id"), 1).over(w))
        .filter(col("prev_ts").isNotNull && col("ts_us") - col("prev_ts") <= lit(86400000000L))
        .select(col("user_id"), col("amt"),
          col("prev_id").as("first_event_id"), col("event_id").as("second_event_id"),
          (col("ts_us") - col("prev_ts")).as("gap_us"))
        .orderBy("user_id", "second_event_id")
    }),


    // graph cohesion: global clustering coefficient (transitivity) of the
    // co-purchase graph — 3·triangles / wedges, both EXACT integers
    // (wedges = Σ d(d−1)/2 is arithmetic on the degree table), one
    // canonical double division at the end
    "q122_clustering_coeff" -> ((s, d) => {
      val edges = GraphAlgorithms.cooccurrenceEdges(Tables.lineitem(s, d),
        "l_orderkey", "l_partkey", minSupport = 2L).localCheckpoint(true)
      val tri = GraphAlgorithms.triangleCount(edges)
      val wedges = edges.select(col("src").as("v"))
        .unionByName(edges.select(col("dst").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg"))
        .agg(sum(expr("(dg * (dg - 1)) div 2")).as("n_wedges"))
      tri.crossJoin(broadcast(wedges))
        .select(col("n_triangles"), col("n_wedges"),
          ((col("n_triangles") * 3L).cast("double") / col("n_wedges").cast("double"))
            .as("transitivity"))
    }),


    // nearest-direction as-of join (pandas merge_asof 'nearest'): each
    // purchase attaches its closest click EITHER side, ties backward —
    // both directional carries share one key exchange and one sort
    "q121_nearest_click" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id").as("c_event_id"))
        .withColumn("c_ts_us", col("ts_us"))
      AsOfJoin.asOfNearest(purchases, clicks, "user_id", "ts_us",
          rightCols = Seq("c_event_id", "c_ts_us"), rightTieBreak = Seq("c_event_id"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("right_c_event_id").as("click_event_id"),
          col("right_c_ts_us").as("click_ts_us"),
          col("asof_dist_us"))
        .orderBy("event_id")
    }),


    // RFM segmentation: recency/frequency/monetary quintiles per customer
    // (ntile over total orders — deterministic with the custkey tie-break;
    // ntile's remainder-to-first-buckets rule is identical in both
    // engines), rolled up per 125-cell segment
    "q120_rfm_segments" -> ((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(Tables.epochUs(col("o_orderdate"))).as("last_us"),
          count(lit(1)).as("f"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("mc"))
      val seg = m
        .withColumn("r_score", ntile(5).over(Window.orderBy(col("last_us"), col("o_custkey"))))
        .withColumn("f_score", ntile(5).over(Window.orderBy(col("f"), col("o_custkey"))))
        .withColumn("m_score", ntile(5).over(Window.orderBy(col("mc"), col("o_custkey"))))
      seg.groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_customers"), sum(col("mc")).as("rev_cents"))
        .orderBy("r_score", "f_score", "m_score")
    }),


    // longest consecutive-day activity streak per user → user-count
    // histogram. Gaps-and-islands: day − row_number is constant exactly
    // within a run of consecutive days — two hash-aggs on the user key,
    // one user-sized window, no self-join at any scale
    "q128_activity_streaks" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day")).distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      days.withColumn("grp", col("day") - row_number().over(w))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id").agg(max(col("len")).as("streak_days"))
        .groupBy("streak_days").agg(count(lit(1)).as("n_users"))
        .orderBy("streak_days")
    }),


    // customer distribution by order count (TPC-H Q13 shape) — zero-order
    // customers kept by the left join; shuffles once on the customer key
    // then reduces to an order-count-sized histogram
    "q129_custdist" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_custkey"))
        .join(Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),


    // hubs & authorities on the directed brand→type graph: exact-integer
    // HITS (unnormalized = alternating-path counts), 3 rounds — brands are
    // pure hubs, types pure authorities; ranking ≡ normalized HITS
    "q130_hits" -> ((s, d) => {
      val edges = Tables.part(s, d).select(
        concat(lit("b:"), col("p_brand")).as("src"),
        concat(lit("t:"), col("p_type")).as("dst"))
      GraphAlgorithms.hitsExact(edges, iterations = 3)
        .orderBy("vertex")
    }),


    // revenue lost to returned items per customer nation (TPC-H Q10 shape):
    // the return-flag filter prunes the fact scan first, dims join on keys,
    // nation broadcast; exact ×10000 integer revenue (qSumWide pattern)
    "q131_returned_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
            .cast("long").as("rc"))
      li.join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg((sum(col("rc")).cast("double") / 10000.0).as("lost_revenue"),
          countDistinct(col("c_custkey")).as("n_customers"))
        .orderBy(col("lost_revenue").desc, col("n_name"))
    }),


    // promo-revenue share per ship month (TPC-H Q14 shape): one fact scan,
    // part-type flag broadcast-joined, conditional integer sums, staged-ppm
    // share (q98 pattern — headroom past 2⁶³ month revenue in cents·10⁴)
    "q132_promo_share" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        unix_micros(date_trunc("month", col("l_shipdate").cast("timestamp")))
          .as("month_us"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long").as("rc"))
      li.join(broadcast(Tables.part(s, d).select(col("p_partkey"),
          col("p_type").startsWith("PROMO").cast("long").as("is_promo"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("month_us")
        .agg(sum(col("rc") * col("is_promo")).as("promo_rc"),
          sum(col("rc")).as("total_rc"))
        .select(col("month_us"),
          (col("promo_rc").cast("double") / 10000.0).as("promo_revenue"),
          expr("(promo_rc * 1000) div (total_rc div 1000)").as("promo_ppm"))
        .orderBy("month_us")
    }),


    // rank agreement between supplier account balance and realized revenue:
    // Spearman distance 6Σd²/(n(n²−1)) in staged ppm — RANK over the bare
    // value (ties share a rank, deterministic in both engines, the t18
    // rule), zero-revenue suppliers kept by the left join
    "q133_spearman_balance" -> ((s, d) => {
      val rev = Tables.lineitem(s, d).groupBy("l_suppkey")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")).as("rev"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), round(col("s_acctbal") * 100).cast("long").as("bal"))
        .join(rev, col("s_suppkey") === col("l_suppkey"), "left")
        .withColumn("rev", coalesce(col("rev"), lit(0L)))
      val ranked = sup.select(
        rank().over(Window.orderBy(col("bal").desc)).cast("long").as("r_bal"),
        rank().over(Window.orderBy(col("rev").desc)).cast("long").as("r_rev"))
      ranked.agg(count(lit(1)).as("n"),
          sum((col("r_bal") - col("r_rev")) * (col("r_bal") - col("r_rev")))
            .as("sum_d2"))
        .select(col("n"), col("sum_d2"),
          // unstaged: headroom to n≈10⁴ suppliers (2e6·n³ < 2⁶³); bigger
          // supplier dimensions would rank a hash-sample instead
          expr("(6 * sum_d2 * 1000000) div (n * (n * n - 1))").as("dist_ppm"))
    }),


    // fulfilment latency profile per order priority (TPC-H Q12 spirit):
    // exact min / median / max / mean of ship−order delay in whole days —
    // one join shuffle on the order key, medians via the tie-safe
    // cumulative-count frame (q110 rule), mean as exact ppm-days
    "q134_ship_delay_profile" -> ((s, d) => {
      val delays = shipDelayDays(s, d)
      // delay is a bounded integer domain: pre-aggregate to (priority,
      // delay) counts, then run the weighted median over the COUNT frame —
      // identical result (2·cum ≥ tot over weights ≡ the row-level rule),
      // but the 5-partition ordered window sorts ~600 register rows
      // instead of 600k raw rows. THE scalable exact-median shape when the
      // value domain is small; the only corpus-sized work is one
      // partial-agg'd shuffle. (q134 was window-bound before: a 5-value
      // partition key caps window parallelism at 5 tasks at any scale.)
      val counts = delays.groupBy("o_orderpriority", "delay_days")
        .agg(count(lit(1)).as("w"))
        .localCheckpoint(true)
      val med = Analytics.weightedMedian(counts, Seq("o_orderpriority"),
        "delay_days", "w")
        .select(col("o_orderpriority"), col("wmedian").as("median_days"))
      counts.groupBy("o_orderpriority")
        .agg(sum(col("w")).as("n"), min(col("delay_days")).as("min_days"),
          max(col("delay_days")).as("max_days"),
          sum(col("delay_days") * col("w")).as("sum_days"))
        .join(med, "o_orderpriority")
        .select(col("o_orderpriority"), col("n"), col("min_days"),
          col("median_days"), col("max_days"),
          expr("(sum_days * 1000000) div n").as("mean_days_ppm"))
        .orderBy("o_orderpriority")
    }),


    // ABC inventory classification: parts partitioned into A (first 80% of
    // revenue), B (to 95%), C (tail) by the integer pre-threshold test on a
    // descending cumulative window (q124 rule — the crossing row belongs to
    // the class it completes). Global window over the parts DIM (not the
    // fact table); >10⁸-part catalogs would pre-bucket by sketched range
    // bounds (Layout.sketchRangeBounds) first
    "q135_abc_class" -> ((s, d) => {
      val rev = Tables.lineitem(s, d).groupBy("l_partkey")
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")).as("rc"))
      val w = Window.orderBy(col("rc").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.withColumn("cum", sum(col("rc")).over(w))
        .withColumn("tot", sum(col("rc")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("pre", col("cum") - col("rc"))
        .withColumn("abc_class",
          when(col("pre") * 5L < col("tot") * 4L, "A")
            .when(col("pre") * 20L < col("tot") * 19L, "B")
            .otherwise("C"))
        .groupBy("abc_class")
        .agg(count(lit(1)).as("n_parts"),
          (sum(col("rc")).cast("double") / 10000.0).as("revenue"))
        .orderBy("abc_class")
    }),


    // copurchase-graph degree distribution: the shape audit run before any
    // graph algorithm (is this graph peelable? skewed?) — symmetric edge
    // union, two hash-aggs, histogram-sized result
    "q136_degree_histogram" -> ((s, d) => {
      val edges = GraphAlgorithms.cooccurrenceEdges(
        Tables.lineitem(s, d), "l_orderkey", "l_partkey", minSupport = 2L)
      edges.select(col("src").as("u")).unionByName(edges.select(col("dst").as("u")))
        .groupBy("u").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_vertices"))
        .orderBy("degree")
    }),


    // Shewhart c-chart over daily event volume: days beyond the 2σ warning
    // limits, all-integer via the cross-multiplied test
    // (N·x − S)² > 4·(N·Q − S²)
    // (population variance; both sides exact longs) — no float mean/stddev
    // anywhere. Day counts roll up map-side; the 1-row moment frame
    // broadcasts. Counts past ~10⁹/day need DECIMAL(38) moments
    "q137_control_chart" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day")).agg(count(lit(1)).as("x"))
      val mom = daily.agg(count(lit(1)).as("nn"), sum(col("x")).as("ss"),
        sum(col("x") * col("x")).as("qq"))
      daily.crossJoin(broadcast(mom))
        .filter((col("nn") * col("x") - col("ss")) * (col("nn") * col("x") - col("ss"))
          > lit(4L) * (col("nn") * col("qq") - col("ss") * col("ss")))
        .select(col("day"), col("x").as("n_events"),
          when(col("nn") * col("x") > col("ss"), "high").otherwise("low").as("side"),
          expr("(x * 1000000) div (ss div nn)").as("vs_mean_ppm"))
        .orderBy("day")
    }),


    // Benford first-digit audit on order totals (in cents, so the leading
    // digit is of an integer — no locale/format dependence): digit
    // frequencies in exact ppm; the classic fabricated-data screen
    "q138_benford" -> ((s, d) => {
      val digits = Tables.orders(s, d)
        .select(substring(round(col("o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).as("digit"))
      val tot = digits.agg(count(lit(1)).as("n_total"))
      digits.groupBy("digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          expr("(n * 1000000) div n_total").as("share_ppm"))
        .orderBy("digit")
    }),


    // categorical-mix drift monitor: per month, the order-priority whose
    // share deviates most from the all-time mix — |ppm − ppm| of two
    // non-negative floor divisions, ties to the lexicographically first
    // priority; the drift alarm for label/category distributions
    "q139_priority_mix_shift" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        unix_micros(date_trunc("month", col("o_orderdate").cast("timestamp")))
          .as("month_us"), col("o_orderpriority"))
      val mc = o.groupBy("month_us", "o_orderpriority").agg(count(lit(1)).as("c"))
      val mt = mc.groupBy("month_us").agg(sum(col("c")).as("n_m"))
      val ac = o.groupBy("o_orderpriority").agg(count(lit(1)).as("c_all"))
      val at = o.agg(count(lit(1)).as("n_all"))
      val dev = mc.join(mt, "month_us")
        .join(broadcast(ac), "o_orderpriority").crossJoin(broadcast(at))
        .select(col("month_us"), col("o_orderpriority"),
          abs(expr("(c * 1000000) div n_m") - expr("(c_all * 1000000) div n_all"))
            .as("dev_ppm"))
      dev.withColumn("rn", row_number().over(
          Window.partitionBy("month_us")
            .orderBy(col("dev_ppm").desc, col("o_orderpriority"))))
        .filter(col("rn") === 1)
        .select(col("month_us"), col("o_orderpriority"), col("dev_ppm"))
        .orderBy("month_us")
    }),


    // error-burst detector: hours whose error share exceeds 2× the all-time
    // error rate — the cross-multiplied test err·N > 2·E·n keeps everything
    // in integers (no rate doubles); hour counts roll up map-side, the
    // 1-row global register broadcasts
    "q140_error_burst" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(expr("ts_us div 3600000000").as("hour_idx"))
        .agg(count(lit(1)).as("n_events"),
          sum((col("event_type") === "error").cast("long")).as("n_errors"))
      val glob = hourly.agg(sum(col("n_events")).as("nn"),
        sum(col("n_errors")).as("ee"))
      hourly.crossJoin(broadcast(glob))
        .filter(col("n_errors") * col("nn") > lit(2L) * col("ee") * col("n_events"))
        .select(col("hour_idx"), col("n_events"), col("n_errors"),
          expr("(n_errors * 1000000) div n_events").as("err_ppm"))
        .orderBy("hour_idx")
    }),


    // recency census: users by whole days idle since their last event
    // (relative to the corpus max — the "as-of now" register), with the
    // cumulative still-active share per idle bucket — the churn-curve input;
    // one (max) rollup per user against one broadcast register
    "q141_recency_histogram" -> ((s, d) => {
      val u = Tables.events(s, d).groupBy("user_id")
        .agg(max(col("ts_us")).as("l"))
      val mx = u.agg(max(col("l")).as("m"), count(lit(1)).as("nt"))
      val hist = u.crossJoin(broadcast(mx))
        .groupBy(expr(s"(m - l) div $DayUs").as("days_idle"))
        .agg(count(lit(1)).as("n_users"), max(col("nt")).as("nt"))
      hist.withColumn("cum_users", sum(col("n_users")).over(
          Window.orderBy("days_idle")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("days_idle"), col("n_users"),
          expr("(cum_users * 1000000) div nt").as("cum_share_ppm"))
        .orderBy("days_idle")
    }),


    // weekday-effect profile: volume and purchase propensity per day of
    // week — dow from pure epoch-day arithmetic ((day+4) mod 7, day 0 was a
    // Thursday), no calendar functions on either engine
    "q142_weekend_effect" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(expr(s"((ts_us div $DayUs) + 4) % 7").as("dow"))
        .agg(count(lit(1)).as("n_events"),
          sum((col("event_type") === "purchase").cast("long")).as("n_purchases"))
        .withColumn("purchase_ppm", expr("(n_purchases * 1000000) div n_events"))
        .orderBy("dow")
    }),


    // U-shaped (position-based) attribution: each purchase's preceding
    // touches since the prior purchase share credit 40/20/40 (first/
    // middles/last; 100/50-50 for 1-2 touches) — journeys cut by a
    // strict-past purchase counter (one user-keyed exchange serves every
    // window), credit in integer ppm (middle remainder truncates,
    // documented); complements q106's last-touch rule
    "q143_position_attribution" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val jd = Tables.events(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
        .withColumn("j", coalesce(
          sum((col("event_type") === "purchase").cast("long"))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val convs = jd.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("j"))
      val tw = Window.partitionBy("user_id", "j").orderBy(col("ts_us"), col("event_id"))
      jd.filter(col("event_type") =!= "purchase")
        .join(convs, Seq("user_id", "j"), "left_semi")
        .withColumn("rn", row_number().over(tw))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("user_id", "j")))
        .withColumn("credit_ppm",
          when(col("cnt") === 1, 1000000L)
            .when(col("cnt") === 2, 500000L)
            .when(col("rn") === 1 || col("rn") === col("cnt"), 400000L)
            .otherwise(expr("200000 div (cnt - 2)")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_touches"),
          sum(col("credit_ppm")).as("credit_ppm_total"))
        .orderBy("event_type")
    }),


    // chi-square independence of (day-of-week × event type): χ² in ppm from
    // pure integer registers — per-cell term (O·N − R·C)²·10⁶/(N·R·C)
    // with the staged floor division (deterministic on both engines; the
    // per-cell floor is the documented convention). Contingency cells roll
    // up map-side; margins broadcast
    "q144_chi_square" -> ((s, d) => {
      chi2DowType(s, d)
        .select(col("chi2_ppm"),
          ((col("n_dow") - 1L) * (col("n_types") - 1L)).as("dof"))
    }),


    // calendar seasonality index: order volume per month-of-year vs the
    // uniform expectation, in exact ppm (10⁶ = an average month) — the
    // capacity-planning profile; calendar month is deterministic on both
    // engines (UTC session)
    "q145_seasonality_index" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(month(col("o_orderdate").cast("timestamp")).as("moy"))
      val tot = o.agg(count(lit(1)).as("nt"))
      o.groupBy("moy").agg(count(lit(1)).as("n_orders"))
        .crossJoin(broadcast(tot))
        .select(col("moy"), col("n_orders"),
          expr("(n_orders * 12 * 1000000) div nt").as("index_ppm"))
        .orderBy("moy")
    }),


    // acquisition vs retention: monthly revenue split between first-time
    // and returning customers — the customer's first order month joins back
    // on the customer key (one exchange), shares in exact cents-ppm
    "q146_new_vs_returning" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"),
        unix_micros(date_trunc("month", col("o_orderdate").cast("timestamp")))
          .as("month_us"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val firstm = o.groupBy("o_custkey").agg(min(col("month_us")).as("fm"))
      o.join(firstm, "o_custkey")
        .withColumn("is_new", (col("month_us") === col("fm")).cast("long"))
        .groupBy("month_us")
        .agg(sum(col("cents") * col("is_new")).as("new_cents"),
          sum(col("cents")).as("total_cents"))
        .select(col("month_us"),
          (col("new_cents").cast("double") / 100.0).as("new_revenue"),
          ((col("total_cents") - col("new_cents")).cast("double") / 100.0)
            .as("returning_revenue"),
          expr("(new_cents * 1000) div (total_cents div 1000)").as("new_share_ppm"))
        .orderBy("month_us")
    }),


    // max drawdown of each user's running spend balance: prefix-sum →
    // prefix-max → peak-to-trough gap, all in integer cents on ONE
    // user-keyed exchange (three frames share the sort); top-20 deepest
    "q147_max_drawdown" -> ((s, d) => {
      val p = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p.withColumn("bal", sum(col("cents")).over(w))
        .withColumn("peak", max(col("bal")).over(w))
        .withColumn("dd", col("peak") - col("bal"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_points"), max(col("dd")).as("max_drawdown_cents"))
        .orderBy(col("max_drawdown_cents").desc, col("user_id")).limit(20)
    }),


    // per-user day-activity bitmap: one BIGINT packs which of the (≤63)
    // days since corpus start the user was active — bit_or is the map-side-
    // combinable presence fold (the roaring-bitmap idea at word width),
    // popcount gives active days for free. Longer horizons shard the mask
    // by 63-day epoch and OR per shard
    "q148_activity_bitmap" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
      val base = days.agg(min(col("day")).as("d0"))
      days.crossJoin(broadcast(base))
        .filter(col("day") - col("d0") < 63L)
        .withColumn("bit", expr("shiftleft(CAST(1 AS BIGINT), CAST(day - d0 AS INT))"))
        .groupBy("user_id")
        .agg(bit_or(col("bit")).as("activity_mask"))
        .withColumn("active_days", bit_count(col("activity_mask")))
        .orderBy("user_id")
    }),


    // association lift between event types at user granularity:
    // lift·10⁶ = (n_ab·N·10⁶) div (n_a·n_b) over presence sets — the
    // market-basket signal; presence via one distinct, pairs via self-join
    // on the user key (25→10 unordered type pairs, frames stay type²-sized)
    "q149_event_lift" -> ((s, d) => {
      val pres = Tables.events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
        .localCheckpoint(true)
      val nUsers = Tables.events(s, d).select(col("user_id")).distinct()
        .agg(count(lit(1)).as("nt"))
      val typeN = pres.groupBy("event_type").agg(count(lit(1)).as("n"))
      val pairs = pres.select(col("user_id"), col("event_type").as("ta"))
        .join(pres.select(col("user_id"), col("event_type").as("tb")), "user_id")
        .filter(col("ta") < col("tb"))
        .groupBy("ta", "tb").agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(typeN.select(col("event_type").as("ta"), col("n").as("n_a"))), "ta")
        .join(broadcast(typeN.select(col("event_type").as("tb"), col("n").as("n_b"))), "tb")
        .crossJoin(broadcast(nUsers))
        .select(col("ta"), col("tb"), col("n_ab"),
          expr("(n_ab * nt * 1000000) div (n_a * n_b)").as("lift_ppm"))
        .orderBy("ta", "tb")
    }),


    // data-skipping effectiveness audit: per layout (time-clustered vs
    // Z-order blocks), the share of blocks a user-point predicate can skip
    // using only min/max footer stats — the measured justification for
    // q64's layout; blocks are z-prefix cells (z div 2¹²), probes are the
    // 5 lowest user ids, everything integer
    "q150_skipping_audit" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        call_function("div", col("ts_us") - Jan1_24, lit(3600000000L)).as("hr"))
        .localCheckpoint(true)
      val probes = broadcast(
        ev.select(col("user_id").as("u")).distinct().orderBy("u").limit(5))
      def audit(layout: String, blk: Column) = {
        val stats = ev.withColumn("blk", blk).groupBy("blk")
          .agg(min(col("user_id")).as("mn"), max(col("user_id")).as("mx"))
        val nb = stats.agg(count(lit(1)).as("n_blocks"))
        val cand = stats.crossJoin(probes)
          .filter(col("u") >= col("mn") && col("u") <= col("mx"))
          .agg(count(lit(1)).as("n_candidate"))
        nb.crossJoin(cand).select(lit(layout).as("layout"),
          col("n_blocks"), col("n_candidate"),
          // greatest-clamp class (a): an empty log is legal (empty-world gate)
          expr("((n_blocks * 5 - n_candidate) * 1000000) div greatest(n_blocks * 5, 1)")
            .as("skip_ppm"))
      }
      audit("time", expr("hr div 16"))
        .unionByName(audit("zorder",
          call_function("div", Layout.zValue(col("user_id"), col("hr"), 10),
            lit(4096L))))
        .orderBy("layout")
    }),


    // bloom-filter false-positive audit: the q62 filter (64 words × 3
    // hashes) probed with the full customer dimension — measured fp rate
    // over true negatives in exact ppm, the number that validates the
    // (words, hashes) sizing before shipping the filter into a join
    "q151_bloom_fpp" -> ((s, d) => {
      val hot = Tables.orders(s, d)
        .filter(col("o_totalprice") > 490000.0)
        .select(col("o_custkey"))
      val bloom = Sketches.bloomBuild(hot, col("o_custkey"), words = 64, hashes = 3)
      val probes = Tables.customer(s, d).select(col("c_custkey"))
      val actual = hot.distinct().withColumnRenamed("o_custkey", "c_custkey")
        .withColumn("actually_in", lit(true))
      Sketches.bloomProbe(bloom, probes, "c_custkey", words = 64, hashes = 3)
        .join(actual, Seq("c_custkey"), "left")
        .agg(count(lit(1)).as("n_probes"),
          sum(col("maybe_present").cast("long")).as("n_maybe"),
          sum(coalesce(col("actually_in"), lit(false)).cast("long")).as("n_true"))
        .select(col("n_probes"), col("n_maybe"), col("n_true"),
          expr("((n_maybe - n_true) * 1000000) div (n_probes - n_true)")
            .as("fp_ppm"))
    }),


    // supplier diversity per product family (TPC-H Q16 shape): distinct
    // suppliers per (brand, size) — the single-source-risk screen; the
    // distinct shuffles once on the composite key, top-20 by coverage
    "q152_supplier_coverage" -> ((s, d) => {
      Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand"),
          col("p_size")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
        .limit(20)
    }),


    // promotion-forecast revenue (TPC-H Q6 shape): the would-be revenue
    // change from eliminating a discount band in one shipping year — pure
    // scan+filter+sum, the canonical predicate-pushdown probe; exact
    // ×10⁶-quantized sum (price·discount carries 6 fractional digits)
    "q153_forecast_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(Tables.epochUs(col("l_shipdate")) >= lit(Jan1_96) &&
          Tables.epochUs(col("l_shipdate")) < lit(Jan1_97) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24.0)
        .agg(count(lit(1)).as("n_lineitems"),
          (sum(round(col("l_extendedprice") * col("l_discount") * 1000000)
            .cast("long")).cast("double") / 1000000.0).as("revenue_effect"))
    }),


    // tail-latency profile: p50/p90/p99 of event value per type (exact
    // sort-based interpolated percentiles — Spark `percentile` ≡ DuckDB
    // `quantile_cont`, the q26 parity) — the SLO dashboard numbers
    "q154_tail_latency" -> ((s, d) => {
      Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          expr("percentile(value, 0.99)").as("p99"))
        .orderBy("event_type")
    }),


    // referential-integrity audit across the star schema: orphan counts by
    // left-anti join on each foreign key plus duplicate-key checks — the
    // pre-flight data-quality gate; every check is one key-shuffle, results
    // collapse to a single row
    "q155_integrity_audit" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val orphanOrders = orders.select(col("o_custkey"))
        .join(Tables.customer(s, d).select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_orders"))
      val orphanLines = li.select(col("l_orderkey"))
        .join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_lineitems"))
      val orphanParts = li.select(col("l_partkey"))
        .join(Tables.part(s, d).select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_partrefs"))
      val dupKeys = orders.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
        .agg(sum((col("c") > 1L).cast("long")).as("dup_orderkeys"))
      orphanOrders.crossJoin(orphanLines).crossJoin(orphanParts)
        .crossJoin(dupKeys)
    }),


    // month-over-month revenue bridge: ΔMRR decomposed into new + expansion
    // − contraction − churned via a FULL OUTER self-join of per-customer
    // month revenue on consecutive month indices (year·12+month — calendar-
    // safe), everything in exact cents; the four components provably sum to
    // the total delta
    "q156_revenue_bridge" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey"),
          (year(col("o_orderdate").cast("timestamp")) * 12 +
            month(col("o_orderdate").cast("timestamp"))).as("midx"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .localCheckpoint(true)
      val prev = rev.select(col("o_custkey").as("pc"),
        (col("midx") + 1).as("pmidx"), col("cents").as("pcents"))
      rev.join(prev, col("o_custkey") === col("pc") && col("midx") === col("pmidx"),
          "full_outer")
        .select(coalesce(col("midx"), col("pmidx")).as("m"),
          coalesce(col("cents"), lit(0L)).as("cur"),
          coalesce(col("pcents"), lit(0L)).as("prv"),
          col("cents").isNull.as("gone"), col("pcents").isNull.as("fresh"))
        .groupBy("m")
        .agg(
          sum(when(col("fresh"), col("cur")).otherwise(0L)).as("new_cents"),
          sum(when(!col("fresh") && !col("gone") && col("cur") > col("prv"),
            col("cur") - col("prv")).otherwise(0L)).as("expansion_cents"),
          sum(when(!col("fresh") && !col("gone") && col("cur") < col("prv"),
            col("prv") - col("cur")).otherwise(0L)).as("contraction_cents"),
          sum(when(col("gone"), col("prv")).otherwise(0L)).as("churned_cents"))
        .withColumn("delta_cents",
          col("new_cents") + col("expansion_cents")
            - col("contraction_cents") - col("churned_cents"))
        .orderBy("m")
    }),


    // survival curve: users still active k days after first contact —
    // lifespan histogram plus a DESCENDING cumulative share (survivors at
    // ≥ k days) in exact ppm; one (min,max) rollup per user
    "q157_survival_curve" -> ((s, d) => {
      val span = Tables.events(s, d).groupBy("user_id")
        .agg(expr(s"(max(ts_us) - min(ts_us)) div $DayUs").as("lifespan_days"))
      val tot = span.agg(count(lit(1)).as("nt"))
      val hist = span.groupBy("lifespan_days").agg(count(lit(1)).as("n_users"))
      hist.crossJoin(broadcast(tot))
        .withColumn("surviving", sum(col("n_users")).over(
          Window.orderBy(col("lifespan_days").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("lifespan_days"), col("n_users"),
          expr("(surviving * 1000000) div nt").as("surviving_ppm"))
        .orderBy("lifespan_days")
    }),


    // temporal ping-pong motifs: A→B→A event-type bounces per (A, B) —
    // two lags on the per-user ordered stream (one exchange serves both),
    // the oscillation signal sequence mining misses when it only counts
    // forward transitions (q87)
    "q158_bounce_motifs" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
        .withColumn("a", lag(col("event_type"), 2).over(w))
        .withColumn("b", lag(col("event_type"), 1).over(w))
        .filter(col("a").isNotNull && col("a") === col("event_type")
          && col("a") =!= col("b"))
        .groupBy(col("a").as("t_outer"), col("b").as("t_inner"))
        .agg(count(lit(1)).as("n_bounces"))
        .orderBy("t_outer", "t_inner")
    }),


    // shipment backlog curve: orders placed vs fully shipped per month
    // (an order ships when its LAST lineitem ships), running backlog =
    // cumulative placed − shipped — the ops burndown; full-outer on the
    // month index keeps tail months where shipments outlive placements
    "q159_shipment_backlog" -> ((s, d) => {
      def midx(c: Column) = year(c.cast("timestamp")) * 12 + month(c.cast("timestamp"))
      val placed = Tables.orders(s, d)
        .groupBy(midx(col("o_orderdate")).as("m")).agg(count(lit(1)).as("placed"))
      val shipped = Tables.lineitem(s, d)
        .groupBy("l_orderkey").agg(max(Tables.epochUs(col("l_shipdate"))).as("last_us"))
        .groupBy(midx(timestamp_micros(col("last_us"))).as("m"))
        .agg(count(lit(1)).as("shipped"))
      placed.join(shipped, Seq("m"), "full_outer")
        .select(col("m"), coalesce(col("placed"), lit(0L)).as("placed"),
          coalesce(col("shipped"), lit(0L)).as("shipped"))
        .withColumn("backlog", sum(col("placed") - col("shipped")).over(
          Window.orderBy("m").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("m")
    }),


    // average-order-value trend: AOV per month in exact floored cents plus
    // the month-over-month ratio — ratio_ppm divides two POSITIVE longs
    // (safe truncation), the signed change falls out by subtraction, never
    // by dividing a negative
    "q160_aov_trend" -> ((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy((year(col("o_orderdate").cast("timestamp")) * 12 +
          month(col("o_orderdate").cast("timestamp"))).as("m"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("aov_cents", expr("cents div n_orders"))
      m.withColumn("prev", lag(col("aov_cents"), 1).over(Window.orderBy("m")))
        .withColumn("ratio_ppm",
          when(col("prev").isNotNull, expr("(aov_cents * 1000000) div prev")))
        .select(col("m"), col("n_orders"), col("aov_cents"),
          col("ratio_ppm"), (col("ratio_ppm") - 1000000L).as("change_ppm"))
        .orderBy("m")
    }),


    // SLA attainment per priority: orders FULLY shipped within 30 days of
    // placement (order-granular — the max-lineitem rollup feeds one integer
    // comparison), attainment in exact ppm; q134's line-granular profile
    // aggregated to the number the contract actually binds
    "q161_priority_sla" -> ((s, d) => {
      val lastShip = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(max(Tables.epochUs(col("l_shipdate"))).as("last_us"))
      Tables.orders(s, d)
        .join(lastShip, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum((col("last_us") - Tables.epochUs(col("o_orderdate"))
            <= lit(30L * DayUs)).cast("long")).as("n_within_sla"))
        .withColumn("sla_ppm", expr("(n_within_sla * 1000000) div n_orders"))
        .orderBy("o_orderpriority")
    }),


    // resurrection profile: users by their LONGEST dormancy gap in whole
    // days (a long gap followed by any event = a comeback) — one lag on
    // the user-keyed order, max per user, histogram; the reactivation-
    // campaign sizing table
    "q162_resurrection_gaps" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"))
        .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .filter(col("gap").isNotNull)
        .groupBy("user_id")
        .agg(expr(s"max(gap) div $DayUs").as("max_gap_days"))
        .groupBy("max_gap_days").agg(count(lit(1)).as("n_users"))
        .orderBy("max_gap_days")
    }),


    // brand cross-sell matrix: brand pairs co-appearing in one order —
    // the distinct (order, brand) projection self-joins on the order key
    // (25 brands bound the blow-up, orders are the shuffle key); top-20
    "q163_brand_cross_sell" -> ((s, d) => {
      val ob = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand")).distinct()
        .localCheckpoint(true)
      ob.select(col("ok"), col("p_brand").as("ba"))
        .join(ob.select(col("ok"), col("p_brand").as("bb")), "ok")
        .filter(col("ba") < col("bb"))
        .groupBy("ba", "bb").agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("ba"), col("bb")).limit(20)
    }),


    // partition-balance audit of the J1 murmur2 router: keys per partition
    // → max-vs-mean skew in ppm — the hot-partition early warning read off
    // the SAME hash the cluster routes with (a skewed router at 100 TB is
    // a stuck consumer, not a slow query)
    "q164_route_balance" -> ((s, d) => {
      val parts = Tables.events(s, d).select(col("user_id")).distinct()
        .withColumn("partition", kafkaPartition(col("user_id").cast("string"), 32))
        .groupBy("partition").agg(count(lit(1)).as("n_keys"))
      parts.agg(count(lit(1)).as("n_partitions"),
          sum(col("n_keys")).as("n_keys_total"),
          min(col("n_keys")).as("min_keys"), max(col("n_keys")).as("max_keys"))
        .select(col("n_partitions"), col("n_keys_total"),
          col("min_keys"), col("max_keys"),
          expr("(max_keys * n_partitions * 1000000) div n_keys_total")
            .as("skew_ppm"))
    }),


    // receivables-style aging: orders still unshipped at the cutoff (their
    // LAST lineitem ships on/after it) bucketed by days outstanding, with
    // the value at risk in exact cents — the classic 30/60/90 report
    "q165_aging_buckets" -> ((s, d) => {
      val lastShip = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(max(Tables.epochUs(col("l_shipdate"))).as("last_us"))
      Tables.orders(s, d)
        .withColumn("od_us", Tables.epochUs(col("o_orderdate")))
        .filter(col("od_us") < lit(Jan1_97))
        .join(lastShip, col("o_orderkey") === col("l_orderkey"))
        .filter(col("last_us") >= lit(Jan1_97))
        .withColumn("age_days", expr(s"($Jan1_97 - od_us) div $DayUs"))
        .withColumn("bucket",
          when(col("age_days") <= 30, "a_0_30")
            .when(col("age_days") <= 60, "b_31_60")
            .when(col("age_days") <= 90, "c_61_90")
            .otherwise("d_90_plus"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("open_cents"))
        .orderBy("bucket")
    }),


    // behavioral rhythm: variance-to-mean of inter-event gaps (in whole
    // minutes) per user — metronomes (bots, schedulers) sit near 0, human
    // bursts high; staged-ppm VMR on integer gap moments, 20 most regular
    // among users with ≥ 20 gaps
    "q166_habit_regularity" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val gaps = Tables.events(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"))
        .withColumn("gap_min",
          call_function("div", col("ts_us") - lag(col("ts_us"), 1).over(w),
            lit(60000000L)))
        .filter(col("gap_min").isNotNull)
      gaps.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(col("gap_min")).as("sg"),
          sum(col("gap_min") * col("gap_min")).as("qg"))
        .filter(col("n") >= 20L && col("sg") > 0L)
        .select(col("user_id"), col("n"),
          // staged + floor-guarded denominator (tight same-minute streams)
          expr("((n * qg - sg * sg) * 1000) div greatest(((n - 1) * sg) div 1000, 1)")
            .as("vmr_ppm"))
        .orderBy(col("vmr_ppm"), col("user_id")).limit(20)
    }),


    // customer value-segment migration: monetary quintile in 1995-97 vs
    // 1998+ for customers active in both — the 5×5 transition matrix that
    // prices retention programs; ntile over a TOTAL order (cents desc,
    // custkey) is allocation-exact on both engines (q120 rule)
    "q167_segment_migration" -> ((s, d) => {
      def seg(df: DataFrame) = df
        .groupBy("o_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .withColumn("seg", ntile(5).over(
          Window.orderBy(col("cents").desc, col("o_custkey"))))
      val o = Tables.orders(s, d)
        .withColumn("od_us", Tables.epochUs(col("o_orderdate")))
      val p1 = seg(o.filter(col("od_us") < lit(Jan1_98)))
        .select(col("o_custkey"), col("seg").as("seg_early"))
      val p2 = seg(o.filter(col("od_us") >= lit(Jan1_98)))
        .select(col("o_custkey").as("c2"), col("seg").as("seg_late"))
      p1.join(p2, col("o_custkey") === col("c2"))
        .groupBy("seg_early", "seg_late").agg(count(lit(1)).as("n_customers"))
        .orderBy("seg_early", "seg_late")
    }),


    // unit-price dispersion per part: same part billed at different
    // per-unit prices (cents div whole-unit qty — exact) — the pricing-
    // consistency audit; top-20 widest spreads
    "q168_price_dispersion" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_partkey"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT) div CAST(l_quantity AS BIGINT)")
            .as("unit_cents"))
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_sales"), min(col("unit_cents")).as("min_unit"),
          max(col("unit_cents")).as("max_unit"))
        .withColumn("spread_cents", col("max_unit") - col("min_unit"))
        .orderBy(col("spread_cents").desc, col("l_partkey")).limit(20)
    }),


    // grouped control chart: (event type × day) volume cells beyond their
    // TYPE's 2σ band — q137's cross-multiplied integer test with the
    // moment registers computed per group instead of globally; the
    // per-stream anomaly view a global chart averages away
    "q169_typed_control_chart" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
      val mom = daily.groupBy("event_type")
        .agg(count(lit(1)).as("nn"), sum(col("x")).as("ss"),
          sum(col("x") * col("x")).as("qq"))
      daily.join(broadcast(mom), "event_type")
        .filter((col("nn") * col("x") - col("ss")) * (col("nn") * col("x") - col("ss"))
          > lit(4L) * (col("nn") * col("qq") - col("ss") * col("ss")))
        .select(col("event_type"), col("day"), col("x").as("n_events"),
          when(col("nn") * col("x") > col("ss"), "high").otherwise("low").as("side"))
        .orderBy("event_type", "day")
    }),


    // acquisition quality: share of each first-order cohort month that
    // places a SECOND order within 90 days — row_number picks order #1 and
    // #2 on one customer-keyed window, exact ppm per cohort month
    "q170_second_order_rate" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("od_us"), col("o_orderkey"))
      val ranked = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          Tables.epochUs(col("o_orderdate")).as("od_us"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
      val first = ranked.filter(col("rn") === 1)
        .select(col("o_custkey"), col("od_us").as("first_us"))
      val second = ranked.filter(col("rn") === 2)
        .select(col("o_custkey").as("c2"), col("od_us").as("second_us"))
      first.join(second, col("o_custkey") === col("c2"), "left")
        .groupBy(unix_micros(date_trunc("month", timestamp_micros(col("first_us"))))
          .as("cohort_us"))
        .agg(count(lit(1)).as("n_new"),
          sum((col("second_us").isNotNull &&
            col("second_us") - col("first_us") <= lit(90L * DayUs)).cast("long"))
            .as("n_repeat_90d"))
        .withColumn("repeat_ppm", expr("(n_repeat_90d * 1000000) div n_new"))
        .orderBy("cohort_us")
    }),


    // discount-response analysis: per discount band, volume / mean quantity
    // / return rate — does a deeper discount move more units or bounce more
    // returns; all-integer means in ppm, bands from exact cent thresholds
    // (discount doubles compare identically to the same literals on both
    // engines)
    "q171_discount_response" -> ((s, d) => {
      Tables.lineitem(s, d)
        .withColumn("band",
          when(col("l_discount") < 0.02, "a_0_2")
            .when(col("l_discount") < 0.05, "b_2_5")
            .when(col("l_discount") < 0.08, "c_5_8")
            .otherwise("d_8_plus"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("long")).as("qty"),
          sum((col("l_returnflag") === "R").cast("long")).as("n_returns"))
        .select(col("band"), col("n_lines"),
          expr("(qty * 1000000) div n_lines").as("mean_qty_ppm"),
          expr("(n_returns * 1000000) div n_lines").as("return_ppm"))
        .orderBy("band")
    }),


    // daypart profile: volume, purchase propensity and mean value by
    // 6-hour band — hour from pure epoch arithmetic, value in exact cents,
    // the capacity/staffing view of the event stream
    "q172_daypart_profile" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("hour", expr(s"(ts_us div 3600000000) % 24"))
        .withColumn("daypart",
          when(col("hour") < 6, "a_night")
            .when(col("hour") < 12, "b_morning")
            .when(col("hour") < 18, "c_afternoon")
            .otherwise("d_evening"))
        .groupBy("daypart")
        .agg(count(lit(1)).as("n_events"),
          sum((col("event_type") === "purchase").cast("long")).as("n_purchases"),
          sum(coalesce(round(col("value") * 100).cast("long"), lit(0L)))
            .as("value_cents"))
        .withColumn("purchase_ppm", expr("(n_purchases * 1000000) div n_events"))
        .orderBy("daypart")
    }),


    // engagement-depth curve: purchase propensity by session SIZE (events
    // per session, capped at 10+) — does a longer session convert better;
    // q125's sessionization feeding a size-bucketed rollup, exact ppm
    "q173_session_size_conversion" -> ((s, d) => {
      val sess = Sessionize.assign(
        Tables.events(s, d)
          .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type")),
        "user_id", "ts_us", gapUs = 3600000000L, tieBreakCols = Seq("event_id"))
      sess.groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          max((col("event_type") === "purchase").cast("long")).as("had_purchase"))
        .withColumn("size_bucket", least(col("n_events"), lit(10L)))
        .groupBy("size_bucket")
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("had_purchase")).as("n_converted"))
        .withColumn("conv_ppm", expr("(n_converted * 1000000) div n_sessions"))
        .orderBy("size_bucket")
    }),

    // privacy preflight for training-data release: k-anonymity risk
    // histogram over the quasi-identifier (nation, segment, balance-band)
    // — how many QI groups have size 1/2/3-5/6-10/10+, and how many rows
    // sit in each re-identification band. Balance band uses the offset
    // floor-div rule (acctbal goes negative; Spark div truncates, DuckDB
    // // floors — offsetting makes the numerator non-negative where both
    // agree). Two partial-agg'd shuffles, QI-space-sized frames.
    "q175_k_anonymity" -> ((s, d) => {
      val g = Tables.customer(s, d)
        .withColumn("cents", round(col("c_acctbal") * 100).cast("long"))
        .withColumn("bal_kb", expr("((cents + 100000000) div 100000) - 1000"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_kb")
        .agg(count(lit(1)).as("gsz"))
      g.withColumn("k_bucket",
          when(col("gsz") === 1L, "a_1").when(col("gsz") === 2L, "b_2")
            .when(col("gsz") <= 5L, "c_3_5").when(col("gsz") <= 10L, "d_6_10")
            .otherwise("e_gt10"))
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n_groups"), sum(col("gsz")).as("n_rows"))
        .orderBy("k_bucket")
    }),

    // R6 de-index on tombstone: a changelog over documents tombstones every
    // doc_id ≡ 0 (mod 7), the secondary index REBUILDS from the compacted
    // latest view, and the 'spark' lookup must exclude the tombstoned docs
    // — the reference's CDC de-indexing (KVStoreIndex de-index on
    // tombstone/TTL, its drift TODOs #242/#248) answered declaratively:
    // the index derives from the same latest view in the same plan, so it
    // CANNOT drift. Mirrors ESecondaryIndexSpec's delete-then-lookup
    // assertion as an oracle-checked query.
    "q174_deindex_tombstone" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("ts0", lit(0L)).withColumn("tombstone", lit(false))
      val dels = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("ts0", lit(1L)).withColumn("tombstone", lit(true))
      val latest = KVTable(docs, Seq("doc_id"), "ts0",
        tombstoneCol = Some("tombstone")).delete(dels).latest
      val index = SecondaryIndex.build(latest, Seq("doc_id"), tokens(col("text")))
      SecondaryIndex.lookup(index, latest, Seq("doc_id"), "spark")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // q175's companion privacy preflight: l-diversity — a (nation,
    // segment) equivalence class is safe only if the SENSITIVE attribute
    // (the balance band, q175's offset floor-div rule) takes >= l distinct
    // values inside it, else group membership leaks the band. Histogram of
    // classes by their l plus the minimum l (the release's diversity
    // floor). Two partial-agg'd shuffles over QI-space-sized frames.
    "q176_l_diversity" -> ((s, d) => {
      val g = Tables.customer(s, d)
        .withColumn("cents", round(col("c_acctbal") * 100).cast("long"))
        .withColumn("bal_kb", expr("((cents + 100000000) div 100000) - 1000"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(countDistinct(col("bal_kb")).as("l_div"), count(lit(1)).as("gsz"))
      g.withColumn("l_bucket",
          when(col("l_div") === 1L, "a_1").when(col("l_div") === 2L, "b_2")
            .when(col("l_div") <= 5L, "c_3_5").when(col("l_div") <= 10L, "d_6_10")
            .otherwise("e_gt10"))
        .groupBy("l_bucket")
        .agg(count(lit(1)).as("n_groups"), sum(col("gsz")).as("n_rows"),
          min(col("l_div")).as("min_l"))
        .orderBy("l_bucket")
    }),

    // temporal graph churn: how much of the customer–supplier purchase
    // structure survives the century boundary — persisted/new/dropped
    // edge counts and the edge-set Jaccard in ppm. Edge half-membership
    // folds to min/max flags in ONE edge-keyed partial-agg'd shuffle; no
    // edge-set self-join, no second scan
    "q177_edge_churn" -> ((s, d) => {
      val e = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"),
          (Tables.epochUs(col("o_orderdate")) >= lit(Jan1_00)).cast("long").as("h"))
      e.groupBy("src", "dst").agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .agg(
          sum(when(col("h0") === 0L && col("h1") === 1L, 1L).otherwise(0L))
            .as("n_persisted"),
          sum(when(col("h0") === 1L, 1L).otherwise(0L)).as("n_new"),
          sum(when(col("h1") === 0L, 1L).otherwise(0L)).as("n_dropped"))
        .select(col("n_persisted"), col("n_new"), col("n_dropped"),
          expr("(n_persisted * 1000000) div (n_persisted + n_new + n_dropped)")
            .as("jaccard_ppm"))
    }),

    // market-basket association rules (Agrawal-Srikant 2-itemset form):
    // confidence and lift in exact integer ppm over the q53 co-purchase
    // supports. Lift is STAGED ((conf_ppm · N) div supp(cons), the q144
    // floor-per-term convention) so the numerator stays ≤ 10⁶·N — safe in
    // a long at any corpus size, where the single-expression form
    // 10⁶·s·N would overflow at ~10⁹ baskets. Top 50 by (lift, ante,
    // cons) — a TakeOrdered, never a full sort
    "q178_association_rules" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        .localCheckpoint(true)
      val edges = GraphAlgorithms.cooccurrenceEdges(Tables.lineitem(s, d),
        "l_orderkey", "l_partkey", minSupport = 2L, keepSupport = true)
      val items = li.groupBy("p").agg(count(lit(1)).as("supp"))
      val n = li.agg(countDistinct(col("o")).as("n_orders"))
      edges.select(col("src").as("ante"), col("dst").as("cons"), col("support"))
        .unionByName(edges.select(col("dst").as("ante"), col("src").as("cons"),
          col("support")))
        .join(items.select(col("p").as("ante"), col("supp").as("sa")), "ante")
        .join(items.select(col("p").as("cons"), col("supp").as("sc")), "cons")
        .crossJoin(broadcast(n))
        .withColumn("confidence_ppm", expr("(support * 1000000) div sa"))
        .select(col("ante"), col("cons"), col("support"), col("confidence_ppm"),
          expr("(confidence_ppm * n_orders) div sc").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("ante"), col("cons"))
        .limit(50)
    }),

    // exact p25/p50/p75/p99 ship-delay profile per priority — ONE register
    // pass serves all four ranks via the bucketed two-phase election; no
    // stage sorts more than max(buckets/group, values/bucket) rows
    "q179_delay_quantiles" -> ((s, d) => {
      val delays = shipDelayDays(s, d).withColumn("one", lit(1L))
      Analytics.weightedQuantiles(delays, Seq("o_orderpriority"),
          "delay_days", "one",
          Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L), ("p99", 99L, 100L)))
        .orderBy("o_orderpriority", "quantile")
    }),

    // modularity audit of q66's label-propagation communities on the same
    // brand/type graph — per-community exact-integer Newman contribution
    // (did the partition concentrate edges inside communities?); signed
    // value comes from SUBTRACTION of two non-negative floor-divisions
    "q180_modularity" -> ((s, d) => {
      val bt = Tables.part(s, d).select(
        concat(lit("b:"), col("p_brand")).as("src"),
        concat(lit("t:"), col("p_type")).as("dst"))
      val edges = bt.union(bt.select(col("dst").as("src"), col("src").as("dst")))
      val labels = GraphAlgorithms.labelPropagation(s, edges, iterations = 3)
      GraphAlgorithms.modularityPpm(edges, labels).orderBy("label")
    }),

    // rich-club coefficient on the co-purchase graph (q99's edge set): do
    // high-degree parts preferentially co-occur with each other? One
    // degree aggregate + one two-sided degree join; the 4-row threshold
    // frame broadcasts, so per-k work is a map-side filter
    "q181_rich_club" -> ((s, d) => {
      // no checkpoint here: richClubPpm checkpoints its input internally
      // (r15) — a caller-side one would double-materialize
      val edges = GraphAlgorithms.cooccurrenceEdges(Tables.lineitem(s, d),
        "l_orderkey", "l_partkey", minSupport = 2L, maxBasketSize = 5L)
      GraphAlgorithms.richClubPpm(edges, Seq(2L, 4L, 8L, 16L)).orderBy("k")
    }),

    // t-closeness — the third classic privacy audit next to k-anonymity
    // (q88/q175) and l-diversity (q176), on q176's exact frame: per
    // quasi-identifier group, the total-variation distance (ppm) between
    // the group's sensitive-band distribution and the corpus-wide one.
    // Exact integers: TV·2·n_g·N = Σ_v |n_gv·N − n_v·n_g|, where bands
    // ABSENT from the group contribute their mass in closed form
    // (n_g·(N − Σ_present n_v)) — no dense (group × band) expansion. The
    // ~11-band value table and the 1-row total broadcast; products ride
    // DECIMAL(38,0) so a 10¹⁰-row corpus cannot overflow
    "q182_t_closeness" -> ((s, d) => {
      val rows = Tables.customer(s, d)
        .withColumn("cents", round(col("c_acctbal") * 100).cast("long"))
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("((cents + 100000000) div 100000) - 1000").as("bal_kb"))
      val gv = rows.groupBy("c_nationkey", "c_mktsegment", "bal_kb")
        .agg(count(lit(1)).as("n_gv"))
        // group size via a window over the register frame — the window and
        // the final rollup share the quasi-key exchange
        .withColumn("n_g", sum(col("n_gv"))
          .over(Window.partitionBy("c_nationkey", "c_mktsegment")))
      val v = rows.groupBy("bal_kb").agg(count(lit(1)).as("n_v"))
      val tot = rows.agg(count(lit(1)).as("n_total"))
      gv.join(broadcast(v), "bal_kb").crossJoin(broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment", "n_g", "n_total")
        .agg(sum(abs(col("n_gv").cast("decimal(38,0)") * col("n_total") -
            col("n_v").cast("decimal(38,0)") * col("n_g"))).as("present_dev"),
          sum(col("n_v")).as("sv"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n_g"),
          call_function("div",
            (col("present_dev") +
              col("n_g").cast("decimal(38,0)") * (col("n_total") - col("sv")))
              * 1000000L,
            col("n_g").cast("decimal(38,0)") * col("n_total") * 2L)
            .as("tv_ppm"))
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // two-sample Kolmogorov-Smirnov drift: per event_type, the sup-norm
    // CDF distance between weekend and weekday value distributions —
    // the sup-norm sibling of q89's total-variation drift. Exact integer
    // cross-multiplication: D·n_wd·n_we = max_v |n_we·cum_wd(v) −
    // n_wd·cum_we(v)| over the MERGED value support, one register frame
    // per type (distinct values, never rows); products ride DECIMAL(38,0)
    // so a 10¹⁰-event corpus cannot overflow. Null values excluded BY
    // DEFINITION (CLAUDE.md: events.value has nulls at some SFs); both
    // per-type windows share one exchange.
    "q183_ks_drift" -> ((s, d) => {
      val ev = Tables.events(s, d).where(col("value").isNotNull)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("v"),
          when(dayofweek(timestamp_micros(col("ts_us"))).isin(1, 7), 1L)
            .otherwise(0L).as("we"))
      val cnts = ev.groupBy("event_type", "v")
        .agg(sum(lit(1L) - col("we")).as("c_wd"), sum(col("we")).as("c_we"))
      val wOrd = Window.partitionBy("event_type").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("event_type")
      val cum = cnts
        .withColumn("cum_wd", sum(col("c_wd")).over(wOrd))
        .withColumn("cum_we", sum(col("c_we")).over(wOrd))
        .withColumn("n_wd", sum(col("c_wd")).over(wAll))
        .withColumn("n_we", sum(col("c_we")).over(wAll))
      cum.groupBy("event_type", "n_wd", "n_we")
        .agg(max(abs(col("n_we").cast("decimal(38,0)") * col("cum_wd") -
          col("n_wd").cast("decimal(38,0)") * col("cum_we"))).as("dmax"))
        .select(col("event_type"), col("n_wd"), col("n_we"),
          call_function("div", col("dmax") * 1000000L,
            greatest(col("n_wd").cast("decimal(38,0)") * col("n_we"),
              lit(1L).cast("decimal(38,0)"))).as("ks_ppm"))
        .orderBy("event_type")
    }),

    // Holt double-exponential revenue forecast: the monthly revenue
    // register frame (calendar-bounded — ~80 rows at any corpus size) runs
    // the exact integer level+trend recursion (α = β = 1/4 as rationals,
    // floorDiv ≡ //); the oracle replays the IDENTICAL recursion as a
    // RECURSIVE CTE. One-step-ahead forecast + residual per month.
    "q184_holt_forecast" -> ((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy((year(col("o_orderdate").cast("timestamp")) * 12 +
          month(col("o_orderdate").cast("timestamp"))).as("midx"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      Analytics.holtLinearForecast(m, "midx", "cents").orderBy("midx")
    }),

    // personalized PageRank on q35's brand-type graph, seeded at one brand:
    // restart mass lands only on the seed, so ranks measure random-walk
    // proximity TO Brand#13 — the seeded-relevance / recommendation form
    // of q35 (same exact integer ppm iteration, same operator with the
    // seeds param; q35's uniform case re-verifies in the same gate)
    "q185_personalized_pagerank" -> ((s, d) => {
      import s.implicits._
      val bt = Tables.part(s, d).select(
        concat(lit("b:"), col("p_brand")).as("src"),
        concat(lit("t:"), col("p_type")).as("dst"))
      val edges = bt.union(bt.select(col("dst").as("src"), col("src").as("dst")))
      GraphAlgorithms.pageRankPpm(s, edges, iterations = 10,
          seeds = Some(Seq("b:Brand#13").toDF("vertex")))
        .orderBy("vertex")
    }),


    // Theil–Sen robust trend per event type — the EXACT median of all
    // pairwise slopes of the daily-count series (Sen 1968), the
    // outlier-proof alternative to OLS (q102) for monitoring drift in
    // ingest volume. The slope frame is DAY-PAIR-sized (k·(k−1)/2 per
    // type for a k-day span — 435 at the current 30-day testdata, ~66k
    // for a year; register-sized either way, never corpus²) off one
    // partial-agg'd count shuffle; slopes are integer ppm/day (div ≡ //
    // on negatives — both truncate toward zero), the median is the
    // tie-safe 2·cum ≥ tot register rule, and its total_weight (Σ unit
    // weights) IS the pair count — no second pass over the self-join.
    "q186_theil_sen" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          call_function("div", col("ts_us") - Jan1_24, lit(DayUs)).as("di"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val slopes = daily.select(col("event_type"), col("di").as("i"), col("c").as("ci"))
        .join(daily.select(col("event_type"), col("di").as("j"), col("c").as("cj")),
          Seq("event_type"))
        .filter(col("j") > col("i"))
        .select(col("event_type"),
          call_function("div", (col("cj") - col("ci")) * 1000000L,
            col("j") - col("i")).as("slope_ppm"))
        .withColumn("one", lit(1L))
      Analytics.weightedMedian(slopes, Seq("event_type"), "slope_ppm", "one")
        .select(col("event_type"), col("total_weight").as("n_pairs"),
          col("wmedian").as("theil_sen_ppm"))
        .orderBy("event_type")
    }),


    // Mann–Kendall trend test on daily order revenue — the significance
    // companion to q186's Theil–Sen slope estimate (Mann 1945, Kendall
    // 1975): S = Σ_{i<j} sign(r_j − r_i) over the CALENDAR-bounded daily
    // register frame (~2.4k days whatever the corpus size — the pair join
    // is days², never rows²), with the exact tie-corrected variance
    // 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5). Significance at z=1.96
    // is the cross-multiplied integer test 2500·18·S² ≥ 9604·var18 (no
    // sqrt, no doubles; 1.96² = 9604/2500 exactly) — the q137 σ-band
    // pattern applied to a rank statistic. No continuity correction (the
    // convention is documented here and mirrored in the oracle).
    "q187_mann_kendall" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(call_function("div", Tables.epochUs(col("o_orderdate")),
          lit(DayUs)).as("di"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .localCheckpoint(true)
      val pairs = daily.select(col("di").as("i"), col("cents").as("ci"))
        .crossJoin(broadcast(daily.select(col("di").as("j"), col("cents").as("cj"))))
        .filter(col("j") > col("i"))
      // coalesce: a single-day log has NO pairs and the empty global sum
      // is NULL, while the oracle COALESCEs to 0 (degenerate-world gate r12)
      val sStat = pairs.agg(coalesce(sum(when(col("cj") > col("ci"), 1L)
        .when(col("cj") < col("ci"), -1L).otherwise(0L)), lit(0L)).as("s_stat"))
      val base = daily.agg(count(lit(1)).as("n_days"))
      val tieTerm = daily.groupBy("cents").agg(count(lit(1)).as("t"))
        .agg(coalesce(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L)),
          lit(0L)).as("tie18"))
      base.crossJoin(sStat).crossJoin(tieTerm)
        .withColumn("var18",
          col("n_days") * (col("n_days") - 1L) * (lit(2L) * col("n_days") + 5L)
            - col("tie18"))
        .select(col("n_days"), col("s_stat"), col("var18"),
          when(lit(2500L) * 18L * col("s_stat") * col("s_stat") >=
              lit(9604L) * col("var18"),
            when(col("s_stat") > 0L, lit("increasing")).otherwise(lit("decreasing")))
            .otherwise(lit("none")).as("trend"))
    }),


    // Goodman–Kruskal gamma between line-item quantity and discount — an
    // exact rank-association statistic (concordant vs discordant pairs)
    // computed ENTIRELY on the (quantity, discount-cents) cell register
    // frame: both domains are tiny (≤50 × ≤11 values), so the corpus-sized
    // pair space collapses to ≤ 550² cell pairs with nc/nd as products of
    // cell counts — one map-side-combinable groupBy, then a broadcast
    // self-join of a ~550-row register. gamma = (nc−nd)/(nc+nd) needs no
    // sqrt (unlike tau-b), so it stays in exact integer ppm: divide
    // POSITIVE operands, apply the sign by CASE (the q160 rule). Counts
    // ride in decimal(38,0) so nc/nd (Σ products of cell counts ≤ N²/2)
    // cannot overflow before ~1e19 rows; surfaced CAST to BIGINT (q89
    // rule). Denominator clamp greatest(nc+nd, 1): class (a) — an
    // all-ties corpus legally yields nc = nd = 0.
    "q188_rank_concordance" -> ((s, d) => {
      val cells = Tables.lineitem(s, d)
        .groupBy(col("l_quantity").cast("long").as("q"),
          round(col("l_discount") * 100).cast("long").as("dc"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"))
      val agg = cells.select(col("q").as("qa"), col("dc").as("da"), col("n").as("na"))
        .crossJoin(broadcast(cells.select(col("q").as("qb"), col("dc").as("db"),
          col("n").as("nb"))))
        .filter(col("qa") < col("qb"))
        .agg(
          coalesce(sum(when(col("da") < col("db"), col("na") * col("nb"))),
            lit(0L).cast("decimal(38,0)")).as("ncd"),
          coalesce(sum(when(col("da") > col("db"), col("na") * col("nb"))),
            lit(0L).cast("decimal(38,0)")).as("ndd"))
      agg.select(
          col("ncd").cast("long").as("n_concordant"),
          col("ndd").cast("long").as("n_discordant"),
          (when(col("ncd") >= col("ndd"), 1L).otherwise(-1L) *
            call_function("div",
              (when(col("ncd") >= col("ndd"), col("ncd") - col("ndd"))
                .otherwise(col("ndd") - col("ncd"))) * lit(1000000L),
              greatest(col("ncd") + col("ndd"), lit(1L).cast("decimal(38,0)"))))
            .as("gamma_ppm"))
    }),


    // McNemar / paired sign test: did users who were active in BOTH
    // halves of the log shift their purchase VOLUME between halves? The
    // pair per user is (H1 purchase count, H2 purchase count); only the
    // discordant directions carry signal — b = count decreased, c =
    // increased, ties drop out (the sign-test form of McNemar; the
    // binary purchased-at-all flags were probed first and are CONCORDANT
    // for every paired user on this corpus — a flag test would be
    // degenerate, the round-9 probe-the-data rule). χ²₁ = (b−c)²/(b+c)
    // at the 1.96² level is the cross-multiplied integer test
    // 2500·(b−c)² ≥ 9604·(b+c) (the q187/q137 convention, no continuity
    // correction); b+c = 0 is legal and must NOT read as significant —
    // the explicit b+c > 0 guard, both engines. One user-keyed partial
    // agg against a broadcast midpoint register.
    "q189_mcnemar" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val mid = ev.agg(call_function("div",
        min(col("ts_us")) + max(col("ts_us")), lit(2L)).as("mid_us"))
      val per = ev.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(
          max(when(col("ts_us") < col("mid_us"), 1L).otherwise(0L)).as("a1"),
          max(when(col("ts_us") >= col("mid_us"), 1L).otherwise(0L)).as("a2"),
          sum(when(col("ts_us") < col("mid_us") &&
            col("event_type") === "purchase", 1L).otherwise(0L)).as("p1"),
          sum(when(col("ts_us") >= col("mid_us") &&
            col("event_type") === "purchase", 1L).otherwise(0L)).as("p2"))
        .filter(col("a1") === 1L && col("a2") === 1L)
      per.agg(count(lit(1)).as("n_paired"),
          sum(when(col("p1") > col("p2"), 1L).otherwise(0L)).as("b"),
          sum(when(col("p2") > col("p1"), 1L).otherwise(0L)).as("c"))
        .select(col("n_paired"), col("b"), col("c"),
          (col("b") + col("c") > 0L &&
            lit(2500L) * (col("b") - col("c")) * (col("b") - col("c")) >=
              lit(9604L) * (col("b") + col("c"))).as("significant"))
    }),


    // Cramér's V effect size for q144's day-of-week × event-type
    // contingency — significance (χ² vs dof) says WHETHER the association
    // is real, V says HOW STRONG on a 0..1 scale comparable across table
    // shapes: V² = (χ²/N)/min(r−1, c−1). Single-sourced on the same
    // chi2DowType register as q144 (the χ² value in this row is
    // BYTE-IDENTICAL to q144's), one extra floor division for v_sq_ppm.
    "q190_cramers_v" -> ((s, d) => {
      chi2DowType(s, d)
        .select(col("chi2_ppm"),
          ((col("n_dow") - 1L) * (col("n_types") - 1L)).as("dof"),
          col("nn").as("n_events"),
          // clamp class (a): a single-day or single-type corpus is legal
          // and makes min(r-1, c-1) = 0 — the sweep-rule greatest guard,
          // a no-op on current data, mirrored in the oracle
          call_function("div", col("chi2_ppm"),
            greatest(col("nn") * least(col("n_dow") - 1L, col("n_types") - 1L),
              lit(1L)))
            .as("v_sq_ppm"))
    }),


    // the ACF LADDER: daily-volume autocorrelation at lags 1/2/3/7 in one
    // result — the full correlogram q105 samples at a single lag (lag-7
    // vs lag-1..3 separates weekly seasonality from short-memory decay).
    // One calendar-bounded daily register (checkpointed: 4 lag joins read
    // it), each lag an equi-join of the register against its shift, all
    // moments exact decimals through groupedCorrelation (q95/q105
    // machinery), one canonical double per series at the surface.
    "q191_acf_ladder" -> ((s, d) => {
      val dc = Tables.events(s, d)
        .groupBy(call_function("div", col("ts_us"), lit(DayUs)).as("di"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      Seq(1, 2, 3, 7).map { lag =>
        val pairs = dc.select(col("di"), col("n").as("n0"))
          .join(dc.select((col("di") + lag.toLong).as("di"), col("n").as("nl")),
            "di")
        // global agg + literal after, NOT groupBy(literal): an empty lag
        // join must still emit its (n=0, corr NULL) row like the oracle's
        // global-aggregate CTE (degenerate-world gate r12)
        Analytics.groupedCorrelation(pairs, Seq.empty, "n0", "nl")
          .withColumn("series", lit(s"day_lag$lag"))
      }.reduce(_ unionByName _).orderBy("series")
    }),


    // DAY-OF-WEEK seasonal index — the multiplicative factor table
    // (dow mean / grand mean, cross-multiplied to exact ppm on
    // decimal(38,0) — no mean is ever materialized) that q183's KS drift
    // and q191's ACF presuppose; idx 1e6 = flat. Denominator class (c):
    // a dow row implies n_days ≥ 1 and its events contribute to the
    // total.
    "q201_dow_seasonality" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val daily = Tables.events(s, d)
        .groupBy(call_function("div", col("ts_us"), lit(DayUs)).as("di"))
        .agg(count(lit(1)).as("n"))
        .withColumn("dow", (col("di") + 4L) % 7L)
      val per = daily.groupBy("dow")
        .agg(count(lit(1)).as("n_days"), sum(col("n")).as("n_events"))
      per
        .withColumn("td", sum(col("n_days")).over(Window.partitionBy()))
        .withColumn("te", sum(col("n_events")).over(Window.partitionBy()))
        .select(col("dow"), col("n_days"), col("n_events"),
          call_function("div",
            dec(col("n_events")) * dec(lit(1000000L)) * dec(col("td")),
            dec(col("n_days")) * dec(col("te"))).as("idx_ppm"))
        .orderBy("dow")
    }),


    // DETERMINISTIC BOOTSTRAP confidence interval for mean daily revenue —
    // resampling inference with ZERO RNG: resample b draws day-slot j's
    // replacement via md5Hash60(b:j) mod n_days (rule-4 60-bit md5 longs,
    // bit-identical in both engines), so the B=200 bootstrap means — and
    // hence the CI — are exact integers reproducible anywhere. CI bounds
    // are the 5th and 196th order statistics of the 200 resample means
    // (≈2.5%/97.5%, ties broken by resample id). Scale shape: the corpus
    // reduces to the calendar-day register FIRST; draws are B×D register
    // rows (the hash pick is row-local), one rk-keyed equi-join, one
    // B-sized groupBy — never corpus-sized resamples. div by n_days is
    // class (c): a draw row exists only if the register is non-empty.
    "q205_bootstrap_ci" -> ((s, d) => {
      val B = 200
      val daily = Tables.orders(s, d)
        .groupBy(call_function("div", Tables.epochUs(col("o_orderdate")),
          lit(DayUs)).as("di"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
      val ranked = daily
        .withColumn("rk",
          row_number().over(Window.orderBy("di")).cast("long") - 1L)
        .localCheckpoint(true)
      val nd = ranked.agg(count(lit(1)).as("n_days"),
        coalesce(sum(col("rev")), lit(0L)).as("tot"))
      val draws = s.range(B).select(col("id").as("b"))
        .crossJoin(ranked.select(col("rk").as("j")))
        .crossJoin(broadcast(nd))
        .select(col("b"), col("n_days"),
          (md5Hash60(concat_ws(":", col("b"), col("j"))) % col("n_days"))
            .as("idx"))
      val means = draws
        .join(ranked.select(col("rk").as("idx"), col("rev")), "idx")
        .groupBy("b", "n_days")
        .agg(sum(col("rev")).as("sm"))
        .select(col("b"), expr("sm div n_days").as("mean_b"))
      val ob = means.withColumn("rn",
        row_number().over(Window.orderBy(col("mean_b"), col("b"))))
      // the CI picks ride GLOBAL aggregates (min over the rn filter), not
      // crossJoins of filtered frames: an EMPTY orders table (legal — the
      // greatest clamp below exists for it) must still emit the one
      // (n_days=0, NULL, NULL) row the oracle's scalar subqueries produce
      val ci = ob.agg(
        min(when(col("rn") === 5, col("mean_b"))).as("ci_lo_cents"),
        min(when(col("rn") === 196, col("mean_b"))).as("ci_hi_cents"))
      nd.crossJoin(broadcast(ci))
        // greatest-clamp class (a): an empty orders table is legal (tot=0)
        .select(col("n_days"),
          expr("tot div greatest(n_days, 1)").as("point_mean_cents"),
          col("ci_lo_cents"), col("ci_hi_cents"))
    }),


    // PARTITION-SKEW AUDIT across the three hot key spaces — the
    // operational query a 100 TB operator runs BEFORE choosing salt
    // buckets (Skew.saltedCountSum/saltedJoin) or a bucketed layout:
    // per keyspace, key cardinality, the top-1 key's row share (ppm),
    // inverse-Simpson effective key count (1e6·n²/Σc² — how many "equally
    // hot" keys the distribution behaves like), and the salt-bucket
    // suggestion ceil(32·top1/n)+… = (top1·32 div n)+1 that caps any one
    // (key, salt) cell near an even 32-way split. Everything reduces to
    // one count-register per keyspace; global aggregates with the
    // keyspace literal attached AFTER (degen class b), div denominators
    // greatest-clamped (class a — an empty table is legal). Distinct from
    // q119, which concentrates revenue WEIGHT within segments; this
    // audits ROW routing for partition planning.
    "q207_key_skew_audit" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      def audit(df: DataFrame, key: String, label: String): DataFrame = {
        val reg = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        reg.agg(
            count(lit(1)).as("n_keys"),
            coalesce(sum(col("c")), lit(0L)).as("n_rows"),
            coalesce(max(col("c")), lit(0L)).as("top1_rows"),
            coalesce(sum(dec(col("c")) * dec(col("c"))),
              lit(0L).cast("decimal(38,0)")).as("__s2"))
          .select(lit(label).as("keyspace"), col("n_keys"), col("n_rows"),
            col("top1_rows"),
            expr("(top1_rows * 1000000) div greatest(n_rows, 1)")
              .as("top1_share_ppm"),
            call_function("div",
              dec(col("n_rows")) * dec(col("n_rows")) * lit(1000000L),
              greatest(col("__s2"), lit(1L).cast("decimal(38,0)")))
              .as("eff_keys_ppm"),
            (expr("(top1_rows * 32) div greatest(n_rows, 1)") + 1L)
              .as("salt_buckets"))
      }
      audit(Tables.events(s, d), "user_id", "events.user_id")
        .unionByName(audit(Tables.orders(s, d), "o_custkey",
          "orders.o_custkey"))
        .unionByName(audit(Tables.lineitem(s, d), "l_partkey",
          "lineitem.l_partkey"))
        .orderBy("keyspace")
    }),

    // REGISTRY WIRE FRAME, the oracle-able half of §2.6a (r12 verdict #6):
    // frames are built IN-PLAN by GraftFunctions.wrapRegistry — pinned
    // byte-identical to AvroBridge.frame (magic 0x00 ‖ schema id BE32 ‖
    // payload, reference AvroSerde.scala:123-138) by AvroBridgeSpec — and
    // decoded back with the engine's own header readers (registrySchemaId,
    // binary substring + hex), while the oracle assembles the same frame
    // as a hex STRING from printf/substr and decodes via '0x'-cast. Any
    // drift in the header layout (magic value, id width, endianness)
    // breaks either the spec or this hash. The Avro payload body stays
    // spec-only (NUL bytes are un-oracle-able — the sha256-VARCHAR
    // closure, CLAUDE.md r6).
    "q206_wire_frame" -> ((s, d) => {
      val framed = Tables.documents(s, d)
        .select(col("doc_id"),
          GraftFunctions.wrapRegistry(col("text").cast("binary"),
            (col("doc_id") % 1000L).cast("int")).as("frame"))
      framed.select(col("doc_id"),
        lower(hex(substring(col("frame"), 1, 5))).as("hdr_hex"),
        (hex(substring(col("frame"), 1, 1)) === "00").as("magic_ok"),
        GraftFunctions.registrySchemaId(col("frame")).cast("long")
          .as("schema_id"),
        (length(col("frame")) - 5).cast("long").as("payload_len"))
        .orderBy("doc_id")
    }),

    // §2.6c SERDE COERCIONS oracled on their ASCII-safe projections (r13
    // verdict #3 — the q206 move, promoting the last oracle-able serde
    // row): deterministic uuid text / enum symbol / fixed(8) bytes are
    // derived from md5 hex per doc, pushed through REAL single-field Avro
    // encode→decode round trips (AvroBridge.coercionAudit — the record
    // body of a single-field record IS the coerced wire form), and the
    // surfaced wire/roundtrip columns are compared against DuckDB's
    // independent hex/string assembly of the same coercion definitions
    // (reference AvroRecord.scala:443-509: fixed(16)+uuid ⇄ canonical
    // text, enum ⇄ symbol, @Fixed ⇄ bytes). A uuid byte-order bug, enum
    // index-lookup bug, or fixed passthrough bug changes the wire hex; a
    // decode-direction bug changes the _rt columns. Multi-field Avro
    // bodies stay spec-only (NUL-bearing varint framing — the
    // sha256-VARCHAR closure, CLAUDE.md r6).
    "q208_serde_coerce" -> ((s, d) => {
      val in = Tables.documents(s, d).select(col("doc_id"),
          md5(concat_ws("", lit("u:"), col("doc_id"))).as("h"),
          pmod(col("doc_id"), lit(4L)).as("ki"),
          unhex(substring(md5(concat_ws("", lit("f:"), col("doc_id"))), 1, 16))
            .as("f8"))
        .select(col("doc_id").cast("long").as("doc_id"),
          concat_ws("-", substring(col("h"), 1, 8), substring(col("h"), 9, 4),
            substring(col("h"), 13, 4), substring(col("h"), 17, 4),
            substring(col("h"), 21, 12)).as("uuid_text"),
          when(col("ki") === 0, "HTML").when(col("ki") === 1, "PDF")
            .when(col("ki") === 2, "TXT").otherwise("MD").as("enum_sym"),
          col("f8"))
      graft.serde.AvroBridge.coercionAudit(in, Seq("HTML", "PDF", "TXT", "MD"))
        .select(col("doc_id"),
          lower(hex(col("uuid_wire"))).as("uuid_wire_hex"),
          col("uuid_rt"),
          lower(hex(col("enum_wire"))).as("enum_wire_hex"),
          col("enum_rt"),
          lower(hex(col("fixed_wire"))).as("fixed_wire_hex"))
        .orderBy("doc_id")
    }),

    // CRAMÉR–VON MISES two-sample drift between early and late order
    // prices (q183's KS companion: CvM integrates the SQUARED ECDF gap
    // over the pooled sample, so it is sensitive to distributed shape
    // drift a single max-gap statistic can miss). Exact on the
    // distinct-price register: with per-value counts (a,b), cumulative
    // (A,B) and totals (n,m), T = Σ (a+b)·(A·m − B·n)² / (n·m·N²) — all
    // integer on decimal(38,0), ONE division with the full decimal
    // divisor (staging through an intermediate BIGINT quotient would
    // ANSI-overflow on a legal maximal-drift input — caught by the r12
    // review pass). Overflow headroom is bound by the NUMERATOR, not the
    // divisor (r12 advice): s2 ≤ N⁵/16 on a maximal-drift input, so
    // s2·1e6 crosses decimal(38) at roughly N ≈ 4e6 POOLED rows —
    // beyond that, pre-aggregate prices into coarser cells (the
    // modularity headroom rule) before this statistic. Empty side ⇒ T
    // undefined ⇒ NULL (CASE'd both engines — the degenerate single-day
    // world takes this branch). Decision at the α=0.05 value 0.461.
    "q204_cvm_drift" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val C = 899251200000000L // 1998-07-01T00:00:00Z
      val reg = Tables.orders(s, d)
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"),
          (Tables.epochUs(col("o_orderdate")) < C).as("isx"))
        .groupBy("cents")
        .agg(sum(when(col("isx"), 1L).otherwise(0L)).as("a"),
          sum(when(!col("isx"), 1L).otherwise(0L)).as("b"))
      // two-level cumulative sums on the near-unique price register (the
      // q110 bucket shape — r12 verdict: a global Window.orderBy over the
      // ~corpus-sized register is ONE task at any scale): per-bucket
      // (cents >> 12) sums, EXCLUSIVE prefix over the ~domain/4096 bucket
      // frame, then within-bucket cumulative windows PARTITIONED by
      // bucket — ca/cb identical by associativity of +, no global
      // single-task sort. shiftright is floor-division (bucket order
      // monotone in cents even below 0 — r10 rule); cents is non-null by
      // construction (o_totalprice NOT NULL), which the bucket equi-join
      // requires (null bucket would silently drop — q110 rule).
      val bucketed = reg.withColumn("bk", shiftright(col("cents"), 12))
      val wPre = Window.orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
      val pre = bucketed.groupBy("bk")
        .agg(sum(col("a")).as("sa"), sum(col("b")).as("sb"))
        .select(col("bk"),
          coalesce(sum(col("sa")).over(wPre), lit(0L)).as("pa"),
          coalesce(sum(col("sb")).over(wPre), lit(0L)).as("pb"))
      val wIn = Window.partitionBy("bk").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = bucketed.join(pre, "bk")
        .withColumn("ca", col("pa") + sum(col("a")).over(wIn))
        .withColumn("cb", col("pb") + sum(col("b")).over(wIn))
      val tot = reg.agg(
        coalesce(sum(col("a")), lit(0L)).as("n_x"),
        coalesce(sum(col("b")), lit(0L)).as("n_y"))
      val gap = dec(col("ca")) * dec(col("n_y")) - dec(col("cb")) * dec(col("n_x"))
      val s2f = cum.crossJoin(broadcast(tot))
        .agg(coalesce(sum(dec(col("a") + col("b")) * gap * gap),
          lit(0L).cast("decimal(38,0)")).as("s2"))
      val cvm = call_function("div", col("s2") * lit(1000000L),
        dec(col("n_x")) * dec(col("n_y")) *
          dec(col("n_x") + col("n_y")) * dec(col("n_x") + col("n_y")))
      tot.crossJoin(broadcast(s2f))
        .select(col("n_x"), col("n_y"),
          when(col("n_x") > 0 && col("n_y") > 0, cvm).as("cvm_ppm"))
        .withColumn("verdict",
          when(col("cvm_ppm").isNull, lit(null).cast("string"))
            .when(col("cvm_ppm") >= 461000L, lit("drift"))
            .otherwise(lit("none")))
    }),


    // RIGHT-CENSORED Nelson–Aalen cumulative hazard of order→ship delay —
    // survival analysis with real censoring (q157's curve is an
    // uncensored lifespan histogram; here items unshipped by the
    // administrative cutoff C are CENSORED at C and leave the risk set
    // without counting as events — dropping them instead would bias the
    // hazard up). Definitions (mirrored in the oracle): rows are
    // ship ≥ order lineitems ordered by C; T_day = (min(ship, C) − order)
    // days, event = shipped ≤ C; per event time t: d(t) events,
    // n(t) = #{T ≥ t} at risk, hazard term d·1e6 div n (n ≥ d ≥ 1
    // structurally, sweep class (c)), H(t) = running sum — the q144
    // staged-floor convention, deterministic on both engines. Everything
    // past the one delay-register groupBy runs on the distinct-delay
    // frame (two windows over ~2.4k register rows, never 600k items).
    "q203_censored_hazard" -> ((s, d) => {
      val C = 915148800000000L // 1999-01-01T00:00:00Z
      val base = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(Tables.epochUs(col("o_orderdate")).as("order_us"),
          Tables.epochUs(col("l_shipdate")).as("ship_us"))
        .filter(col("ship_us") >= col("order_us") && col("order_us") <= C)
        .select(
          expr(s"(least(ship_us, ${C}L) - order_us) div $DayUs").as("t_day"),
          (col("ship_us") <= C).as("event"))
      val reg = base.groupBy("t_day")
        .agg(sum(when(col("event"), 1L).otherwise(0L)).as("d_events"),
          count(lit(1)).as("nt"))
      val atRisk = Window.orderBy(col("t_day").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = Window.orderBy(col("t_day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      reg.withColumn("n_at_risk", sum(col("nt")).over(atRisk))
        .filter(col("d_events") >= 1L)
        .withColumn("hazard_ppm",
          expr("(d_events * 1000000) div n_at_risk"))
        .withColumn("cum_hazard_ppm", sum(col("hazard_ppm")).over(cum))
        .select(col("t_day"), col("d_events"), col("n_at_risk"),
          col("hazard_ppm"), col("cum_hazard_ppm"))
        .orderBy("t_day")
    }),


    // §2.6d DATE-TIME PARSE oracle (VERDICT r11 #7 — the last spec-only
    // row a DuckDB oracle can reach): both reference formats
    // (EventTime.java:92-102 — ISO offset via the default parser, the
    // legacy dd.MM.yyyy HH:mm:ssx via the explicit pattern) parsed by
    // core.EventTimes.parseEventTimeUs on strings DERIVED in-engine from
    // the event log (zero-padded integer component formatting is
    // bit-identical across engines; the '+02:00'/'+02' offsets are
    // appended constants, so the parsed UTC epoch = formatted wall time
    // − 2h on both sides — DuckDB mirrors with strptime %z).
    "q202_event_time_parse" -> ((s, d) => {
      val t = timestamp_micros(col("ts_us"))
      val iso = concat(date_format(t, "yyyy-MM-dd'T'HH:mm:ss"), lit("+02:00"))
      val euro = concat(date_format(t, "dd.MM.yyyy HH:mm:ss"), lit("+02"))
      Tables.events(s, d)
        .select(col("event_id"), iso.as("iso_str"), euro.as("euro_str"),
          graft.core.EventTimes.parseEventTimeUs(iso).as("iso_us"),
          graft.core.EventTimes.parseEventTimeUs(euro).as("euro_us"))
        .orderBy("event_id")
    }),


    // RFM SEGMENTATION — the classic CRM grid: customers scored 1-5 on
    // Recency (last order date), Frequency (order count) and Monetary
    // (spend cents) via NTILE quintiles (the acceptable row-sort; ties
    // broken by custkey so the allocation is a total order on both
    // engines), then the occupied (r, f, m) cells with their population
    // and spend. Everything after the three quintile windows runs on the
    // ≤125-cell grid; spend sums ride decimal(38,0).
    "q200_rfm_segments" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val per = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(Tables.epochUs(col("o_orderdate"))).as("last_us"),
          count(lit(1)).as("freq"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("mon"))
      val scored = per
        .withColumn("r", ntile(5).over(
          Window.orderBy(col("last_us"), col("o_custkey"))))
        .withColumn("f", ntile(5).over(
          Window.orderBy(col("freq"), col("o_custkey"))))
        .withColumn("m", ntile(5).over(
          Window.orderBy(col("mon"), col("o_custkey"))))
      scored.groupBy("r", "f", "m")
        .agg(count(lit(1)).as("n_customers"),
          sum(dec(col("mon"))).cast("long").as("total_cents"))
        .orderBy("r", "f", "m")
    }),


    // CROSS-correlation ladder between the click and purchase daily
    // series at lags −3..+3 — the conversion-delay detector (do clicks
    // LEAD purchases, and by how many days?) completing q191's
    // autocorrelation ladder. Two calendar-bounded daily registers
    // (checkpointed — 7 lag joins read each), every lag one equi-join,
    // exact decimal moments through groupedCorrelation, one canonical
    // double per series.
    "q199_ccf_ladder" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def daily(t: String) = ev.filter(col("event_type") === t)
        .groupBy(call_function("div", col("ts_us"), lit(DayUs)).as("di"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val dc = daily("click")
      val dp = daily("purchase")
      (-3 to 3).map { lag =>
        val tag = if (lag < 0) s"m${-lag}" else s"p$lag"
        val pairs = dc.select(col("di"), col("n").as("x"))
          .join(dp.select((col("di") - lag.toLong).as("di"), col("n").as("y")),
            "di")
        // global agg + literal after, NOT groupBy(literal) — the empty-lag
        // row rule, see q191 (degenerate-world gate r12)
        Analytics.groupedCorrelation(pairs, Seq.empty, "x", "y")
          .withColumn("series", lit(s"lag_$tag"))
      }.reduce(_ unionByName _).orderBy("series")
    }),


    // Wald–Wolfowitz runs test on daily revenue moves: are up/down days
    // RANDOM, or do they streak (momentum) / alternate (mean-reversion)?
    // Zero-diffs drop (the standard convention); R = 1 + sign changes on
    // the surviving sequence. Exact integer significance with no sqrt:
    // Z² = (RN − 2n₁n₂ − N)²·(N−1) / (2n₁n₂(2n₁n₂ − N)), tested at 1.96²
    // as 2500·lhs ≥ 9604·rhs — operands ride decimal(38,0) ≡ HUGEINT
    // (2500·(RN)²·N exceeds int64 past ~1.4k days, the q89 rule), and a
    // one-sided series (2n₁n₂ ≤ N ⇒ σ² ≤ 0) reads NOT significant by the
    // explicit guard. All on the CALENDAR-bounded daily register.
    "q192_runs_test" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(call_function("div", Tables.epochUs(col("o_orderdate")),
          lit(DayUs)).as("di"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val wd = Window.orderBy("di")
      val signs = daily
        .withColumn("diff", col("cents") - lag(col("cents"), 1).over(wd))
        .filter(col("diff").isNotNull && col("diff") =!= 0L)
        .withColumn("sgn", when(col("diff") > 0L, 1L).otherwise(-1L))
      val seq = signs
        .withColumn("prev", lag(col("sgn"), 1).over(Window.orderBy("di")))
        .agg(
          sum(when(col("sgn") === 1L, 1L).otherwise(0L)).as("n_up"),
          sum(when(col("sgn") === -1L, 1L).otherwise(0L)).as("n_down"),
          (lit(1L) + sum(when(col("prev").isNotNull &&
            col("sgn") =!= col("prev"), 1L).otherwise(0L))).as("runs"))
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      seq.select(col("n_up"), col("n_down"), col("runs"),
          (col("n_up") + col("n_down")).as("nn"))
        .select(col("n_up"), col("n_down"), col("runs"),
          (dec(lit(2L)) * dec(col("n_up")) * dec(col("n_down")) > dec(col("nn")) &&
            dec(lit(2500L)) *
              (dec(col("runs")) * dec(col("nn")) -
                dec(lit(2L)) * dec(col("n_up")) * dec(col("n_down")) - dec(col("nn"))) *
              (dec(col("runs")) * dec(col("nn")) -
                dec(lit(2L)) * dec(col("n_up")) * dec(col("n_down")) - dec(col("nn"))) *
              (dec(col("nn")) - dec(lit(1L))) >=
            dec(lit(9604L)) * dec(lit(2L)) * dec(col("n_up")) * dec(col("n_down")) *
              (dec(lit(2L)) * dec(col("n_up")) * dec(col("n_down")) - dec(col("nn"))))
            .as("significant"))
    }),


    // LINK PREDICTION on the co-purchase graph: resource-allocation index
    // (s17's Jaccard companion — RA weights each common neighbor by
    // 1/deg(z) instead of rating endpoint-set overlap, so hub-mediated
    // evidence is discounted, exactly integer, div class (c)). Runs on
    // the UNCAPPED-basket support-2 graph (q53/q193's) where s17 uses the
    // capped one. Hub rule + anti-join + exact ppm live in
    // GraphAlgorithms.resourceAllocationIndex; top-20 under a total order.
    "q194_link_prediction" -> ((s, d) => {
      val edges = GraphAlgorithms.cooccurrenceEdges(
        Tables.lineitem(s, d), "l_orderkey", "l_partkey", minSupport = 2L)
      // no checkpoint here: resourceAllocationIndex checkpoints its input
      // internally (r15) — a caller-side one would double-materialize
      val und = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      GraphAlgorithms.resourceAllocationIndex(und, maxHubDegree = 64L)
        .orderBy(desc("ra_ppm"), col("a"), col("b"))
        .limit(20)
        .select(col("a").as("part_a"), col("b").as("part_b"),
          col("n_common"), col("ra_ppm"))
    }),


    // DURBIN–WATSON statistic on daily revenue — first-order serial
    // correlation of the level series, the companion q191 (ACF) and q192
    // (runs test) don't cover: DW = Σ(xᵢ−xᵢ₋₁)² / Σ(xᵢ−x̄)², exact in ppm
    // via the centered-moment identity Σ(x−x̄)² = (N·Σx² − S²)/N ⇒
    // DW_ppm = 1e6·N·ΣΔ² div (N·Σx² − S²) — no mean, no doubles. Daily
    // cents ride decimal(38,0) ≡ HUGEINT (x² ~ 1e19 exceeds int64 at
    // sf0.1 already — the q89 rule). DW ≈ 2e6 means white noise, → 0
    // momentum, → 4e6 mean-reversion. Clamp class (a): a constant series
    // (all days equal) is legal and zeroes the centered moment.
    "q195_durbin_watson" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val daily = Tables.orders(s, d)
        .groupBy(call_function("div", Tables.epochUs(col("o_orderdate")),
          lit(DayUs)).as("di"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      val wd = Window.orderBy("di")
      daily
        .withColumn("dx", col("x") - lag(col("x"), 1).over(wd))
        .agg(count(lit(1)).as("n"), sum(dec(col("x"))).as("sx"),
          sum(dec(col("x")) * dec(col("x"))).as("sxx"),
          // coalesce: the empty-input global sum is NULL while the oracle
          // COALESCEs (degen class c; empty-world gate)
          coalesce(sum(when(col("dx").isNotNull, dec(col("dx")) * dec(col("dx")))
            .otherwise(dec(lit(0L)))), dec(lit(0L))).as("sdd"))
        .select(col("n").as("n_days"),
          call_function("div", dec(lit(1000000L)) * dec(col("n")) * col("sdd"),
            greatest(dec(col("n")) * col("sxx") - col("sx") * col("sx"),
              dec(lit(1L)))).as("dw_ppm"))
    }),


    // GINI COEFFICIENT of customer spend — the one-number revenue
    // concentration audit (companion to q70's heavy hitters). Register
    // form: group customers by exact spend value, then Gini =
    // (2·Σ rank·x − (N+1)·Σx) / (N·Σx) where a tie group spanning ranks
    // [cb+1, cb+n] contributes x·(n·cb + n(n+1)/2) — the s43 doubled-rank
    // trick, so NO row-level sort ever happens (the ordered window runs
    // over the distinct-value register; t34's token Gini row-ranks its
    // type table — this is the shape that survives a near-unique value
    // domain at scale). Products ride decimal(38,0) ≡
    // HUGEINT (N·S exceeds int64 past ~1e6 customers — the q89 rule);
    // clamp class (a): a single zero-spend corpus makes N·S = 0.
    "q196_gini_concentration" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val reg = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
        .groupBy("v").agg(count(lit(1)).as("n"))
      val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val c = reg
        .withColumn("cb", coalesce(sum(col("n")).over(w), lit(0L)))
        .select(
          (dec(col("v")) * (dec(col("n")) * dec(col("cb")) +
            dec(call_function("div", col("n") * (col("n") + 1L), lit(2L)))))
            .as("sr"),
          (dec(col("v")) * dec(col("n"))).as("sv"), col("n"))
      c.agg(sum(col("n")).as("nl"), sum(col("sv")).as("s"),
          sum(col("sr")).as("srr"))
        .select(col("nl").as("n_customers"),
          col("s").cast("long").as("total_cents"),
          call_function("div",
            dec(lit(1000000L)) * (dec(lit(2L)) * col("srr") -
              (dec(col("nl")) + dec(lit(1L))) * col("s")),
            greatest(dec(col("nl")) * col("s"), dec(lit(1L))))
            .as("gini_ppm"))
    }),


    // LORENZ CURVE by spend decile — q196's distributional companion (the
    // Gini IS twice the area between this curve and the diagonal): NTILE
    // allocation over (spend, custkey) — the one acceptable row-sort
    // shape, the sort IS the semantics (s44/q120 rule) — then per-decile
    // share and cumulative share of total spend in exact ppm. Sums ride
    // decimal(38,0) ≡ HUGEINT (1e6·total overflows int64 at sf1 scale);
    // clamp class (a): an all-zero-spend corpus zeroes the total.
    "q198_lorenz_deciles" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      val byDecile = spend
        .withColumn("decile",
          ntile(10).over(Window.orderBy(col("v"), col("o_custkey"))))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_customers"), sum(dec(col("v"))).as("s"))
      val wcum = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      byDecile
        .withColumn("cum", sum(col("s")).over(wcum))
        .withColumn("tot", sum(col("s")).over(Window.partitionBy()))
        .select(col("decile"), col("n_customers"),
          col("s").cast("long").as("cents"),
          call_function("div", dec(lit(1000000L)) * col("s"),
            greatest(col("tot"), dec(lit(1L)))).as("share_ppm"),
          call_function("div", dec(lit(1000000L)) * col("cum"),
            greatest(col("tot"), dec(lit(1L)))).as("cum_share_ppm"))
        .orderBy("decile")
    }),


    // COHEN'S KAPPA between the declared document language and the
    // stopword language-ID prediction — chance-corrected agreement over
    // t17's confusion matrix (the pred CTE is t1/t17's, single-sourced via
    // TextAnalysis.predictedLangCol / langScoresSql so the three queries
    // can never drift). κ = (N·diag − Σ row·col) / (N² − Σ row·col) in
    // truncating-division ppm (κ can be negative; both engines truncate
    // toward zero — the q89/CLAUDE.md convention). Marginal products ride
    // decimal(38,0) ≡ HUGEINT (N² ppm exceeds int64 past ~3e6 docs).
    // Clamp class (a): a single-label corpus with perfect agreement makes
    // N² = Σ row·col.
    "q197_lang_id_kappa" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val cells = Tables.documents(s, d)
        .select(col("lang").as("actual"),
          TextAnalysis.predictedLangCol(col("text")).as("pred"))
        .groupBy("actual", "pred").agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val tot = cells.agg(sum(col("n")).as("nn"))
      val diag = cells.filter(col("actual") === col("pred"))
        .agg(coalesce(sum(col("n")), lit(0L)).as("diag"))
      val rowm = cells.groupBy("actual").agg(sum(col("n")).as("r"))
      val colm = cells.groupBy("pred").agg(sum(col("n")).as("c"))
      val src = rowm.join(colm, rowm("actual") === colm("pred"))
        .agg(coalesce(sum(dec(col("r")) * dec(col("c"))), dec(lit(0L))).as("src"))
      tot.crossJoin(broadcast(diag)).crossJoin(broadcast(src))
        .select(col("nn").as("n_docs"), col("diag").as("n_agree"),
          call_function("div",
            dec(lit(1000000L)) * (dec(col("nn")) * dec(col("diag")) - col("src")),
            greatest(dec(col("nn")) * dec(col("nn")) - col("src"), dec(lit(1L))))
            .as("kappa_ppm"))
    }),

  )

  val oracles: Map[String, String] = Map(

    // lag gaps, then the q110 median frame with unit weights
    "q127_purchase_cadence" ->
      s"""WITH o AS (SELECT c_mktsegment, o_custkey, o_orderkey,
         |    epoch_us(o_orderdate) AS od_us
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |g AS (SELECT c_mktsegment,
         |    (od_us - lag(od_us) OVER (PARTITION BY o_custkey
         |      ORDER BY od_us, o_orderkey)) // $DayUs AS gap_days
         |  FROM o),
         |gg AS (SELECT * FROM g WHERE gap_days IS NOT NULL),
         |w AS (SELECT c_mktsegment, gap_days,
         |    CAST(COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY gap_days)
         |      AS BIGINT) AS cum,
         |    CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS tot
         |  FROM gg)
         |SELECT c_mktsegment, COUNT(*) AS n,
         |  MIN(CASE WHEN cum*2 >= tot THEN gap_days END) AS median_gap_days
         |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,


    // q93's sessionization + boolean-max flags per session
    "q125_session_conversion" ->
      s"""WITH flagged AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600000000
         |      THEN 1 ELSE 0 END AS new_s
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         |sess AS (SELECT user_id, ts_us, event_type,
         |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM flagged),
         |fl AS (SELECT user_id, session_seq, MIN(ts_us) AS t0,
         |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS had_click,
         |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS had_purchase
         |  FROM sess GROUP BY 1, 2)
         |SELECT t0 // $WeekUs AS week, COUNT(*) AS n_click_sessions,
         |  CAST(SUM(had_purchase) AS BIGINT) AS n_converted,
         |  CAST((CAST(SUM(had_purchase) AS BIGINT) * 1000000) // COUNT(*) AS BIGINT)
         |    AS conv_ppm
         |FROM fl WHERE had_click = 1
         |GROUP BY 1 ORDER BY 1""".stripMargin,


    // EXISTS as a semi-join on the order key
    "q126_priority_late" ->
      """SELECT o_orderpriority, COUNT(*) AS n_late_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND epoch_us(l_shipdate) - epoch_us(o_orderdate) > 2592000000000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // descending cumulative share; the pre-threshold test keeps the
    // crossing row (pre·5 < tot·4 ⟺ the row before it was under 80%)
    "q124_pareto_8020" ->
      """WITH r AS (SELECT c_mktsegment, c_custkey,
        |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |w AS (SELECT c_mktsegment, cents,
        |    CAST(SUM(cents) OVER (PARTITION BY c_mktsegment
        |      ORDER BY cents DESC, c_custkey ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(SUM(cents) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS tot
        |  FROM r)
        |SELECT c_mktsegment, COUNT(*) AS n_top,
        |  CAST(MAX((cum * 1000000) // tot) AS BIGINT) AS covered_ppm
        |FROM w WHERE (cum - cents) * 5 < tot * 4
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // same lag window on the (user, amount) partition
    "q123_double_charge" ->
      """WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value) AS BIGINT) AS amt
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |l AS (SELECT *,
        |    lag(ts_us) OVER w AS prev_ts, lag(event_id) OVER w AS prev_id
        |  FROM p WINDOW w AS (PARTITION BY user_id, amt ORDER BY ts_us, event_id))
        |SELECT user_id, amt, prev_id AS first_event_id,
        |  event_id AS second_event_id, ts_us - prev_ts AS gap_us
        |FROM l WHERE prev_ts IS NOT NULL AND ts_us - prev_ts <= 86400000000
        |ORDER BY user_id, second_event_id""".stripMargin,


    // q53's triangle CTEs + the degree-table wedge sum
    "q122_clustering_coeff" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT x.p AS a, y.p AS b
        |      FROM li0 x JOIN li0 y ON x.o = y.o AND x.p < y.p
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM
        |          (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        |        GROUP BY v),
        |r AS (SELECT e.a, e.b, da.d*1000000000 + e.a AS ra, db.d*1000000000 + e.b AS rb
        |      FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v),
        |o AS (SELECT CASE WHEN ra < rb THEN a ELSE b END AS src,
        |             CASE WHEN ra < rb THEN b ELSE a END AS dst,
        |             greatest(ra, rb) AS rd FROM r),
        |w AS (SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
        |      FROM o o1 JOIN o o2 ON o1.src = o2.src AND o1.rd < o2.rd),
        |tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |  FROM w JOIN o ON w.v = o.src AND w.w = o.dst),
        |wd AS (SELECT CAST(SUM((d*(d-1))//2) AS BIGINT) AS n_wedges FROM deg)
        |SELECT n_triangles, n_wedges,
        |  (n_triangles*3)::DOUBLE / n_wedges::DOUBLE AS transitivity
        |FROM tr, wd""".stripMargin,


    // q14's union-tag carry in BOTH directions over the same window order;
    // the distance compare is row-local CASE arithmetic
    "q121_nearest_click" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, 1 AS side, event_id,
        |         NULL::BIGINT AS c_event_id, NULL::BIGINT AS c_ts_us
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), 0, NULL, event_id, epoch_us(ts)
        |  FROM events WHERE event_type = 'click'
        |), w AS (
        |  SELECT *,
        |    last_value(c_event_id IGNORE NULLS) OVER wb AS b_id,
        |    last_value(c_ts_us IGNORE NULLS) OVER wb AS b_ts,
        |    first_value(c_event_id IGNORE NULLS) OVER wf AS f_id,
        |    first_value(c_ts_us IGNORE NULLS) OVER wf AS f_ts
        |  FROM u
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts_us, side, c_event_id
        |    ROWS UNBOUNDED PRECEDING),
        |  wf AS (PARTITION BY user_id ORDER BY ts_us, side, c_event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT event_id, user_id, ts_us,
        |  CASE WHEN b_ts IS NULL THEN f_id WHEN f_ts IS NULL THEN b_id
        |       WHEN ts_us - b_ts <= f_ts - ts_us THEN b_id ELSE f_id END AS click_event_id,
        |  CASE WHEN b_ts IS NULL THEN f_ts WHEN f_ts IS NULL THEN b_ts
        |       WHEN ts_us - b_ts <= f_ts - ts_us THEN b_ts ELSE f_ts END AS click_ts_us,
        |  abs(ts_us - CASE WHEN b_ts IS NULL THEN f_ts WHEN f_ts IS NULL THEN b_ts
        |       WHEN ts_us - b_ts <= f_ts - ts_us THEN b_ts ELSE f_ts END) AS asof_dist_us
        |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin,


    // ntile ≡ ntile (both: even split, remainder to the first buckets);
    // Spark ntile is INT, DuckDB's BIGINT → cast
    "q120_rfm_segments" ->
      """WITH m AS (SELECT o_custkey, MAX(epoch_us(o_orderdate)) AS last_us,
        |    COUNT(*) AS f,
        |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS mc
        |  FROM orders GROUP BY 1),
        |s AS (SELECT mc,
        |    CAST(ntile(5) OVER (ORDER BY last_us, o_custkey) AS INTEGER) AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY f, o_custkey) AS INTEGER) AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY mc, o_custkey) AS INTEGER) AS m_score
        |  FROM m)
        |SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
        |  CAST(SUM(mc) AS BIGINT) AS rev_cents
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,


    // gaps-and-islands: day − row_number constant within a consecutive run
    "q128_activity_streaks" ->
      s"""WITH days AS (SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day
         |  FROM events),
         |g AS (SELECT user_id, day,
         |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
         |  FROM days),
         |runs AS (SELECT user_id, COUNT(*) AS len FROM g GROUP BY user_id, grp),
         |l AS (SELECT user_id, CAST(MAX(len) AS BIGINT) AS streak_days
         |  FROM runs GROUP BY 1)
         |SELECT streak_days, COUNT(*) AS n_users
         |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,


    // zero-order customers survive the left join with c_count 0
    "q129_custdist" ->
      """WITH c AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT CAST(c_count AS BIGINT) AS c_count, COUNT(*) AS custdist
        |FROM c GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,


    // 3 unrolled HITS rounds; hub/auth are exact alternating-path counts
    "q130_hits" ->
      """WITH e AS (SELECT DISTINCT 'b:' || p_brand AS src, 't:' || p_type AS dst
        |  FROM part),
        |verts AS (SELECT src AS vertex FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT vertex, CAST(1 AS BIGINT) AS hub FROM verts),
        |a1 AS (SELECT dst AS vertex, CAST(SUM(hub) AS BIGINT) AS auth
        |  FROM e JOIN h0 ON src = h0.vertex GROUP BY 1),
        |h1 AS (SELECT src AS vertex, CAST(SUM(auth) AS BIGINT) AS hub
        |  FROM e JOIN a1 ON dst = a1.vertex GROUP BY 1),
        |a2 AS (SELECT dst AS vertex, CAST(SUM(hub) AS BIGINT) AS auth
        |  FROM e JOIN h1 ON src = h1.vertex GROUP BY 1),
        |h2 AS (SELECT src AS vertex, CAST(SUM(auth) AS BIGINT) AS hub
        |  FROM e JOIN a2 ON dst = a2.vertex GROUP BY 1),
        |a3 AS (SELECT dst AS vertex, CAST(SUM(hub) AS BIGINT) AS auth
        |  FROM e JOIN h2 ON src = h2.vertex GROUP BY 1),
        |h3 AS (SELECT src AS vertex, CAST(SUM(auth) AS BIGINT) AS hub
        |  FROM e JOIN a3 ON dst = a3.vertex GROUP BY 1)
        |SELECT v.vertex, COALESCE(h3.hub, 0) AS hub, COALESCE(a3.auth, 0) AS auth
        |FROM verts v LEFT JOIN h3 ON v.vertex = h3.vertex
        |LEFT JOIN a3 ON v.vertex = a3.vertex
        |ORDER BY v.vertex""".stripMargin,


    // return-flag filter first, then the key joins; qSumWide revenue
    "q131_returned_revenue" ->
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))
        |    AS BIGINT) AS DOUBLE)/10000.0 AS lost_revenue,
        |  COUNT(DISTINCT c_custkey) AS n_customers
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1 ORDER BY lost_revenue DESC, n_name""".stripMargin,


    // conditional integer sums per ship month; staged-ppm share
    "q132_promo_share" ->
      """WITH li AS (SELECT epoch_us(date_trunc('month', l_shipdate)) AS month_us,
        |    CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT) AS rc,
        |    CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |m AS (SELECT month_us, CAST(SUM(rc * is_promo) AS BIGINT) AS promo_rc,
        |    CAST(SUM(rc) AS BIGINT) AS total_rc
        |  FROM li GROUP BY 1)
        |SELECT month_us, CAST(promo_rc AS DOUBLE)/10000.0 AS promo_revenue,
        |  CAST((promo_rc * 1000) // (total_rc // 1000) AS BIGINT) AS promo_ppm
        |FROM m ORDER BY month_us""".stripMargin,


    // two bare-value RANKs (tie-deterministic), one integer Spearman distance
    "q133_spearman_balance" ->
      """WITH rev AS (SELECT l_suppkey,
        |    CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))
        |      AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1),
        |sup AS (SELECT CAST(round(s_acctbal*100) AS BIGINT) AS bal,
        |    COALESCE(rev, 0) AS rev
        |  FROM supplier LEFT JOIN rev ON s_suppkey = l_suppkey),
        |r AS (SELECT CAST(RANK() OVER (ORDER BY bal DESC) AS BIGINT) AS r_bal,
        |    CAST(RANK() OVER (ORDER BY rev DESC) AS BIGINT) AS r_rev
        |  FROM sup),
        |agg AS (SELECT COUNT(*) AS n,
        |    CAST(SUM((r_bal - r_rev)*(r_bal - r_rev)) AS BIGINT) AS sum_d2
        |  FROM r)
        |SELECT n, sum_d2,
        |  CAST((6 * sum_d2 * 1000000) // (n * (n * n - 1)) AS BIGINT) AS dist_ppm
        |FROM agg""".stripMargin,


    // q110's tie-safe cumulative median frame with unit weights + moments
    "q134_ship_delay_profile" ->
      s"""WITH de AS (SELECT o_orderpriority,
         |    (epoch_us(l_shipdate) - epoch_us(o_orderdate)) // $DayUs AS delay_days
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |w AS (SELECT o_orderpriority, delay_days,
         |    CAST(COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY delay_days)
         |      AS BIGINT) AS cum,
         |    CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS tot
         |  FROM de)
         |SELECT o_orderpriority, COUNT(*) AS n,
         |  MIN(delay_days) AS min_days,
         |  MIN(CASE WHEN cum*2 >= tot THEN delay_days END) AS median_days,
         |  MAX(delay_days) AS max_days,
         |  CAST((CAST(SUM(delay_days) AS BIGINT) * 1000000) // COUNT(*) AS BIGINT)
         |    AS mean_days_ppm
         |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,


    // q124's pre-threshold classification at the 80% and 95% lines
    "q135_abc_class" ->
      """WITH rev AS (SELECT l_partkey,
        |    CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))
        |      AS BIGINT) AS rc
        |  FROM lineitem GROUP BY 1),
        |w AS (SELECT rc,
        |    CAST(SUM(rc) OVER (ORDER BY rc DESC, l_partkey
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(SUM(rc) OVER () AS BIGINT) AS tot
        |  FROM rev),
        |cl AS (SELECT rc,
        |    CASE WHEN (cum - rc) * 5 < tot * 4 THEN 'A'
        |         WHEN (cum - rc) * 20 < tot * 19 THEN 'B'
        |         ELSE 'C' END AS abc_class
        |  FROM w)
        |SELECT abc_class, COUNT(*) AS n_parts,
        |  CAST(CAST(SUM(rc) AS BIGINT) AS DOUBLE)/10000.0 AS revenue
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin,


    // same co-order edge definition as the k-core/k-truss family
    "q136_degree_histogram" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT x.p AS a, y.p AS b
        |  FROM li0 x JOIN li0 y ON x.o = y.o AND x.p < y.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |s AS (SELECT a AS u FROM e UNION ALL SELECT b FROM e),
        |deg AS (SELECT u, COUNT(*) AS degree FROM s GROUP BY 1)
        |SELECT CAST(degree AS BIGINT) AS degree, COUNT(*) AS n_vertices
        |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin,


    // cross-multiplied |x−μ|>3σ on integer moments; floored-mean ppm
    "q137_control_chart" ->
      s"""WITH daily AS (SELECT epoch_us(ts) // $DayUs AS day, COUNT(*) AS x
         |  FROM events GROUP BY 1),
         |m AS (SELECT COUNT(*) AS nn, CAST(SUM(x) AS BIGINT) AS ss,
         |    CAST(SUM(x*x) AS BIGINT) AS qq
         |  FROM daily)
         |SELECT day, x AS n_events,
         |  CASE WHEN nn*x > ss THEN 'high' ELSE 'low' END AS side,
         |  CAST((x * 1000000) // (ss // nn) AS BIGINT) AS vs_mean_ppm
         |FROM daily, m
         |WHERE (nn*x - ss)*(nn*x - ss) > 4*(nn*qq - ss*ss)
         |ORDER BY day""".stripMargin,


    // leading digit of the exact integer cents
    "q138_benford" ->
      """WITH d AS (SELECT substr(CAST(CAST(round(o_totalprice*100) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS digit
        |  FROM orders),
        |t AS (SELECT COUNT(*) AS n_total FROM d)
        |SELECT digit, COUNT(*) AS n,
        |  CAST((COUNT(*) * 1000000) // n_total AS BIGINT) AS share_ppm
        |FROM d, t GROUP BY digit, n_total ORDER BY digit""".stripMargin,


    // |month ppm − all-time ppm| of floor-division shares; argmax via rn
    "q139_priority_mix_shift" ->
      """WITH o AS (SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
        |    o_orderpriority FROM orders),
        |mc AS (SELECT month_us, o_orderpriority, COUNT(*) AS c FROM o GROUP BY 1, 2),
        |mt AS (SELECT month_us, CAST(SUM(c) AS BIGINT) AS n_m FROM mc GROUP BY 1),
        |ac AS (SELECT o_orderpriority, COUNT(*) AS c_all FROM o GROUP BY 1),
        |at AS (SELECT COUNT(*) AS n_all FROM o),
        |dev AS (SELECT mc.month_us, mc.o_orderpriority,
        |    abs(CAST((mc.c * 1000000) // mt.n_m AS BIGINT)
        |      - CAST((ac.c_all * 1000000) // at.n_all AS BIGINT)) AS dev_ppm
        |  FROM mc JOIN mt USING (month_us) JOIN ac USING (o_orderpriority), at),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY month_us
        |    ORDER BY dev_ppm DESC, o_orderpriority) AS rn FROM dev)
        |SELECT month_us, o_orderpriority, dev_ppm
        |FROM r WHERE rn = 1 ORDER BY month_us""".stripMargin,


    // cross-multiplied 2× rate test on integer hour/global registers
    "q140_error_burst" ->
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour_idx,
        |    COUNT(*) AS n_events,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_errors
        |  FROM events GROUP BY 1),
        |g AS (SELECT CAST(SUM(n_events) AS BIGINT) AS nn,
        |    CAST(SUM(n_errors) AS BIGINT) AS ee FROM h)
        |SELECT hour_idx, n_events, n_errors,
        |  CAST((n_errors * 1000000) // n_events AS BIGINT) AS err_ppm
        |FROM h, g WHERE n_errors * nn > 2 * ee * n_events
        |ORDER BY hour_idx""".stripMargin,


    // max per user vs the broadcast corpus max; cumulative share over the
    // idle-day buckets
    "q141_recency_histogram" ->
      s"""WITH u AS (SELECT user_id, MAX(epoch_us(ts)) AS l FROM events GROUP BY 1),
         |mx AS (SELECT MAX(l) AS m, COUNT(*) AS nt FROM u),
         |h AS (SELECT (m - l) // $DayUs AS days_idle, COUNT(*) AS n_users,
         |    MAX(nt) AS nt
         |  FROM u, mx GROUP BY 1),
         |c AS (SELECT days_idle, n_users, nt,
         |    CAST(SUM(n_users) OVER (ORDER BY days_idle
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
         |  FROM h)
         |SELECT days_idle, n_users,
         |  CAST((cum_users * 1000000) // nt AS BIGINT) AS cum_share_ppm
         |FROM c ORDER BY days_idle""".stripMargin,


    // epoch-day arithmetic dow; purchase propensity in exact ppm
    "q142_weekend_effect" ->
      s"""SELECT ((epoch_us(ts) // $DayUs) + 4) % 7 AS dow,
         |  COUNT(*) AS n_events,
         |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_purchases,
         |  CAST((CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |    AS BIGINT) * 1000000) // COUNT(*) AS BIGINT) AS purchase_ppm
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,


    // strict-past purchase counter cuts journeys; 40/20/40 position credit
    "q143_position_attribution" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS j
        |  FROM events),
        |conv AS (SELECT DISTINCT user_id, j FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT e.user_id, e.j, e.event_type,
        |    ROW_NUMBER() OVER (PARTITION BY e.user_id, e.j
        |      ORDER BY e.ts_us, e.event_id) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY e.user_id, e.j) AS BIGINT) AS cnt
        |  FROM e JOIN conv USING (user_id, j)
        |  WHERE e.event_type != 'purchase'),
        |cr AS (SELECT event_type,
        |    CASE WHEN cnt = 1 THEN 1000000
        |         WHEN cnt = 2 THEN 500000
        |         WHEN rn = 1 OR rn = cnt THEN 400000
        |         ELSE 200000 // (cnt - 2) END AS credit_ppm
        |  FROM t)
        |SELECT event_type, COUNT(*) AS n_touches,
        |  CAST(SUM(credit_ppm) AS BIGINT) AS credit_ppm_total
        |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin,


    // staged per-cell floor terms over the integer contingency registers
    "q144_chi_square" ->
      s"""WITH ev AS (SELECT ((epoch_us(ts) // $DayUs) + 4) % 7 AS dow, event_type
         |  FROM events),
         |obs AS (SELECT dow, event_type, COUNT(*) AS o FROM ev GROUP BY 1, 2),
         |rm AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1),
         |cm AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1),
         |tt AS (SELECT CAST(SUM(o) AS BIGINT) AS nn FROM obs),
         |cells AS (SELECT ((o*nn - r*c)*(o*nn - r*c)) // ((nn*r*c) // 1000000)
         |    AS term_ppm
         |  FROM obs JOIN rm USING (dow) JOIN cm USING (event_type), tt),
         |dims AS (SELECT (SELECT COUNT(*) FROM rm) AS n_dow,
         |    (SELECT COUNT(*) FROM cm) AS n_types)
         |-- scalar-subquery form: ONE row even on an empty log (the Spark
         |-- side is a global aggregate — empty-world gate, degen class b)
         |SELECT (SELECT CAST(SUM(term_ppm) AS BIGINT) FROM cells) AS chi2_ppm,
         |  CAST((n_dow - 1) * (n_types - 1) AS BIGINT) AS dof
         |FROM dims""".stripMargin,


    // month-of-year volume vs the uniform 1/12 expectation
    "q145_seasonality_index" ->
      """WITH o AS (SELECT month(o_orderdate) AS moy FROM orders),
        |t AS (SELECT COUNT(*) AS nt FROM o)
        |SELECT moy, COUNT(*) AS n_orders,
        |  CAST((COUNT(*) * 12 * 1000000) // nt AS BIGINT) AS index_ppm
        |FROM o, t GROUP BY moy, nt ORDER BY moy""".stripMargin,


    // first order month per customer; staged cents-ppm share
    "q146_new_vs_returning" ->
      """WITH o AS (SELECT o_custkey,
        |    epoch_us(date_trunc('month', o_orderdate)) AS month_us,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
        |  FROM orders),
        |f AS (SELECT o_custkey, MIN(month_us) AS fm FROM o GROUP BY 1),
        |m AS (SELECT month_us,
        |    CAST(SUM(CASE WHEN month_us = fm THEN cents ELSE 0 END) AS BIGINT)
        |      AS new_cents,
        |    CAST(SUM(cents) AS BIGINT) AS total_cents
        |  FROM o JOIN f USING (o_custkey) GROUP BY 1)
        |SELECT month_us, CAST(new_cents AS DOUBLE)/100.0 AS new_revenue,
        |  CAST(total_cents - new_cents AS DOUBLE)/100.0 AS returning_revenue,
        |  CAST((new_cents * 1000) // (total_cents // 1000) AS BIGINT)
        |    AS new_share_ppm
        |FROM m ORDER BY month_us""".stripMargin,


    // prefix-sum balance, prefix-max peak, deepest peak-to-trough gap
    "q147_max_drawdown" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT user_id, ts_us, event_id,
        |    CAST(SUM(cents) OVER w AS BIGINT) AS bal
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING)),
        |dd AS (SELECT user_id,
        |    CAST(MAX(bal) OVER w AS BIGINT) - bal AS dd
        |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT user_id, COUNT(*) AS n_points,
        |  CAST(MAX(dd) AS BIGINT) AS max_drawdown_cents
        |FROM dd GROUP BY 1
        |ORDER BY max_drawdown_cents DESC, user_id LIMIT 20""".stripMargin,


    // bit_or-packed day presence; TINYINT bit_count widened to INTEGER
    "q148_activity_bitmap" ->
      s"""WITH days AS (SELECT user_id, epoch_us(ts) // $DayUs AS day FROM events),
         |b AS (SELECT MIN(day) AS d0 FROM days),
         |m AS (SELECT user_id,
         |    CAST(bit_or(1::BIGINT << CAST(day - d0 AS INTEGER)) AS BIGINT)
         |      AS activity_mask
         |  FROM days, b WHERE day - d0 < 63 GROUP BY 1)
         |SELECT user_id, activity_mask,
         |  CAST(bit_count(activity_mask) AS INTEGER) AS active_days
         |FROM m ORDER BY user_id""".stripMargin,


    // presence sets → pair counts; integer lift vs independence
    "q149_event_lift" ->
      """WITH pres AS (SELECT DISTINCT user_id, event_type FROM events),
        |nt AS (SELECT COUNT(DISTINCT user_id) AS nt FROM events),
        |tn AS (SELECT event_type, COUNT(*) AS n FROM pres GROUP BY 1),
        |pairs AS (SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS n_ab
        |  FROM pres a JOIN pres b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ta, tb, n_ab,
        |  CAST((n_ab * nt * 1000000) // (na.n * nb.n) AS BIGINT) AS lift_ppm
        |FROM pairs JOIN tn na ON na.event_type = ta
        |JOIN tn nb ON nb.event_type = tb, nt
        |ORDER BY ta, tb""".stripMargin,


    // block min/max stats per layout; candidate = probe within [mn, mx]
    "q150_skipping_audit" ->
      s"""WITH ev AS (SELECT user_id,
         |    (epoch_us(ts) - $Jan1_24) // 3600000000 AS hr FROM events),
         |pr AS (SELECT u FROM (SELECT DISTINCT user_id AS u FROM ev
         |  ORDER BY u LIMIT 5)),
         |tstats AS (SELECT hr // 16 AS blk, MIN(user_id) AS mn, MAX(user_id) AS mx
         |  FROM ev GROUP BY 1),
         |zc AS (SELECT user_id, user_id & 1023 AS x, hr & 1023 AS y FROM ev),
         |zstats AS (SELECT ${Layout.zValueSql("x", "y", 10)} // 4096 AS blk,
         |    MIN(user_id) AS mn, MAX(user_id) AS mx
         |  FROM zc GROUP BY 1),
         |a AS (SELECT 'time' AS layout,
         |    (SELECT COUNT(*) FROM tstats) AS n_blocks,
         |    (SELECT COUNT(*) FROM tstats, pr WHERE u BETWEEN mn AND mx)
         |      AS n_candidate
         |  UNION ALL
         |  SELECT 'zorder',
         |    (SELECT COUNT(*) FROM zstats),
         |    (SELECT COUNT(*) FROM zstats, pr WHERE u BETWEEN mn AND mx))
         |SELECT layout, CAST(n_blocks AS BIGINT) AS n_blocks,
         |  CAST(n_candidate AS BIGINT) AS n_candidate,
         |  CAST(((n_blocks*5 - n_candidate)*1000000) // GREATEST(n_blocks*5, 1) AS BIGINT)
         |    AS skip_ppm
         |FROM a ORDER BY layout""".stripMargin,


    // q62's bloom CTEs aggregated into a measured fp rate
    "q151_bloom_fpp" ->
      """WITH hot AS (SELECT DISTINCT o_custkey AS k FROM orders
        |  WHERE o_totalprice > 490000),
        |pp AS (SELECT CAST(concat('0x', substr(md5(CAST(i AS VARCHAR) || ':'
        |      || CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % 3840 AS pos
        |  FROM (SELECT k, unnest(range(0, 3)) AS i FROM hot)),
        |bloom AS (SELECT pos // 60 AS word,
        |    CAST(bit_or(1::BIGINT << CAST(pos % 60 AS INTEGER)) AS BIGINT) AS bits
        |  FROM pp GROUP BY 1),
        |prb AS (SELECT c_custkey, pos // 60 AS word,
        |    1::BIGINT << CAST(pos % 60 AS INTEGER) AS mask
        |  FROM (SELECT c_custkey,
        |      CAST(concat('0x', substr(md5(CAST(i AS VARCHAR) || ':'
        |        || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 3840 AS pos
        |    FROM (SELECT c_custkey, unnest(range(0, 3)) AS i FROM customer))),
        |hits AS (SELECT c_custkey,
        |    CAST(SUM(CASE WHEN (COALESCE(bits, 0) & mask) <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nh
        |  FROM prb LEFT JOIN bloom USING (word) GROUP BY c_custkey),
        |agg AS (SELECT COUNT(*) AS n_probes,
        |    CAST(SUM(CASE WHEN nh = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
        |    CAST(SUM(CASE WHEN hot.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_true
        |  FROM hits h LEFT JOIN hot ON h.c_custkey = hot.k)
        |SELECT n_probes, n_maybe, n_true,
        |  CAST(((n_maybe - n_true) * 1000000) // (n_probes - n_true) AS BIGINT)
        |    AS fp_ppm
        |FROM agg""".stripMargin,


    // distinct suppliers per (brand, size); top-20 coverage
    "q152_supplier_coverage" ->
      """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 20""".stripMargin,


    // scan+filter+sum with the ×10⁶ exact quantization
    "q153_forecast_revenue" ->
      s"""SELECT COUNT(*) AS n_lineitems,
         |  CAST(CAST(SUM(CAST(round(l_extendedprice*l_discount*1000000) AS BIGINT))
         |    AS BIGINT) AS DOUBLE)/1000000.0 AS revenue_effect
         |FROM lineitem
         |WHERE epoch_us(l_shipdate) >= $Jan1_96 AND epoch_us(l_shipdate) < $Jan1_97
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24""".stripMargin,


    // quantile_cont ≡ Spark percentile (the q26 parity)
    "q154_tail_latency" ->
      """SELECT event_type, COUNT(*) AS n,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.9) AS p90,
        |  quantile_cont(value, 0.99) AS p99
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // anti-join orphans + duplicate-key register, one row
    "q155_integrity_audit" ->
      """SELECT
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
        |    (SELECT c_custkey FROM customer)) AS orphan_orders,
        |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
        |    (SELECT o_orderkey FROM orders)) AS orphan_lineitems,
        |  (SELECT COUNT(*) FROM lineitem WHERE l_partkey NOT IN
        |    (SELECT p_partkey FROM part)) AS orphan_partrefs,
        |  (SELECT CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM
        |    (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey))
        |    AS dup_orderkeys""".stripMargin,


    // FULL OUTER on consecutive month indices; four components + identity
    "q156_revenue_bridge" ->
      """WITH rev AS (SELECT o_custkey,
        |    year(o_orderdate)*12 + month(o_orderdate) AS midx,
        |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2),
        |j AS (SELECT COALESCE(c.midx, p.midx + 1) AS m,
        |    COALESCE(c.cents, 0) AS cur, COALESCE(p.cents, 0) AS prv,
        |    c.cents IS NULL AS gone, p.cents IS NULL AS fresh
        |  FROM rev c FULL OUTER JOIN rev p
        |    ON c.o_custkey = p.o_custkey AND c.midx = p.midx + 1),
        |b AS (SELECT m,
        |    CAST(SUM(CASE WHEN fresh THEN cur ELSE 0 END) AS BIGINT) AS new_cents,
        |    CAST(SUM(CASE WHEN NOT fresh AND NOT gone AND cur > prv
        |      THEN cur - prv ELSE 0 END) AS BIGINT) AS expansion_cents,
        |    CAST(SUM(CASE WHEN NOT fresh AND NOT gone AND cur < prv
        |      THEN prv - cur ELSE 0 END) AS BIGINT) AS contraction_cents,
        |    CAST(SUM(CASE WHEN gone THEN prv ELSE 0 END) AS BIGINT) AS churned_cents
        |  FROM j GROUP BY 1)
        |SELECT m, new_cents, expansion_cents, contraction_cents, churned_cents,
        |  new_cents + expansion_cents - contraction_cents - churned_cents
        |    AS delta_cents
        |FROM b ORDER BY m""".stripMargin,


    // lifespan histogram + descending cumulative survivors
    "q157_survival_curve" ->
      s"""WITH sp AS (SELECT user_id,
         |    (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // $DayUs AS lifespan_days
         |  FROM events GROUP BY 1),
         |t AS (SELECT COUNT(*) AS nt FROM sp),
         |h AS (SELECT lifespan_days, COUNT(*) AS n_users FROM sp GROUP BY 1),
         |c AS (SELECT lifespan_days, n_users, nt,
         |    CAST(SUM(n_users) OVER (ORDER BY lifespan_days DESC
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS surviving
         |  FROM h, t)
         |SELECT lifespan_days, n_users,
         |  CAST((surviving * 1000000) // nt AS BIGINT) AS surviving_ppm
         |FROM c ORDER BY lifespan_days""".stripMargin,


    // double lag over the same per-user order
    "q158_bounce_motifs" ->
      """WITH e AS (SELECT user_id, event_type,
        |    LAG(event_type, 2) OVER w AS a, LAG(event_type, 1) OVER w AS b
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT a AS t_outer, b AS t_inner, COUNT(*) AS n_bounces
        |FROM e WHERE a IS NOT NULL AND a = event_type AND a != b
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // order ships at its max lineitem shipdate; full outer on month index
    "q159_shipment_backlog" ->
      """WITH placed AS (SELECT year(o_orderdate)*12 + month(o_orderdate) AS m,
        |    COUNT(*) AS placed FROM orders GROUP BY 1),
        |lastship AS (SELECT l_orderkey, MAX(l_shipdate) AS sd FROM lineitem
        |  GROUP BY 1),
        |shipped AS (SELECT year(sd)*12 + month(sd) AS m, COUNT(*) AS shipped
        |  FROM lastship GROUP BY 1),
        |j AS (SELECT COALESCE(p.m, s.m) AS m, COALESCE(placed, 0) AS placed,
        |    COALESCE(shipped, 0) AS shipped
        |  FROM placed p FULL OUTER JOIN shipped s ON p.m = s.m)
        |SELECT m, placed, shipped,
        |  CAST(SUM(placed - shipped) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS backlog
        |FROM j ORDER BY m""".stripMargin,


    // floored-cents AOV; positive-operand ratio, signed change by subtraction
    "q160_aov_trend" ->
      """WITH m AS (SELECT year(o_orderdate)*12 + month(o_orderdate) AS m,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |a AS (SELECT m, n_orders, cents // n_orders AS aov_cents FROM m),
        |l AS (SELECT m, n_orders, aov_cents,
        |    LAG(aov_cents, 1) OVER (ORDER BY m) AS prev FROM a)
        |SELECT m, n_orders, CAST(aov_cents AS BIGINT) AS aov_cents,
        |  CAST((aov_cents * 1000000) // prev AS BIGINT) AS ratio_ppm,
        |  CAST((aov_cents * 1000000) // prev - 1000000 AS BIGINT) AS change_ppm
        |FROM l ORDER BY m""".stripMargin,


    // order-granular: max lineitem shipdate vs order date, 30-day bound
    "q161_priority_sla" ->
      s"""WITH ls AS (SELECT l_orderkey, MAX(epoch_us(l_shipdate)) AS last_us
         |  FROM lineitem GROUP BY 1)
         |SELECT o_orderpriority, COUNT(*) AS n_orders,
         |  CAST(SUM(CASE WHEN last_us - epoch_us(o_orderdate) <= ${30L * DayUs}
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_within_sla,
         |  CAST((CAST(SUM(CASE WHEN last_us - epoch_us(o_orderdate)
         |    <= ${30L * DayUs} THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // COUNT(*) AS BIGINT) AS sla_ppm
         |FROM orders JOIN ls ON o_orderkey = l_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,


    // lag gaps → max per user → histogram
    "q162_resurrection_gaps" ->
      s"""WITH g AS (SELECT user_id,
         |    epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS gap
         |  FROM events),
         |m AS (SELECT user_id, MAX(gap) // $DayUs AS max_gap_days
         |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
         |SELECT max_gap_days, COUNT(*) AS n_users
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,


    // distinct (order, brand) self-join on the order key
    "q163_brand_cross_sell" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT a.p_brand AS ba, b.p_brand AS bb, COUNT(*) AS n_orders
        |FROM ob a JOIN ob b ON a.ok = b.ok AND a.p_brand < b.p_brand
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, ba, bb LIMIT 20""".stripMargin,


    // keys per murmur2 partition → max-vs-mean skew
    "q164_route_balance" ->
      s"""WITH k AS (SELECT DISTINCT user_id, user_id::VARCHAR AS s FROM events),
         |p AS (SELECT $murmur2PartitionSql AS partition, COUNT(*) AS n_keys
         |  FROM k GROUP BY 1),
         |a AS (SELECT COUNT(*) AS n_partitions,
         |    CAST(SUM(n_keys) AS BIGINT) AS n_keys_total,
         |    MIN(n_keys) AS min_keys, MAX(n_keys) AS max_keys FROM p)
         |SELECT n_partitions, n_keys_total, min_keys, max_keys,
         |  CAST((max_keys * n_partitions * 1000000) // n_keys_total AS BIGINT)
         |    AS skew_ppm
         |FROM a""".stripMargin,


    // open at cutoff = last lineitem ships on/after it; 30/60/90 buckets
    "q165_aging_buckets" ->
      s"""WITH ls AS (SELECT l_orderkey, MAX(epoch_us(l_shipdate)) AS last_us
         |  FROM lineitem GROUP BY 1),
         |o AS (SELECT o_orderkey, epoch_us(o_orderdate) AS od_us,
         |    CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders),
         |open_o AS (SELECT ($Jan1_97 - od_us) // $DayUs AS age_days, cents
         |  FROM o JOIN ls ON o_orderkey = l_orderkey
         |  WHERE od_us < $Jan1_97 AND last_us >= $Jan1_97)
         |SELECT CASE WHEN age_days <= 30 THEN 'a_0_30'
         |    WHEN age_days <= 60 THEN 'b_31_60'
         |    WHEN age_days <= 90 THEN 'c_61_90'
         |    ELSE 'd_90_plus' END AS bucket,
         |  COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS open_cents
         |FROM open_o GROUP BY 1 ORDER BY 1""".stripMargin,


    // staged VMR of whole-minute gaps; floor-guarded denominator
    "q166_habit_regularity" ->
      """WITH g AS (SELECT user_id,
        |    (epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id)) // 60000000 AS gap_min
        |  FROM events),
        |m AS (SELECT user_id, COUNT(*) AS n, CAST(SUM(gap_min) AS BIGINT) AS sg,
        |    CAST(SUM(gap_min*gap_min) AS BIGINT) AS qg
        |  FROM g WHERE gap_min IS NOT NULL GROUP BY 1)
        |SELECT user_id, n,
        |  CAST(((n * qg - sg * sg) * 1000) // greatest(((n - 1) * sg) // 1000, 1)
        |    AS BIGINT) AS vmr_ppm
        |FROM m WHERE n >= 20 AND sg > 0
        |ORDER BY vmr_ppm, user_id LIMIT 20""".stripMargin,


    // per-period monetary quintiles; inner join keeps both-period customers
    "q167_segment_migration" ->
      s"""WITH o AS (SELECT o_custkey, epoch_us(o_orderdate) AS od_us,
         |    CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders),
         |p1 AS (SELECT o_custkey, NTILE(5) OVER (ORDER BY SUM(cents) DESC,
         |    o_custkey) AS seg_early
         |  FROM o WHERE od_us < $Jan1_98 GROUP BY o_custkey),
         |p2 AS (SELECT o_custkey, NTILE(5) OVER (ORDER BY SUM(cents) DESC,
         |    o_custkey) AS seg_late
         |  FROM o WHERE od_us >= $Jan1_98 GROUP BY o_custkey)
         |SELECT CAST(seg_early AS INTEGER) AS seg_early,
         |  CAST(seg_late AS INTEGER) AS seg_late, COUNT(*) AS n_customers
         |FROM p1 JOIN p2 USING (o_custkey)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // exact per-unit cents via integer division by the whole-valued qty
    "q168_price_dispersion" ->
      """WITH u AS (SELECT l_partkey,
        |    CAST(round(l_extendedprice*100) AS BIGINT)
        |      // CAST(l_quantity AS BIGINT) AS unit_cents
        |  FROM lineitem),
        |p AS (SELECT l_partkey, COUNT(*) AS n_sales,
        |    MIN(unit_cents) AS min_unit, MAX(unit_cents) AS max_unit
        |  FROM u GROUP BY 1)
        |SELECT l_partkey, n_sales, min_unit, max_unit,
        |  max_unit - min_unit AS spread_cents
        |FROM p ORDER BY spread_cents DESC, l_partkey LIMIT 20""".stripMargin,


    // q137's integer test with per-type registers
    "q169_typed_control_chart" ->
      s"""WITH daily AS (SELECT event_type, epoch_us(ts) // $DayUs AS day,
         |    COUNT(*) AS x
         |  FROM events GROUP BY 1, 2),
         |m AS (SELECT event_type, COUNT(*) AS nn, CAST(SUM(x) AS BIGINT) AS ss,
         |    CAST(SUM(x*x) AS BIGINT) AS qq
         |  FROM daily GROUP BY 1)
         |SELECT event_type, day, x AS n_events,
         |  CASE WHEN nn*x > ss THEN 'high' ELSE 'low' END AS side
         |FROM daily JOIN m USING (event_type)
         |WHERE (nn*x - ss)*(nn*x - ss) > 4*(nn*qq - ss*ss)
         |ORDER BY event_type, day""".stripMargin,


    // first/second order via one ranked window; 90-day bound
    "q170_second_order_rate" ->
      s"""WITH r AS (SELECT o_custkey, epoch_us(o_orderdate) AS od_us,
         |    ROW_NUMBER() OVER (PARTITION BY o_custkey
         |      ORDER BY epoch_us(o_orderdate), o_orderkey) AS rn
         |  FROM orders),
         |f AS (SELECT o_custkey, od_us AS first_us FROM r WHERE rn = 1),
         |s2 AS (SELECT o_custkey, od_us AS second_us FROM r WHERE rn = 2),
         |m AS (SELECT epoch_us(date_trunc('month', make_timestamp(first_us)))
         |      AS cohort_us,
         |    COUNT(*) AS n_new,
         |    CAST(SUM(CASE WHEN second_us IS NOT NULL
         |      AND second_us - first_us <= ${90L * DayUs} THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_repeat_90d
         |  FROM f LEFT JOIN s2 USING (o_custkey) GROUP BY 1)
         |SELECT cohort_us, n_new, n_repeat_90d,
         |  CAST((n_repeat_90d * 1000000) // n_new AS BIGINT) AS repeat_ppm
         |FROM m ORDER BY cohort_us""".stripMargin,


    // cent-threshold bands; integer means in ppm
    "q171_discount_response" ->
      """WITH b AS (SELECT
        |    CASE WHEN l_discount < 0.02 THEN 'a_0_2'
        |         WHEN l_discount < 0.05 THEN 'b_2_5'
        |         WHEN l_discount < 0.08 THEN 'c_5_8'
        |         ELSE 'd_8_plus' END AS band,
        |    CAST(l_quantity AS BIGINT) AS q,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
        |  FROM lineitem)
        |SELECT band, COUNT(*) AS n_lines,
        |  CAST((CAST(SUM(q) AS BIGINT) * 1000000) // COUNT(*) AS BIGINT)
        |    AS mean_qty_ppm,
        |  CAST((CAST(SUM(r) AS BIGINT) * 1000000) // COUNT(*) AS BIGINT)
        |    AS return_ppm
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,


    // epoch-hour mod 24 dayparts; null values contribute 0 cents
    "q172_daypart_profile" ->
      """WITH e AS (SELECT event_type, value,
        |    (epoch_us(ts) // 3600000000) % 24 AS hour FROM events),
        |b AS (SELECT CASE WHEN hour < 6 THEN 'a_night'
        |    WHEN hour < 12 THEN 'b_morning'
        |    WHEN hour < 18 THEN 'c_afternoon'
        |    ELSE 'd_evening' END AS daypart, event_type, value FROM e)
        |SELECT daypart, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_purchases,
        |  CAST(SUM(COALESCE(CAST(round(value*100) AS BIGINT), 0)) AS BIGINT)
        |    AS value_cents,
        |  CAST((CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000) // COUNT(*) AS BIGINT) AS purchase_ppm
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,


    // q125's sessionization CTEs, size-bucketed (least(n,10))
    "q173_session_size_conversion" ->
      """WITH flagged AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sess AS (SELECT user_id, event_type,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM flagged),
        |fl AS (SELECT user_id, session_seq, COUNT(*) AS n_events,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS had_purchase
        |  FROM sess GROUP BY 1, 2)
        |SELECT least(n_events, 10) AS size_bucket, COUNT(*) AS n_sessions,
        |  CAST(SUM(had_purchase) AS BIGINT) AS n_converted,
        |  CAST((CAST(SUM(had_purchase) AS BIGINT) * 1000000) // COUNT(*) AS BIGINT)
        |    AS conv_ppm
        |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin,

    // offset floor-div band; same bucket CASE on both engines
    "q175_k_anonymity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
        |    ((CAST(round(c_acctbal*100) AS BIGINT) + 100000000) // 100000) - 1000 AS bal_kb,
        |    COUNT(*) AS gsz
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT CASE WHEN gsz = 1 THEN 'a_1' WHEN gsz = 2 THEN 'b_2'
        |    WHEN gsz <= 5 THEN 'c_3_5' WHEN gsz <= 10 THEN 'd_6_10'
        |    ELSE 'e_gt10' END AS k_bucket,
        |  COUNT(*) AS n_groups, CAST(SUM(gsz) AS BIGINT) AS n_rows
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // live docs = NOT tombstoned (doc_id % 7 != 0); index derives from them
    "q174_deindex_tombstone" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE list_contains($toksSql, 'spark') AND doc_id % 7 <> 0
         |ORDER BY doc_id""".stripMargin,

    // distinct sensitive bands per QI class; same bucket CASE both engines
    "q176_l_diversity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
        |    COUNT(DISTINCT ((CAST(round(c_acctbal*100) AS BIGINT) + 100000000)
        |      // 100000) - 1000) AS l_div,
        |    COUNT(*) AS gsz
        |  FROM customer GROUP BY 1, 2)
        |SELECT CASE WHEN l_div = 1 THEN 'a_1' WHEN l_div = 2 THEN 'b_2'
        |    WHEN l_div <= 5 THEN 'c_3_5' WHEN l_div <= 10 THEN 'd_6_10'
        |    ELSE 'e_gt10' END AS l_bucket,
        |  COUNT(*) AS n_groups, CAST(SUM(gsz) AS BIGINT) AS n_rows,
        |  MIN(l_div) AS min_l
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // half-membership min/max fold, then one classification aggregate
    "q177_edge_churn" ->
      s"""WITH e AS (SELECT o_custkey AS src, l_suppkey AS dst,
         |    CASE WHEN epoch_us(o_orderdate) >= $Jan1_00 THEN 1 ELSE 0 END AS h
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |f AS (SELECT src, dst, MIN(h) AS h0, MAX(h) AS h1 FROM e GROUP BY 1, 2),
         |agg AS (SELECT
         |    CAST(SUM(CASE WHEN h0 = 0 AND h1 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_persisted,
         |    CAST(SUM(CASE WHEN h0 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         |    CAST(SUM(CASE WHEN h1 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         |  FROM f)
         |SELECT n_persisted, n_new, n_dropped,
         |  CAST((n_persisted * 1000000) // (n_persisted + n_new + n_dropped)
         |    AS BIGINT) AS jaccard_ppm
         |FROM agg""".stripMargin,

    // q53's support CTE, both rule directions, staged ppm divisions
    "q178_association_rules" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT x.p AS a, y.p AS b, CAST(COUNT(*) AS BIGINT) AS support
        |  FROM li0 x JOIN li0 y ON x.o = y.o AND x.p < y.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |it AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS supp FROM li0 GROUP BY p),
        |nn AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM li0),
        |dir AS (SELECT a AS ante, b AS cons, support FROM e
        |  UNION ALL SELECT b, a, support FROM e),
        |r AS (SELECT ante, cons, support,
        |    CAST((support * 1000000) // sa.supp AS BIGINT) AS confidence_ppm,
        |    CAST((CAST((support * 1000000) // sa.supp AS BIGINT) * n_orders)
        |      // sc.supp AS BIGINT) AS lift_ppm
        |  FROM dir JOIN it sa ON ante = sa.p JOIN it sc ON cons = sc.p, nn)
        |SELECT * FROM r ORDER BY lift_ppm DESC, ante, cons LIMIT 50""".stripMargin,

    // raw-row cumulative form of the same tie-inclusive rank test:
    // quantile num/den = MIN value with cum*den >= tot*num
    "q179_delay_quantiles" ->
      s"""WITH de AS (SELECT o_orderpriority,
         |    (epoch_us(l_shipdate) - epoch_us(o_orderdate)) // $DayUs AS delay_days
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |w AS (SELECT o_orderpriority, delay_days,
         |    CAST(COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY delay_days)
         |      AS BIGINT) AS cum,
         |    CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS tot
         |  FROM de),
         |qs AS (SELECT * FROM (VALUES ('p25', 1, 4), ('p50', 1, 2),
         |    ('p75', 3, 4), ('p99', 99, 100)) AS q(quantile, num, den))
         |SELECT w.o_orderpriority, q.quantile,
         |  CAST(MIN(CASE WHEN w.cum * q.den >= w.tot * q.num
         |    THEN w.delay_days END) AS BIGINT) AS quantile_value
         |FROM w CROSS JOIN qs q
         |GROUP BY w.o_orderpriority, q.quantile
         |ORDER BY w.o_orderpriority, q.quantile""".stripMargin,

    // q66's exact label chain, then modularity on the symmetric frame:
    // m_c/m = intra2/m2, (d_c/2m)^2 = d^2/m2^2; HUGEINT products, per-term
    // floors (q144 convention), signed result by subtraction only
    "q180_modularity" ->
      s"""WITH ${labelPropChainSql(iterations = 3)},
         |lab AS (SELECT vertex, label FROM l3),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM e),
         |deg AS (SELECT src AS vertex, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM e GROUP BY 1),
         |cm AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vertices,
         |    CAST(SUM(d) AS BIGINT) AS degree_sum
         |  FROM lab JOIN deg USING (vertex) GROUP BY label),
         |intra AS (SELECT la.label, CAST(COUNT(*) AS BIGINT) AS intra2
         |  FROM e JOIN lab la ON la.vertex = e.src
         |         JOIN lab lb ON lb.vertex = e.dst
         |  WHERE la.label = lb.label GROUP BY la.label)
         |SELECT cm.label, cm.n_vertices,
         |  CAST(COALESCE(intra.intra2, 0) // 2 AS BIGINT) AS intra_edges,
         |  cm.degree_sum,
         |  CAST((COALESCE(intra.intra2, 0) * 1000000) // m2
         |    - (cm.degree_sum * cm.degree_sum * 1000000) // (m2 * m2)
         |    AS BIGINT) AS contrib_ppm,
         |  CAST(cm.degree_sum - COALESCE(intra.intra2, 0) AS BIGINT) AS cut_edges,
         |  CAST(((cm.degree_sum - COALESCE(intra.intra2, 0)) * 1000000)
         |    // GREATEST(LEAST(cm.degree_sum, m2 - cm.degree_sum), 1)
         |    AS BIGINT) AS conductance_ppm
         |FROM cm LEFT JOIN intra ON cm.label = intra.label, tot
         |ORDER BY cm.label""".stripMargin,

    // q99's co-purchase edge chain; deg/e/mins multiply referenced ->
    // MATERIALIZED; club density floors with a clamped denominator
    "q181_rich_club" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |li AS (SELECT o, p FROM (SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS bn
        |    FROM li0) WHERE bn <= 5),
        |e AS MATERIALIZED (SELECT x.p AS a, y.p AS b
        |      FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        |deg AS MATERIALIZED (SELECT u, CAST(COUNT(*) AS BIGINT) AS dg
        |  FROM adj GROUP BY 1),
        |ks AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES (2), (4), (8), (16)) AS t(k)),
        |mins AS MATERIALIZED (SELECT LEAST(da.dg, db.dg) AS mn
        |  FROM e JOIN deg da ON e.a = da.u JOIN deg db ON e.b = db.u),
        |nk AS (SELECT ks.k, CAST(COUNT(d.u) AS BIGINT) AS n_nodes
        |  FROM ks LEFT JOIN deg d ON d.dg >= ks.k GROUP BY ks.k),
        |ek AS (SELECT ks.k, CAST(COUNT(m.mn) AS BIGINT) AS n_edges
        |  FROM ks LEFT JOIN mins m ON m.mn >= ks.k GROUP BY ks.k)
        |SELECT nk.k, nk.n_nodes, ek.n_edges,
        |  CAST((ek.n_edges * 2 * 1000000) //
        |    GREATEST(nk.n_nodes * (nk.n_nodes - 1), 1) AS BIGINT) AS density_ppm
        |FROM nk JOIN ek ON nk.k = ek.k
        |ORDER BY nk.k""".stripMargin,

    // q176's band definition; absent bands folded in closed form
    // (n_g·(N − Σ_present n_v)); HUGEINT products, one floor division
    "q182_t_closeness" ->
      """WITH r0 AS (SELECT c_nationkey, c_mktsegment,
        |    ((CAST(round(c_acctbal*100) AS BIGINT) + 100000000) // 100000) - 1000
        |      AS bal_kb
        |  FROM customer),
        |gv AS (SELECT c_nationkey, c_mktsegment, bal_kb,
        |    CAST(COUNT(*) AS BIGINT) AS n_gv
        |  FROM r0 GROUP BY 1, 2, 3),
        |gg AS (SELECT *, CAST(SUM(n_gv) OVER (PARTITION BY c_nationkey,
        |    c_mktsegment) AS BIGINT) AS n_g FROM gv),
        |v AS (SELECT bal_kb, CAST(COUNT(*) AS BIGINT) AS n_v
        |  FROM r0 GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM r0)
        |SELECT g.c_nationkey, g.c_mktsegment, g.n_g,
        |  CAST(((SUM(ABS(g.n_gv * n_total - v.n_v * g.n_g))
        |      + g.n_g * (n_total - SUM(v.n_v))) * 1000000)
        |    // (g.n_g * n_total * 2) AS BIGINT) AS tv_ppm
        |FROM gg g JOIN v USING (bal_kb), tot
        |GROUP BY g.c_nationkey, g.c_mktsegment, g.n_g, n_total
        |ORDER BY 1, 2""".stripMargin,

    // weekend = dayofweek IN (0,6) in DuckDB ≡ Spark dayofweek IN (1,7)
    // (Sunday is 0 there, 1 here); same cross-multiplied sup-norm
    "q183_ks_drift" ->
      """WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS v,
        |    CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT event_type, v,
        |    CAST(SUM(1 - we) AS BIGINT) AS c_wd, CAST(SUM(we) AS BIGINT) AS c_we
        |  FROM e GROUP BY 1, 2),
        |cum AS (SELECT event_type,
        |    CAST(SUM(c_wd) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_wd,
        |    CAST(SUM(c_we) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_we,
        |    CAST(SUM(c_wd) OVER (PARTITION BY event_type) AS BIGINT) AS n_wd,
        |    CAST(SUM(c_we) OVER (PARTITION BY event_type) AS BIGINT) AS n_we
        |  FROM c)
        |SELECT event_type, n_wd, n_we,
        |  CAST((MAX(ABS(n_we * cum_wd - n_wd * cum_we)) * 1000000)
        |    // GREATEST(n_wd * n_we, 1) AS BIGINT) AS ks_ppm
        |FROM cum GROUP BY event_type, n_wd, n_we ORDER BY event_type""".stripMargin,

    // the identical integer Holt recursion as a recursive CTE; DuckDB `//`
    // truncates toward zero at any sign (probed: -7 // 2 = -3), exactly
    // like the operator's Scala Long `/`
    "q184_holt_forecast" ->
      """WITH RECURSIVE m AS (SELECT year(o_orderdate)*12 + month(o_orderdate) AS midx,
        |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |o AS (SELECT midx, cents,
        |    CAST(ROW_NUMBER() OVER (ORDER BY midx) AS BIGINT) AS i FROM m),
        |h AS (
        |  SELECT i, midx, cents, cents AS level, CAST(0 AS BIGINT) AS trend,
        |    cents AS forecast, CAST(0 AS BIGINT) AS err
        |  FROM o WHERE i = 1
        |  UNION ALL
        |  SELECT o.i, o.midx, o.cents,
        |    (o.cents + 3*(h.level + h.trend)) // 4,
        |    ((((o.cents + 3*(h.level + h.trend)) // 4) - h.level) + 3*h.trend) // 4,
        |    h.level + h.trend,
        |    o.cents - (h.level + h.trend)
        |  FROM h JOIN o ON o.i = h.i + 1)
        |SELECT midx, cents, level, trend, forecast, err FROM h ORDER BY midx""".stripMargin,

    "q185_personalized_pagerank" ->
      pageRankSql(iterations = 10, dampingPpm = 850000L,
        seedCondSql = Some("vertex = 'b:Brand#13'")),


    // all-pairs slopes over the ≤31-point daily series, q110 median rule
    "q186_theil_sen" ->
      s"""WITH daily AS (SELECT event_type, (epoch_us(ts) - $Jan1_24) // $DayUs AS di,
         |    CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
         |p AS (SELECT a.event_type,
         |    ((b.c - a.c) * 1000000) // (b.di - a.di) AS slope_ppm
         |  FROM daily a JOIN daily b
         |    ON a.event_type = b.event_type AND b.di > a.di),
         |w AS (SELECT event_type, slope_ppm,
         |    CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY slope_ppm)
         |      AS BIGINT) AS cum,
         |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS tot
         |  FROM p)
         |SELECT event_type, COUNT(*) AS n_pairs,
         |  MIN(CASE WHEN cum*2 >= tot THEN slope_ppm END) AS theil_sen_ppm
         |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,


    // day-pair sign sum + exact tie-corrected variance; cross-multiplied
    // z-test (1.96² = 9604/2500), no continuity correction
    "q187_mann_kendall" ->
      s"""WITH daily AS (SELECT epoch_us(o_orderdate) // $DayUs AS di,
         |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |p AS (SELECT CASE WHEN b.cents > a.cents THEN 1
         |    WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sg
         |  FROM daily a JOIN daily b ON b.di > a.di),
         |s AS (SELECT CAST(COALESCE(SUM(sg), 0) AS BIGINT) AS s_stat FROM p),
         |n AS (SELECT COUNT(*) AS n_days FROM daily),
         |t AS (SELECT CAST(COALESCE(SUM(t*(t-1)*(2*t+5)), 0) AS BIGINT) AS tie18
         |  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY cents)),
         |v AS (SELECT n_days, s_stat,
         |    n_days*(n_days-1)*(2*n_days+5) - tie18 AS var18 FROM n, s, t)
         |SELECT n_days, s_stat, var18,
         |  CASE WHEN 2500*18*s_stat*s_stat >= 9604*var18
         |    THEN CASE WHEN s_stat > 0 THEN 'increasing' ELSE 'decreasing' END
         |    ELSE 'none' END AS trend
         |FROM v""".stripMargin,


    // (quantity, discount-cents) cell registers; nc/nd as products of cell
    // counts over the ≤550² cell-pair space; gamma = sign · |nc−nd|·1e6 //
    // (nc+nd) with the all-ties clamp
    "q188_rank_concordance" ->
      """WITH cells AS (SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(round(l_discount*100) AS BIGINT) AS dc, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |p AS (SELECT a.dc AS da, b.dc AS db, a.n * b.n AS nn
        |  FROM cells a JOIN cells b ON a.q < b.q),
        |agg AS (SELECT COALESCE(SUM(CASE WHEN da < db THEN nn END), 0) AS ncd,
        |    COALESCE(SUM(CASE WHEN da > db THEN nn END), 0) AS ndd FROM p)
        |SELECT CAST(ncd AS BIGINT) AS n_concordant,
        |  CAST(ndd AS BIGINT) AS n_discordant,
        |  CAST((CASE WHEN ncd >= ndd THEN 1 ELSE -1 END) *
        |    ((CASE WHEN ncd >= ndd THEN ncd - ndd ELSE ndd - ncd END) * 1000000
        |      // GREATEST(ncd + ndd, 1)) AS BIGINT) AS gamma_ppm
        |FROM agg""".stripMargin,


    // paired H1/H2 purchase COUNTS for both-halves-active users; the
    // discordant-direction χ²₁ (sign-test form) as the 2500/9604
    // cross-multiplied test with the explicit b+c > 0 guard
    "q189_mcnemar" ->
      """WITH m AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid_us
        |  FROM events),
        |per AS (SELECT user_id,
        |    MAX(CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 0 END) AS a1,
        |    MAX(CASE WHEN epoch_us(ts) >= mid_us THEN 1 ELSE 0 END) AS a2,
        |    CAST(SUM(CASE WHEN epoch_us(ts) < mid_us AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS p1,
        |    CAST(SUM(CASE WHEN epoch_us(ts) >= mid_us AND event_type = 'purchase'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS p2
        |  FROM events, m GROUP BY user_id),
        |pp AS (SELECT * FROM per WHERE a1 = 1 AND a2 = 1),
        |agg AS (SELECT COUNT(*) AS n_paired,
        |    CAST(SUM(CASE WHEN p1 > p2 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(SUM(CASE WHEN p2 > p1 THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM pp)
        |SELECT n_paired, b, c,
        |  (b + c > 0 AND 2500*(b - c)*(b - c) >= 9604*(b + c)) AS significant
        |FROM agg""".stripMargin,


    // q144's contingency CTEs + one more floor division: V² =
    // (χ²/N)/min(r−1, c−1) in ppm
    "q190_cramers_v" ->
      s"""WITH ev AS (SELECT ((epoch_us(ts) // $DayUs) + 4) % 7 AS dow, event_type
         |  FROM events),
         |obs AS (SELECT dow, event_type, COUNT(*) AS o FROM ev GROUP BY 1, 2),
         |rm AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1),
         |cm AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1),
         |tt AS (SELECT CAST(SUM(o) AS BIGINT) AS nn FROM obs),
         |cells AS (SELECT ((o*nn - r*c)*(o*nn - r*c)) // ((nn*r*c) // 1000000)
         |    AS term_ppm
         |  FROM obs JOIN rm USING (dow) JOIN cm USING (event_type), tt),
         |dims AS (SELECT (SELECT COUNT(*) FROM rm) AS n_dow,
         |    (SELECT COUNT(*) FROM cm) AS n_types)
         |-- scalar-subquery form: ONE row even on an empty log (empty-world
         |-- gate, same convention as q144)
         |SELECT (SELECT CAST(SUM(term_ppm) AS BIGINT) FROM cells) AS chi2_ppm,
         |  CAST((n_dow - 1) * (n_types - 1) AS BIGINT) AS dof,
         |  nn AS n_events,
         |  CAST((SELECT CAST(SUM(term_ppm) AS BIGINT) FROM cells)
         |    // GREATEST(nn * LEAST(n_dow - 1, n_types - 1), 1) AS BIGINT)
         |    AS v_sq_ppm
         |FROM dims, tt""".stripMargin,


    // calendar-day register -> dow register; cross-multiplied index on
    // HUGEINT
    "q201_dow_seasonality" ->
      s"""WITH daily AS (SELECT epoch_us(ts) // $DayUs AS di, COUNT(*) AS n
         |  FROM events GROUP BY 1),
         |per AS (SELECT (di + 4) % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
         |    CAST(SUM(n) AS BIGINT) AS n_events
         |  FROM daily GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_days) AS HUGEINT) AS td,
         |    CAST(SUM(n_events) AS HUGEINT) AS te FROM per)
         |SELECT dow, n_days, n_events,
         |  CAST((CAST(n_events AS HUGEINT) * 1000000 * td)
         |    // (CAST(n_days AS HUGEINT) * te) AS BIGINT) AS idx_ppm
         |FROM per, t ORDER BY dow""".stripMargin,

    // identical register/draw/order-statistic chain; md5Hash60 ≡
    // CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT) (rule 4)
    "q205_bootstrap_ci" ->
      s"""WITH daily AS (SELECT epoch_us(o_orderdate) // $DayUs AS di,
         |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev
         |  FROM orders GROUP BY 1),
         |ranked AS (SELECT rev,
         |    CAST(ROW_NUMBER() OVER (ORDER BY di) AS BIGINT) - 1 AS rk
         |  FROM daily),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         |    CAST(COALESCE(SUM(rev), 0) AS BIGINT) AS tot FROM ranked),
         |draws AS (SELECT bb.b, r.rk AS j
         |  FROM (SELECT unnest(range(200)) AS b) bb, ranked r),
         |pick AS (SELECT b,
         |    (CAST(concat('0x', substr(md5(concat(b, ':', j)), 1, 15)) AS BIGINT)
         |      % n_days) AS idx
         |  FROM draws, nd),
         |means AS (SELECT p.b,
         |    CAST(CAST(SUM(r.rev) AS BIGINT) // n_days AS BIGINT) AS mean_b
         |  FROM pick p JOIN ranked r ON r.rk = p.idx, nd
         |  GROUP BY p.b, n_days),
         |ob AS (SELECT mean_b,
         |    CAST(ROW_NUMBER() OVER (ORDER BY mean_b, b) AS BIGINT) AS rn
         |  FROM means)
         |SELECT n_days, CAST(tot // greatest(n_days, 1) AS BIGINT) AS point_mean_cents,
         |  (SELECT mean_b FROM ob WHERE rn = 5) AS ci_lo_cents,
         |  (SELECT mean_b FROM ob WHERE rn = 196) AS ci_hi_cents
         |FROM nd""".stripMargin,

    // one count-register per keyspace, HUGEINT squares, both divisions
    // greatest-clamped exactly as the Spark side
    "q207_key_skew_audit" ->
      """WITH
        |re AS (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1),
        |ro AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
        |rl AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |ae AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_rows,
        |    CAST(COALESCE(MAX(c), 0) AS BIGINT) AS top1_rows,
        |    COALESCE(SUM(CAST(c AS HUGEINT) * c), 0) AS s2 FROM re),
        |ao AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_rows,
        |    CAST(COALESCE(MAX(c), 0) AS BIGINT) AS top1_rows,
        |    COALESCE(SUM(CAST(c AS HUGEINT) * c), 0) AS s2 FROM ro),
        |al AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_rows,
        |    CAST(COALESCE(MAX(c), 0) AS BIGINT) AS top1_rows,
        |    COALESCE(SUM(CAST(c AS HUGEINT) * c), 0) AS s2 FROM rl),
        |u AS (
        |  SELECT 'events.user_id' AS keyspace, * FROM ae
        |  UNION ALL SELECT 'orders.o_custkey', * FROM ao
        |  UNION ALL SELECT 'lineitem.l_partkey', * FROM al)
        |SELECT keyspace, n_keys, n_rows, top1_rows,
        |  CAST((top1_rows * 1000000) // GREATEST(n_rows, 1) AS BIGINT)
        |    AS top1_share_ppm,
        |  CAST((CAST(n_rows AS HUGEINT) * n_rows * 1000000)
        |    // GREATEST(s2, 1) AS BIGINT) AS eff_keys_ppm,
        |  CAST((top1_rows * 32) // GREATEST(n_rows, 1) + 1 AS BIGINT)
        |    AS salt_buckets
        |FROM u ORDER BY keyspace""".stripMargin,

    // the oracle assembles the frame independently as a hex string
    // (printf BE id + utf8 payload hex) and decodes header fields with
    // substr + '0x'-cast — layout parity with the engine's binary build
    "q206_wire_frame" ->
      """WITH f AS (SELECT doc_id,
        |    '00' || printf('%08x', doc_id % 1000)
        |      || lower(hex(encode(text))) AS frame_hex
        |  FROM documents)
        |SELECT doc_id,
        |  substr(frame_hex, 1, 10) AS hdr_hex,
        |  substr(frame_hex, 1, 2) = '00' AS magic_ok,
        |  ('0x' || substr(frame_hex, 3, 8))::BIGINT AS schema_id,
        |  CAST((length(frame_hex) - 10) // 2 AS BIGINT) AS payload_len
        |FROM f ORDER BY doc_id""".stripMargin,

    // the oracle assembles each coercion's wire form independently: the
    // uuid's 16 bytes ARE the 32 md5 hex chars (big-endian msb‖lsb —
    // byte-order drift would break this equality), the enum body is the
    // zigzag varint of the symbol index (2·ki, single byte for ki<64),
    // the fixed(8) body is its 16 input hex chars; roundtrip columns are
    // the canonical 8-4-4-4-12 text and the CASE'd symbol
    "q208_serde_coerce" ->
      """WITH b AS (SELECT doc_id,
        |    md5(concat('u:', doc_id)) AS h,
        |    doc_id % 4 AS ki,
        |    substr(md5(concat('f:', doc_id)), 1, 16) AS f8
        |  FROM documents)
        |SELECT doc_id,
        |  h AS uuid_wire_hex,
        |  concat(substr(h,1,8),'-',substr(h,9,4),'-',substr(h,13,4),'-',
        |    substr(h,17,4),'-',substr(h,21,12)) AS uuid_rt,
        |  printf('%02x', 2*ki) AS enum_wire_hex,
        |  CASE ki WHEN 0 THEN 'HTML' WHEN 1 THEN 'PDF' WHEN 2 THEN 'TXT'
        |    ELSE 'MD' END AS enum_rt,
        |  f8 AS fixed_wire_hex
        |FROM b ORDER BY doc_id""".stripMargin,

    // the same register/cumulative/total CTEs on HUGEINT; the two stage
    // floors compose exactly on positives, empty side CASEs to NULL
    "q204_cvm_drift" ->
      """WITH v AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    epoch_us(o_orderdate) < 899251200000000 AS isx FROM orders),
        |reg AS (SELECT cents,
        |    CAST(SUM(CASE WHEN isx THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN isx THEN 0 ELSE 1 END) AS BIGINT) AS b
        |  FROM v GROUP BY cents),
        |cum AS (SELECT a, b,
        |    CAST(SUM(a) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        |    CAST(SUM(b) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
        |  FROM reg),
        |tot AS (SELECT CAST(COALESCE(SUM(a), 0) AS BIGINT) AS n_x,
        |    CAST(COALESCE(SUM(b), 0) AS BIGINT) AS n_y FROM reg),
        |s AS (SELECT COALESCE(SUM(CAST(a + b AS HUGEINT) *
        |      (CAST(ca AS HUGEINT)*n_y - CAST(cb AS HUGEINT)*n_x) *
        |      (CAST(ca AS HUGEINT)*n_y - CAST(cb AS HUGEINT)*n_x)), 0) AS s2
        |  FROM cum, tot),
        |f AS (SELECT n_x, n_y,
        |    CASE WHEN n_x > 0 AND n_y > 0 THEN
        |      CAST((s2 * 1000000) // (CAST(n_x AS HUGEINT) * n_y
        |        * (n_x + n_y) * (n_x + n_y)) AS BIGINT)
        |    END AS cvm_ppm
        |  FROM s, tot)
        |SELECT n_x, n_y, cvm_ppm,
        |  CASE WHEN cvm_ppm IS NULL THEN NULL
        |    WHEN cvm_ppm >= 461000 THEN 'drift' ELSE 'none' END AS verdict
        |FROM f""".stripMargin,

    // the delay register + DESC at-risk window + ASC cumulative-hazard
    // window, per-term floors staged exactly as the Spark side
    "q203_censored_hazard" ->
      """WITH base AS (SELECT
        |    (least(epoch_us(l.l_shipdate), 915148800000000)
        |      - epoch_us(o.o_orderdate)) // 86400000000 AS t_day,
        |    epoch_us(l.l_shipdate) <= 915148800000000 AS event
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE epoch_us(l.l_shipdate) >= epoch_us(o.o_orderdate)
        |    AND epoch_us(o.o_orderdate) <= 915148800000000),
        |reg AS (SELECT t_day,
        |    CAST(SUM(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d_events,
        |    CAST(COUNT(*) AS BIGINT) AS nt
        |  FROM base GROUP BY t_day),
        |risk AS (SELECT t_day, d_events,
        |    CAST(SUM(nt) OVER (ORDER BY t_day DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_at_risk
        |  FROM reg),
        |h AS (SELECT t_day, d_events, n_at_risk,
        |    CAST((d_events * 1000000) // n_at_risk AS BIGINT) AS hazard_ppm
        |  FROM risk WHERE d_events >= 1)
        |SELECT t_day, d_events, n_at_risk, hazard_ppm,
        |  CAST(SUM(hazard_ppm) OVER (ORDER BY t_day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_hazard_ppm
        |FROM h ORDER BY t_day""".stripMargin,

    // real strptime parses on both formats (%z accepts '+02:00' AND the
    // minute-less '+02' — probed), so the oracle exercises actual parsing,
    // not epoch arithmetic
    "q202_event_time_parse" ->
      """WITH s AS (SELECT event_id,
        |    strftime(ts, '%Y-%m-%dT%H:%M:%S') || '+02:00' AS iso_str,
        |    strftime(ts, '%d.%m.%Y %H:%M:%S') || '+02' AS euro_str
        |  FROM events)
        |SELECT event_id, iso_str, euro_str,
        |  epoch_us(strptime(iso_str, '%Y-%m-%dT%H:%M:%S%z')) AS iso_us,
        |  epoch_us(strptime(euro_str, '%d.%m.%Y %H:%M:%S%z')) AS euro_us
        |FROM s ORDER BY event_id""".stripMargin,

    // three NTILE quintiles with the custkey tiebreak (rule-5 INTEGER
    // casts); HUGEINT spend per occupied grid cell
    "q200_rfm_segments" ->
      """WITH per AS (SELECT o_custkey,
        |    MAX(epoch_us(o_orderdate)) AS last_us,
        |    CAST(COUNT(*) AS BIGINT) AS freq,
        |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS mon
        |  FROM orders GROUP BY 1),
        |sc AS (SELECT mon,
        |    CAST(NTILE(5) OVER (ORDER BY last_us, o_custkey) AS INTEGER) AS r,
        |    CAST(NTILE(5) OVER (ORDER BY freq, o_custkey) AS INTEGER) AS f,
        |    CAST(NTILE(5) OVER (ORDER BY mon, o_custkey) AS INTEGER) AS m
        |  FROM per)
        |SELECT r, f, m, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CAST(mon AS HUGEINT)) AS BIGINT) AS total_cents
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,


    // q191's per-lag moment CTEs instantiated over TWO typed daily
    // registers (clicks x, purchases y), UNION ALL'd
    "q199_ccf_ladder" ->
      s"""WITH cc AS (SELECT epoch_us(ts) // $DayUs AS di, COUNT(*) AS n
         |  FROM events WHERE event_type = 'click' GROUP BY 1),
         |pp AS (SELECT epoch_us(ts) // $DayUs AS di, COUNT(*) AS n
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |${(-3 to 3).map { l =>
             val tag = if (l < 0) s"m${-l}" else s"p$l"
             s"""w$tag AS (SELECT a.n AS x, b.n AS y
                |  FROM cc a JOIN pp b ON b.di = a.di + $l),
                |m$tag AS (SELECT COUNT(*) AS n,
                |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
                |    CAST(SUM(x*x) AS HUGEINT) AS sxx, CAST(SUM(y*y) AS HUGEINT) AS syy,
                |    CAST(SUM(x*y) AS HUGEINT) AS sxy
                |  FROM w$tag),
                |d$tag AS (SELECT n, n*sxy - sx*sy AS num, n*sxx - sx*sx AS d1,
                |    n*syy - sy*sy AS d2 FROM m$tag)""".stripMargin
           }.mkString(",\n")}
         |${(-3 to 3).map { l =>
             val tag = if (l < 0) s"m${-l}" else s"p$l"
             s"""SELECT 'lag_$tag' AS series, n,
                |  CASE WHEN d1 > 0 AND d2 > 0
                |    THEN num::DOUBLE / sqrt(d1::DOUBLE * d2::DOUBLE) END AS corr
                |FROM d$tag""".stripMargin
           }.mkString("\nUNION ALL\n")}
         |ORDER BY series""".stripMargin,


    // q105's exact-moment correlation CTEs instantiated per lag over the
    // shared daily register, UNION ALL'd
    "q191_acf_ladder" ->
      s"""WITH dc AS (SELECT epoch_us(ts) // $DayUs AS di, COUNT(*) AS n
         |  FROM events GROUP BY 1),
         |${Seq(1, 2, 3, 7).map { l =>
             s"""p$l AS (SELECT a.n AS x, b.n AS y
                |  FROM dc a JOIN dc b ON a.di = b.di + $l),
                |m$l AS (SELECT COUNT(*) AS n,
                |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
                |    CAST(SUM(x*x) AS HUGEINT) AS sxx, CAST(SUM(y*y) AS HUGEINT) AS syy,
                |    CAST(SUM(x*y) AS HUGEINT) AS sxy
                |  FROM p$l),
                |d$l AS (SELECT n, n*sxy - sx*sy AS num, n*sxx - sx*sx AS d1,
                |    n*syy - sy*sy AS d2 FROM m$l)""".stripMargin
           }.mkString(",\n")}
         |${Seq(1, 2, 3, 7).map { l =>
             s"""SELECT 'day_lag$l' AS series, n,
                |  CASE WHEN d1 > 0 AND d2 > 0
                |    THEN num::DOUBLE / sqrt(d1::DOUBLE * d2::DOUBLE) END AS corr
                |FROM d$l""".stripMargin
           }.mkString("\nUNION ALL\n")}
         |ORDER BY series""".stripMargin,


    // daily diff signs (zeros drop), runs = 1 + changes; the σ²-free
    // cross-multiplied Z² test on HUGEINT operands with the one-sided
    // guard
    "q192_runs_test" ->
      s"""WITH daily AS (SELECT epoch_us(o_orderdate) // $DayUs AS di,
         |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |df AS (SELECT di, cents - lag(cents) OVER (ORDER BY di) AS diff
         |  FROM daily),
         |sg AS (SELECT di, CASE WHEN diff > 0 THEN 1 ELSE -1 END AS sgn
         |  FROM df WHERE diff IS NOT NULL AND diff != 0),
         |ch AS (SELECT sgn, lag(sgn) OVER (ORDER BY di) AS prev FROM sg),
         |agg AS (SELECT
         |    CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         |    CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
         |    1 + CAST(SUM(CASE WHEN prev IS NOT NULL AND sgn != prev
         |      THEN 1 ELSE 0 END) AS BIGINT) AS runs
         |  FROM ch),
         |h AS (SELECT n_up, n_down, runs,
         |    CAST(n_up + n_down AS HUGEINT) AS nn,
         |    CAST(runs AS HUGEINT) AS rh,
         |    2 * CAST(n_up AS HUGEINT) * CAST(n_down AS HUGEINT) AS t2
         |  FROM agg)
         |SELECT n_up, n_down, runs,
         |  (t2 > nn AND
         |   2500 * (rh*nn - t2 - nn) * (rh*nn - t2 - nn) * (nn - 1)
         |     >= 9604 * t2 * (t2 - nn)) AS significant
         |FROM h""".stripMargin,


    // q53's edge CTEs + the degree-capped (<= 64, whole-hub rule) common
    // neighbor self-join; RA score = SUM(1e6 // deg(z)); anti-join drops
    // already-adjacent pairs
    "q194_link_prediction" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT x.p AS a, y.p AS b
        |      FROM li0 x JOIN li0 y ON x.o = y.o AND x.p < y.p
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |adj AS (SELECT a AS v, b AS z FROM e UNION ALL SELECT b, a FROM e),
        |dz AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
        |ac AS (SELECT adj.v, adj.z, dz.d FROM adj JOIN dz USING (z)
        |       WHERE dz.d <= 64),
        |p AS (SELECT x.v AS part_a, y.v AS part_b, x.d
        |      FROM ac x JOIN ac y ON x.z = y.z AND x.v < y.v),
        |sc AS (SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_common,
        |         CAST(SUM(1000000 // d) AS BIGINT) AS ra_ppm
        |       FROM p GROUP BY 1, 2),
        |ne AS (SELECT sc.* FROM sc LEFT JOIN e
        |         ON sc.part_a = e.a AND sc.part_b = e.b
        |       WHERE e.a IS NULL)
        |SELECT part_a, part_b, n_common, ra_ppm FROM ne
        |ORDER BY ra_ppm DESC, part_a, part_b LIMIT 20""".stripMargin,


    // q192's daily register; DW_ppm = 1e6*N*SUM(diff^2) // (N*SUM(x^2) -
    // S^2), all HUGEINT (= Spark decimal(38,0))
    "q195_durbin_watson" ->
      s"""WITH daily AS (SELECT epoch_us(o_orderdate) // $DayUs AS di,
         |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |df AS (SELECT x, x - lag(x) OVER (ORDER BY di) AS dx FROM daily),
         |agg AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         |    CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         |    CAST(COALESCE(SUM(CASE WHEN dx IS NOT NULL
         |      THEN CAST(dx AS HUGEINT) * dx END), 0) AS HUGEINT) AS sdd
         |  FROM df)
         |SELECT CAST(n AS BIGINT) AS n_days,
         |  CAST((1000000 * n * sdd) // GREATEST(n * sxx - sx * sx, 1) AS BIGINT)
         |    AS dw_ppm
         |FROM agg""".stripMargin,


    // distinct-spend register + strict-past cumulative count; tie group
    // spanning ranks [cb+1, cb+n] contributes v*(n*cb + n(n+1)/2) to
    // SUM(rank*x); all products HUGEINT (= Spark decimal(38,0))
    "q196_gini_concentration" ->
      """WITH cs AS (SELECT o_custkey,
        |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |reg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n FROM cs GROUP BY 1),
        |w AS (SELECT v, n, COALESCE(CAST(SUM(n) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb
        |  FROM reg),
        |c AS (SELECT n,
        |    CAST(v AS HUGEINT) * (CAST(n AS HUGEINT) * cb + (n * (n + 1)) // 2) AS sr,
        |    CAST(v AS HUGEINT) * n AS sv
        |  FROM w),
        |t AS (SELECT CAST(SUM(n) AS HUGEINT) AS nn, SUM(sv) AS s, SUM(sr) AS srr
        |  FROM c)
        |SELECT CAST(nn AS BIGINT) AS n_customers, CAST(s AS BIGINT) AS total_cents,
        |  CAST((1000000 * (2*srr - (nn + 1)*s)) // GREATEST(nn*s, 1) AS BIGINT)
        |    AS gini_ppm
        |FROM t""".stripMargin,


    // NTILE(10) over (spend, custkey) — Spark ntile is INT, DuckDB NTILE
    // BIGINT (rule 5 cast); HUGEINT sums, cumulative + total windows over
    // the 10-row decile frame
    "q198_lorenz_deciles" ->
      """WITH cs AS (SELECT o_custkey,
        |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |nt AS (SELECT v,
        |    CAST(NTILE(10) OVER (ORDER BY v, o_custkey) AS INTEGER) AS decile
        |  FROM cs),
        |g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS s
        |  FROM nt GROUP BY 1),
        |w AS (SELECT decile, n_customers, s,
        |    SUM(s) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(s) OVER () AS tot
        |  FROM g)
        |SELECT decile, n_customers, CAST(s AS BIGINT) AS cents,
        |  CAST((1000000 * s) // GREATEST(tot, 1) AS BIGINT) AS share_ppm,
        |  CAST((1000000 * cum) // GREATEST(tot, 1) AS BIGINT) AS cum_share_ppm
        |FROM w ORDER BY decile""".stripMargin,


    // t1/t17's pred CTE verbatim; kappa in truncating-division ppm over
    // the marginal-product register (HUGEINT = Spark decimal(38,0))
    "q197_lang_id_kappa" ->
      s"""WITH sc AS (
         |${langScoresSql()}
         |), best AS (SELECT doc_id, lang, score,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM sc),
         |pred AS (SELECT doc_id, CASE WHEN score = 0 THEN 'und' ELSE lang END AS predicted_lang
         |  FROM best WHERE rn = 1),
         |cm AS (SELECT d.lang AS actual, p.predicted_lang AS pred,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM documents d JOIN pred p USING (doc_id) GROUP BY 1, 2),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cm),
         |dg AS (SELECT CAST(COALESCE(SUM(CASE WHEN actual = pred THEN n END), 0)
         |    AS BIGINT) AS diag FROM cm),
         |rm AS (SELECT actual AS lbl, CAST(SUM(n) AS HUGEINT) AS r FROM cm GROUP BY 1),
         |co AS (SELECT pred AS lbl, CAST(SUM(n) AS HUGEINT) AS c FROM cm GROUP BY 1),
         |rc AS (SELECT COALESCE(SUM(r * c), CAST(0 AS HUGEINT)) AS src
         |  FROM rm JOIN co USING (lbl))
         |SELECT nn AS n_docs, diag AS n_agree,
         |  CAST((1000000 * (CAST(nn AS HUGEINT)*diag - src))
         |    // GREATEST(CAST(nn AS HUGEINT)*nn - src, 1) AS BIGINT) AS kappa_ppm
         |FROM tot, dg, rc""".stripMargin,

  )
}
