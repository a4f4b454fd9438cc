package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable summary sketches for 100 TB-scale profiling: KMV (distinct
  * cardinality), Count-Min (frequency), Bloom (membership) and HyperLogLog
  * (distinct cardinality, fixed-size registers). A cluster-scale engine
  * needs these wherever an exact answer would shuffle the corpus — data
  * profiling, join-size estimation, membership pruning before an expensive
  * join, per-partition distinct counting.
  *
  * Every sketch here is a DATAFRAME OF REGISTERS, not an opaque binary blob:
  *  - KMV registers merge by re-ranking the union (k smallest survive),
  *  - CMS registers merge by summing counters per (row, bucket),
  *  - Bloom registers merge by `bit_or` per word,
  *  - HLL registers merge by `max` per bucket.
  * That makes every merge a plain partial-agg'd `groupBy` — the sketches
  * compose with the engine's shuffle machinery instead of hiding state in
  * UDAF buffers, and estimates stay one SQL expression.
  *
  * Determinism/oracle parity: all hashing is the engine-portable 60-bit md5
  * prefix ([[graft.functions.GraftFunctions.md5Hash60]]), all arithmetic is
  * integer (floor divisions via Catalyst `div` ≡ DuckDB `//`; powers of two
  * via `shiftleft`), and the HLL "harmonic mean" is computed exactly as a
  * scaled sum of powers of two — no float log2 anywhere, so the estimates
  * are bit-identical across partitionings and engines. Accuracy follows the
  * standard bounds (KMV/HLL ~1/√k relative error; CMS overestimates by at
  * most ε·N with ε=e/width at depth ln(1/δ)); the integer estimators trade
  * ≤0.2% additional rounding error for exactness.
  *
  * Scale shapes: register builds are single partial-agg'd shuffles on
  * register keys (≤ m·depth rows out), never on the corpus; KMV's top-k
  * rank-filter compiles to Spark's WindowGroupLimit (per-partition top-k
  * before the merge); probes broadcast the finished sketch (≤ a few KB).
  */
object Sketches {

  /** Exact long floor-division (Catalyst IntegralDivide, SQL `div`) —
    * matches DuckDB `//` for non-negative operands at ANY magnitude. */
  private def ldiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** `1L << n` with a COLUMN shift amount (the Scala `functions.shiftleft`
    * only takes a literal Int amount; the SQL function takes expressions).
    * private[graft]: the w11 streaming drain computes the same Σ 2^(41−M)
    * register term in window form. */
  private[graft] def pow2(n: Column): Column =
    call_function("shiftleft", lit(1L), n.cast("int"))

  /** Seeded portable hash: 60-bit md5 of `"<seed>:<key>"`. */
  private def seededHash(seed: Column, key: Column): Column =
    md5Hash60(concat(seed.cast("string"), lit(":"), key.cast("string")))

  private def seedRows(n: Int): Column =
    explode(array((0 until n).map(lit): _*))

  // ------------------------------------------------------------------
  // KMV — k minimum values distinct sketch (Bar-Yossef et al. 2002)
  // ------------------------------------------------------------------

  /** KMV registers per group: the `k` smallest distinct 60-bit hashes of
    * `valueCol`, as rows `(groupCols…, rank, hv)` with `rank` 1-based by
    * ascending hash. The rank-≤-k filter over a row_number window compiles
    * to WindowGroupLimit — Spark inserts a per-partition group-limit before
    * the final per-group sort, so the full distinct-hash set is never
    * globally sorted. */
  def kmvRegisters(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int): DataFrame = {
    require(k > 1, "KMV needs k > 1 (the estimator divides by the k-th hash)")
    val g = groupCols.map(col)
    val distinctHashes = df
      .select(g :+ md5Hash60(col(valueCol)).as("hv"): _*)
      .distinct()
    val w = Window.partitionBy(g: _*).orderBy(col("hv"))
    distinctHashes
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Merge register frames (union of [[kmvRegisters]] outputs, possibly
    * from different partitions/engines/days): the k smallest distinct
    * hashes of the union are the union's exact KMV sketch. */
  def kmvMerge(regs: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("hv"))
    regs.select(g :+ col("hv"): _*).distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The KMV estimator as an expression over a register count and the k-th
    * smallest hash: exact below `k`, else `(k−1)·2⁴⁰ ÷ (h_k ÷ 2²⁰)` (the
    * classic `(k−1)/h_k` with the 60-bit hash down-scaled to 40 bits so
    * the numerator stays in int64 for any practical `k`). */
  private def kmvEstExpr(nReg: Column, hk: Column, k: Int): Column =
    when(nReg < k, nReg)
      .otherwise(ldiv(
        lit((k - 1).toLong * (1L << 40)),
        greatest(ldiv(hk, lit(1L << 20)), lit(1L))))

  /** Cardinality estimate from KMV registers. */
  def kmvEstimate(regs: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val agg = regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_reg"), max(col("hv")).as("hk"))
    agg.select(groupCols.map(col) :+
      kmvEstExpr(col("n_reg"), col("hk"), k).as("n_est"): _*)
  }

  /** Pairwise set-operation estimates across the sketch groups, from the
    * registers ALONE (the raw sets are never revisited — this is the point
    * of sketch composition): for every group pair `ga < gb`,
    * `union_est` from the merged (re-ranked) registers, `inter_est` by
    * inclusion–exclusion `max(a + b − union, 0)`, and the derived
    * `jaccard_ppm = inter·10⁶ ÷ union`. Frame sizes are
    * `pairs × 2k` rows throughout — trivial for any group count a sketch
    * summary would be built over. */
  def kmvPairwiseOps(regs: DataFrame, groupCol: String, k: Int): DataFrame = {
    val single = kmvEstimate(regs, Seq(groupCol), k)
    val groups = regs.select(col(groupCol).as("ga")).distinct()
    val pairs = groups.join(groups.select(col("ga").as("gb")), col("ga") < col("gb"))
    val ra = pairs.join(regs.select(col(groupCol).as("ga"), col("hv")), Seq("ga"))
    val rb = pairs.join(regs.select(col(groupCol).as("gb"), col("hv")), Seq("gb"))
    val merged = ra.select(col("ga"), col("gb"), col("hv"))
      .union(rb.select(col("ga"), col("gb"), col("hv")))
      .distinct()
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("hv"))
    val unionEst = merged
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("n_reg"), max(col("hv")).as("hk"))
      .select(col("ga"), col("gb"),
        kmvEstExpr(col("n_reg"), col("hk"), k).as("union_est"))
    val inter = unionEst
      .join(single.select(col(groupCol).as("ga"), col("n_est").as("a_est")), Seq("ga"))
      .join(single.select(col(groupCol).as("gb"), col("n_est").as("b_est")), Seq("gb"))
      .select(col("ga"), col("gb"), col("a_est"), col("b_est"), col("union_est"),
        greatest(col("a_est") + col("b_est") - col("union_est"), lit(0L)).as("inter_est"))
    inter.withColumn("jaccard_ppm",
      ldiv(col("inter_est") * 1000000L, greatest(col("union_est"), lit(1L))))
  }

  // ------------------------------------------------------------------
  // Count-Min — frequency sketch (Cormode & Muthukrishnan 2005)
  // ------------------------------------------------------------------

  /** Count-Min registers `(r, b, c)`: for each of `depth` hash rows,
    * bucket `b = h_r(key) % width` accumulates the total weight of keys
    * landing in it. One partial-agg'd shuffle on ≤ depth·width keys;
    * merging two sketches = `groupBy(r, b).sum(c)`. */
  def cmsBuild(
      df: DataFrame,
      key: Column,
      weight: Column,
      depth: Int,
      width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    df.select(key.cast("string").as("k"), weight.cast("long").as("w"))
      .select(seedRows(depth).as("r"), col("k"), col("w"))
      .select(col("r"), (seededHash(col("r"), col("k")) % width).as("b"), col("w"))
      .groupBy("r", "b")
      .agg(sum(col("w")).as("c"))
  }

  /** Point estimates for `probes(keyCol)`: `min_r c[r][h_r(key)]` — an
    * upper bound on the true weight (CMS never underestimates). The sketch
    * (≤ depth·width rows) broadcasts; the probe side never shuffles except
    * the final tiny per-key min. */
  def cmsLookup(
      cms: DataFrame,
      probes: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int): DataFrame = {
    val cells = probes
      .select(col(keyCol))
      .distinct()
      .select(col(keyCol), seedRows(depth).as("r"))
      .select(col(keyCol), col("r"),
        (seededHash(col("r"), col(keyCol)) % width).as("b"))
    cells.join(broadcast(cms), Seq("r", "b"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("n_est"))
  }

  /** JOIN-SIZE ESTIMATE from two CMS registers alone (the Cormode &
    * Muthukrishnan inner-product estimator): for each hash row `r`,
    * `Σ_b cA[r][b]·cB[r][b]` NEVER underestimates the true equi-join
    * cardinality `Σ_k fA(k)·fB(k)` (collisions only add non-negative cross
    * terms), so the min over rows is a certified upper bound. This is the
    * "how big is the join before I shuffle it" planning primitive: both
    * sketches are ≤ depth·width-row frames mergeable across
    * partitions/days/engines, and the estimate runs on registers only —
    * the corpora are never rescanned.
    *
    * Returns one row `(join_size_est)`. Sizing under ANSI mode: each cell
    * product is ≤ (N_A/width + skew)·(N_B/width + skew) — keep
    * `N_A·N_B/width` well under 2⁶³ (width 2¹⁶ covers two 10¹²-row sides;
    * a heavy-hitter key pair contributes fA·fB exactly, same as the true
    * join). Rows with no overlapping cells contribute a zero dot (the
    * estimate is then exactly 0 ≥ truth 0). */
  def cmsInnerProduct(cmsA: DataFrame, cmsB: DataFrame, depth: Int): DataFrame = {
    require(depth > 0, "depth must be positive")
    val dots = cmsA.select(col("r"), col("b"), col("c").as("ca"))
      .join(cmsB.select(col("r"), col("b"), col("c").as("cb")), Seq("r", "b"))
      .groupBy("r")
      .agg(sum(col("ca") * col("cb")).as("dot"))
    cmsA.sparkSession.range(depth).select(col("id").as("r"))
      .join(dots, Seq("r"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("join_size_est"))
  }

  /** CMS counters MATERIALIZED as one flat array (`depth`·`width` cells,
    * cell `r·width + h_r(key) % width`), built over the fast codegen'd
    * xxhash64 — the runtime-filter form of the sketch, same bounded-collect
    * discipline as [[bloomPrunedJoin]] (8·depth·width bytes driver-side,
    * fixed by the constructor arguments; the groupBy is partial-agg'd so at
    * most depth·width rows ever shuffle regardless of input size). Not
    * oracle-portable (xxhash64), which is fine exactly where the counter
    * values never surface in results. */
  def cmsMaterializeFast(
      df: DataFrame,
      key: Column,
      depth: Int,
      width: Int): Array[Long] = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    val rows = df.select(key.as("k"))
      .select(explode(array((0 until depth).map(r =>
        fastHash(r, col("k")) % width + lit(r.toLong * width)): _*)).as("cell"))
      .groupBy("cell")
      .agg(count(lit(1)).as("c"))
      .collect()
    val arr = new Array[Long](depth * width)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Row-local "CMS estimate ≥ threshold" test against materialized
    * counters: true iff EVERY row's counter clears the threshold (the min
    * over rows is the CMS estimate, and `min ≥ t` ⇔ all ≥ t — no min
    * needed). Pure codegen'd expression — no join, no shuffle. */
  def cmsThresholdColumn(
      counters: Array[Long],
      width: Int,
      key: Column,
      threshold: Long): Column = {
    require(counters.length % width == 0, "counters length must be depth*width")
    val depth = counters.length / width
    val arr = lit(counters)
    (0 until depth).map { r =>
      element_at(arr,
        (fastHash(r, key) % width + (r.toLong * width + 1L)).cast("int")) >= threshold
    }.reduce(_ && _)
  }

  /** EXACT heavy hitters with a CMS-pruned shuffle — the sketch-as-runtime-
    * filter pattern of [[bloomPrunedJoin]] applied to aggregation: keys
    * occurring at least `threshold` times, with exact counts. A CMS built
    * over the corpus (one bounded depth·width shuffle) is materialized and
    * every row is tested ROW-LOCALLY before the groupBy; since CMS never
    * underestimates, every true heavy hitter's rows all pass (the test
    * depends only on the key — all-or-none per key, no false negatives),
    * and colliding light keys that sneak through die on the exact HAVING.
    * The result is therefore EXACTLY `groupBy(key).count() ≥ threshold` —
    * the sketch only cuts the shuffle from all keys to near-candidates,
    * which at a 100 TB long-tail key distribution is most of the bytes.
    * Size `width` ≫ expected heavy-hitter count (ε = e/width error adds
    * ≤ ε·N to every estimate — too-small widths stay correct but stop
    * pruning). */
  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      threshold: Long,
      depth: Int = 3,
      width: Int = 1024): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val counters = cmsMaterializeFast(df, col(keyCol), depth, width)
    df.filter(cmsThresholdColumn(counters, width, col(keyCol), threshold))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }

  // ------------------------------------------------------------------
  // Bloom — membership sketch (Bloom 1970)
  // ------------------------------------------------------------------

  /** Bloom filter as `(word, bits)` rows over `words`×60-bit words (60-bit
    * words keep every mask strictly positive in signed int64 on both
    * engines): each key sets `hashes` bit positions; rows aggregate with
    * `bit_or`. Merging two filters of the same geometry = `bit_or` per
    * word. Absent words are all-zero. */
  def bloomBuild(
      df: DataFrame,
      key: Column,
      words: Int,
      hashes: Int): DataFrame = {
    require(words > 0 && hashes > 0, "words and hashes must be positive")
    val m = words.toLong * 60L
    df.select(key.cast("string").as("k"))
      .distinct()
      .select(seedRows(hashes).as("i"), col("k"))
      .select((seededHash(col("i"), col("k")) % m).as("pos"))
      .select(ldiv(col("pos"), lit(60L)).as("word"),
        pow2(col("pos") % 60L).as("mask"))
      .groupBy("word")
      .agg(bit_or(col("mask")).as("bits"))
  }

  /** Membership probe: `maybe_present` ⇔ all `hashes` bit positions of the
    * key are set. No false negatives; false-positive rate follows the
    * standard `(1−e^{−kn/m})^k`. The filter broadcasts (≤ `words` rows). */
  def bloomProbe(
      bloom: DataFrame,
      probes: DataFrame,
      keyCol: String,
      words: Int,
      hashes: Int): DataFrame = {
    val m = words.toLong * 60L
    probes
      .select(col(keyCol))
      .distinct()
      .select(col(keyCol), seedRows(hashes).as("i"))
      .select(col(keyCol), (seededHash(col("i"), col(keyCol)) % m).as("pos"))
      .select(col(keyCol), ldiv(col("pos"), lit(60L)).as("word"),
        pow2(col("pos") % 60L).as("mask"))
      .join(broadcast(bloom), Seq("word"), "left")
      .select(col(keyCol),
        ((coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask"))) =!= 0L)
          .cast("long").as("hit"))
      .groupBy(keyCol)
      .agg((sum(col("hit")) === hashes.toLong).as("maybe_present"))
  }

  /** Seeded non-negative xxhash64 — the FAST hash for the runtime-filter
    * path: a native codegen'd expression, ~50× cheaper per row than the
    * md5-hex portability hash. Not oracle-portable (DuckDB has no
    * xxhash64), which is fine exactly where bloom internals don't surface
    * in results (the pruned join's oracle is the plain join). */
  private def fastHash(seed: Int, key: Column): Column =
    xxhash64(lit(seed), key).bitwiseAND(Long.MaxValue)

  /** Bloom build over the fast hash — same geometry/merge as
    * [[bloomBuild]], for filters whose bits never need cross-engine
    * parity. */
  def bloomBuildFast(
      df: DataFrame,
      key: Column,
      words: Int,
      hashes: Int): DataFrame = {
    require(words > 0 && hashes > 0, "words and hashes must be positive")
    val m = words.toLong * 60L
    df.select(key.as("k"))
      .distinct()
      .select(explode(array((0 until hashes).map(i =>
        fastHash(i, col("k")) % m): _*)).as("pos"))
      .select(ldiv(col("pos"), lit(60L)).as("word"),
        pow2(col("pos") % 60L).as("mask"))
      .groupBy("word")
      .agg(bit_or(col("mask")).as("bits"))
  }

  /** Row-local membership test against a MATERIALIZED bloom (the `words`
    * bit-words as a literal array): true iff all `hashes` positions are
    * set. A pure codegen'd expression — no join, no shuffle — which is
    * what makes the bloom usable as a pre-shuffle runtime filter. Uses the
    * fast hash; pair with [[bloomBuildFast]]. */
  def bloomFilterColumn(
      bits: Array[Long],
      key: Column,
      hashes: Int): Column = {
    val m = bits.length.toLong * 60L
    val arr = lit(bits)
    (0 until hashes).map { i =>
      val pos = fastHash(i, key) % m
      (element_at(arr, (ldiv(pos, lit(60L)) + 1L).cast("int"))
        .bitwiseAND(pow2(pos % 60L))) =!= 0L
    }.reduce(_ && _)
  }

  /** Bloom-pruned equi-join — the runtime-filter pattern: build a bloom
    * over the (already filtered, selective) build side's keys, drop probe
    * rows whose key misses it BEFORE the shuffle, then join. False
    * positives pass the filter and are eliminated by the join itself, so
    * the result is EXACTLY the plain join — the sketch only cuts shuffled
    * bytes (here by the build side's selectivity; Spark's own AQE bloom
    * pushdown is the same move, this makes it explicit and portable).
    * Both hash legs are codegen'd xxhash64 — the per-row cost is two
    * native hashes, not an md5 hex round-trip.
    *
    * The filter materializes driver-side — bounded at 8·`words` bytes by
    * the constructor argument, the same bounded-collect discipline as a
    * broadcast threshold. Size `words` for the EXPECTED build-side keys at
    * full scale (bits ≈ 20× keys for ~1% FP at 3 hashes) — an undersized
    * filter stays correct but stops pruning. */
  def bloomPrunedJoin(
      build: DataFrame,
      probe: DataFrame,
      buildKey: String,
      probeKey: String,
      words: Int,
      hashes: Int): DataFrame = {
    val rows = bloomBuildFast(build, col(buildKey), words, hashes).collect()
    val bits = new Array[Long](words)
    rows.foreach(r => bits(r.getLong(0).toInt) = r.getLong(1))
    probe
      .filter(bloomFilterColumn(bits, col(probeKey), hashes))
      .join(build, col(probeKey) === col(buildKey))
  }

  // ------------------------------------------------------------------
  // Log-histogram — mergeable quantile sketch (DDSketch-shaped, integer)
  // ------------------------------------------------------------------

  /** Log-histogram bucket id of a non-negative long, with `2^s` linear
    * sub-buckets per octave (DDSketch's relative-accuracy idea in exact
    * integer form): values below `2^s` map to themselves (exact), larger
    * values to `(bitlength−s)·2^s + (v >> (bitlength−1−s)) − 2^s`. Ids are
    * contiguous and order-preserving; relative bucket width ≤ `2^−s`.
    * `bitlength` is `length(bin(v))` — exact on both engines. */
  def logBucket(v: Column, s: Int): Column = {
    val e = length(bin(v))
    when(v < (1L << s), v)
      .otherwise((e - s).cast("long") * (1L << s) +
        call_function("shiftright", v, (e - 1 - s).cast("int")) - (1L << s))
  }

  /** Inclusive lower bound of a bucket id — the deterministic
    * representative a quantile lookup returns. */
  def logBucketLow(id: Column, s: Int): Column = {
    val k = call_function("shiftright", id, lit(s))
    val sub = id.bitwiseAND((1L << s) - 1L)
    when(id < (1L << s), id)
      .otherwise(pow2(k + (s - 1)) + call_function("shiftleft", sub, (k - 1).cast("int")))
  }

  /** The same bucket id / lower bound as ANSI SQL (for oracles). */
  def logBucketSql(v: String, s: Int): String =
    s"(CASE WHEN $v < ${1L << s} THEN $v ELSE " +
      s"(length(bin($v)) - $s) * ${1L << s} + " +
      s"($v >> CAST(length(bin($v)) - ${1 + s} AS INTEGER)) - ${1L << s} END)"

  def logBucketLowSql(id: String, s: Int): String =
    s"(CASE WHEN $id < ${1L << s} THEN $id ELSE " +
      s"(1::BIGINT << CAST(($id >> $s) + ${s - 1} AS INTEGER)) + " +
      s"(($id & ${(1L << s) - 1}) << CAST(($id >> $s) - 1 AS INTEGER)) END)"

  /** Quantile-sketch registers per group: `(groupCols…, id, cnt)` — one
    * partial-agg'd shuffle on ≤ a-few-hundred bucket keys per group
    * (64·2^s buckets cover the full long range). Merge = sum per
    * (group, id). Values must be non-negative longs — quantize doubles
    * first (the repo-wide ×100/×1000 convention). */
  def logHistSketch(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      s: Int = 3): DataFrame = {
    require(s >= 1 && s <= 6, "sub-bucket bits s must be in [1, 6]")
    val g = groupCols.map(col)
    df.select(g :+ logBucket(col(valueCol), s).as("id"): _*)
      .groupBy(g :+ col("id"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from the sketch: for each requested ppm quantile,
    * the lower bound of the first bucket whose cumulative count reaches
    * `k = ⌈q·n⌉` (exact integer ceiling). Relative error ≤ the bucket
    * width `2^−s`. The cumulative window runs over register rows (hundreds
    * per group), never the data. */
  def logHistQuantiles(
      sketch: DataFrame,
      groupCols: Seq[String],
      quantilesPpm: Seq[Long],
      s: Int = 3): DataFrame = {
    require(quantilesPpm.nonEmpty, "need at least one quantile")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(g: _*)))
    val qs = explode(array(quantilesPpm.map(lit): _*)).as("q_ppm")
    cum.select(g ++ Seq(col("id"), col("cum"), col("n")): _*)
      .select(g ++ Seq(col("id"), col("cum"), col("n"), qs): _*)
      .filter(col("cum") >=
        greatest(ldiv(col("q_ppm") * col("n") + 999999L, lit(1000000L)), lit(1L)))
      .groupBy(g :+ col("q_ppm"): _*)
      .agg(min(col("id")).as("id"))
      .select(g ++ Seq(col("q_ppm"), logBucketLow(col("id"), s).as("q_est")): _*)
  }

  // ------------------------------------------------------------------
  // HLL — HyperLogLog distinct sketch (Flajolet et al. 2007), integer form
  // ------------------------------------------------------------------

  /** HLL registers per group: bucket `idx = h % m`, register = max over the
    * bucket's values of `rho(w)` where `w = (h ÷ m) mod 2⁴⁰` (the 40-bit
    * suffix) and `rho` = position of the highest set bit from the top,
    * i.e. `41 − bitlength(w)` (41 for w = 0). `bitlength` is exact on both
    * engines as `length(bin(w))` — no float log2. One partial-agg'd
    * shuffle on ≤ m keys per group; merge = `max` per (group, idx). */
  def hllRegisters(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      m: Int): DataFrame = {
    require(m > 1, "HLL needs at least 2 buckets")
    val g = groupCols.map(col)
    val h = md5Hash60(col(valueCol))
    val w40 = ldiv(h, lit(m.toLong)) % (1L << 40)
    val rho = when(w40 === 0L, lit(41))
      .otherwise(lit(41) - length(bin(w40)))
    df.select(g ++ Seq((h % m).as("idx"), rho.as("rho")): _*)
      .groupBy(g :+ col("idx"): _*)
      .agg(max(col("rho")).as("mreg"))
  }

  /** Sliding-window register merge — WHY mergeable sketches exist in a
    * time-partitioned pipeline: per-unit (hour/day) registers are built
    * once, and every overlapping window is a max-merge of `width`
    * register frames, never a re-scan of the raw data. Each register row
    * contributes to window-ends `[unit, unit + width − 1]` via a row-local
    * explode, followed by ONE partial-agg'd shuffle on ≤ |units|·m
    * register keys; ends are restricted to units that exist. Output has
    * the same (win_end, idx, mreg) shape, so [[hllEstimate]] applies
    * unchanged. */
  def slidingRegisterMerge(regs: DataFrame, unitCol: String, width: Int): DataFrame = {
    require(width >= 1, "window width in units must be >= 1")
    val ends = regs.select(col(unitCol).as("win_end")).distinct()
    regs.select(col("idx"), col("mreg"),
        explode(sequence(col(unitCol), col(unitCol) + (width - 1))).as("win_end"))
      .join(ends, "win_end")
      .groupBy("win_end", "idx")
      .agg(max(col("mreg")).as("mreg"))
  }

  /** Raw HLL estimate from registers, all-integer: the harmonic-mean
    * denominator `Σ 2^{−M_j}` is computed exactly as `S = Σ 2^{41−M_j}`
    * (empty registers contribute `2⁴¹`; with `M_j ∈ [1,41]` every term is
    * an integer), then `E = α_pm · (m²·2⁴¹ ÷ S) ÷ 1000` with `α_pm` the
    * per-mille bias constant (709 for m=64, 7213/(1+1.079/m)·(1/10) in
    * general). This is the RAW estimator — no small/large-range
    * corrections (they need `ln`; KMV covers the small range exactly). */
  def hllEstimate(
      regs: DataFrame,
      groupCols: Seq[String],
      m: Int,
      alphaPm: Int = 709): DataFrame = {
    val agg = regs.groupBy(groupCols.map(col): _*)
      .agg(sum(pow2(lit(41) - col("mreg"))).as("s_present"),
        count(lit(1)).as("n_present"))
    agg.select(groupCols.map(col) :+
      hllEstimateCol(col("s_present"), col("n_present"), m, alphaPm).as("n_est"): _*)
  }

  /** The raw-estimate formula over present-register aggregates
    * (`sPresent = Σ 2^(41−M)` over present registers, `nPresent` = their
    * count) as ONE Column — single source shared by [[hllEstimate]]'s
    * group-by path and w11's window-over-drained-registers path (the
    * r9 single-source rule: a comment promising "identical arithmetic"
    * is exactly the drift a shared helper prevents). */
  private[graft] def hllEstimateCol(
      sPresent: Column, nPresent: Column, m: Int, alphaPm: Int = 709): Column = {
    val s = sPresent + (lit(m.toLong) - nPresent) * (1L << 41)
    ldiv(lit(alphaPm.toLong) * ldiv(lit(m.toLong * m.toLong * (1L << 41)), s),
      lit(1000L))
  }
}
