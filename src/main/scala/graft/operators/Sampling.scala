package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting.
  *
  * A 100 TB training pipeline needs samples and train/val/test splits that
  * are (a) reproducible across runs and engines (no RNG, no
  * partition-order sensitivity), (b) decided row-locally with zero shuffle,
  * and (c) stable under re-partitioning and incremental reruns — a document
  * keeps its split forever. All of that falls out of hashing the stable row
  * key: the sample is a pure per-row filter that Catalyst pushes into the
  * scan, so sampling 10% of 100 TB reads the column it hashes and nothing
  * else.
  *
  * The bucket is the LAST two hex digits of md5(key) — 256 equal-probability
  * buckets, reproducible in any engine with md5 (the DuckDB oracle uses
  * strpos arithmetic over the same digits).
  */
object Sampling {

  /** 0..255 bucket from the last two md5 hex digits of the key's string
    * form. */
  def md5Bucket256(key: Column): Column =
    conv(substring(md5(key.cast("string")), 31, 2), 16, 10).cast("long")

  /** Uniform deterministic ppm in [0, 10⁶) from the repo-standard 60-bit
    * md5 hash (≡ DuckDB `substr(md5(k),1,15)` as a long). */
  def md5Ppm(key: Column): Column =
    graft.functions.GraftFunctions.md5Hash60(key) % 1000000L

  /** Keep rows whose bucket < `keepBuckets` (of 256) — a deterministic
    * ~keepBuckets/256 sample, uniform within every stratum because md5 is
    * independent of any data column. */
  def deterministicSample(df: DataFrame, keyCol: String, keepBuckets: Int): DataFrame = {
    require(keepBuckets >= 0 && keepBuckets <= 256, "keepBuckets is out of 256")
    df.filter(md5Bucket256(col(keyCol)) < keepBuckets)
  }

  /** Split label from bucket thresholds: bucket < trainUpTo → "train",
    * < valUpTo → "val", else "test". Defaults ≈ 78/11/11. */
  def splitCol(key: Column, trainUpTo: Int = 200, valUpTo: Int = 228): Column = {
    val b = md5Bucket256(key)
    when(b < trainUpTo, "train").when(b < valUpTo, "val").otherwise("test")
  }

  /** Cap every stratum at `cap` rows, keeping a deterministic pseudo-random
    * subset: rank rows within the stratum by md5(key) and keep rank ≤ cap.
    * This is corpus rebalancing for training mixes (e.g. at most N docs per
    * language/source) — hash-ordered so the kept subset is uniform, stable
    * across runs, and independent of storage order. One shuffle on the
    * stratum key; skewed strata are bounded by the window's per-partition
    * streaming (rank is computed without materializing the stratum). */
  def stratifiedCap(
      df: DataFrame,
      strataCols: Seq[String],
      keyCol: String,
      cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= cap)
  }

  /** Deterministic mixture sampling — build a training mix to target
    * proportions: stratum `s` contributes at most `floor(total·wₛ/10⁶)`
    * rows (`weightsPpm`, parts-per-million; strata absent from the map
    * contribute nothing), chosen hash-ranked like [[stratifiedCap]] so the
    * selection is uniform within the stratum, stable across runs, and
    * independent of storage order. Under-populated strata yield what they
    * have (floor + integer ppm keeps both engines bit-identical; no
    * probabilistic rounding). Same scale shape as stratifiedCap: one
    * shuffle on the stratum column, streaming window rank. */
  def mixtureSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      weightsPpm: Map[String, Long],
      total: Long): DataFrame = {
    require(total >= 0 && weightsPpm.values.forall(_ >= 0), "weights and total must be non-negative")
    val limit = weightsPpm.foldLeft(lit(0L)) { case (acc, (s, ppm)) =>
      when(col(strataCol) === s, lit(total * ppm / 1000000L)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= limit)
  }

  /** Deterministic epoch UPSAMPLING — the training-mix counterpart of
    * [[mixtureSample]] for weights > 1: a stratum assigned `epochsPpm`
    * = 2 500 000 repeats every document twice and a deterministic
    * md5-chosen half of them a third time. Per doc:
    * `copies = epochs div 10⁶ + (1 if md5_ppm(key) < epochs mod 10⁶)`,
    * emitted as (row ✕ copy_idx) via `sequence`/`explode`. Strata absent
    * from the map get 0 copies (dropped).
    *
    * Scale shape: pure row-local projection + explode — zero shuffle, output
    * rows ∝ epochs. The md5 coin is keyed (not random), so the same doc
    * always gets the same copy count — reproducible mixes, exact oracle. */
  def epochUpsample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      epochsPpm: Map[String, Long]): DataFrame = {
    require(epochsPpm.values.forall(_ >= 0), "epochsPpm must be non-negative")
    val epochs = epochsPpm.foldLeft(lit(0L)) { case (acc, (s, ppm)) =>
      when(col(strataCol) === s, lit(ppm)).otherwise(acc)
    }
    val hashPpm = md5Ppm(col(keyCol))
    df.withColumn("n_copies",
        call_function("div", epochs, lit(1000000L)) +
          when(hashPpm < epochs % 1000000L, 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("n_copies"))))
      .drop("n_copies")
  }

  /** Deterministic SIZE-WEIGHTED sampling: keep the `k` rows of each
    * stratum with the smallest integer priority
    * `md5_ppm(key)·10⁶ div max(weight, 1)` — the deterministic analogue of
    * priority / weighted-reservoir sampling (Efraimidis–Spirakis shape):
    * heavier rows draw proportionally smaller priorities, so inclusion
    * probability grows with weight, while the md5 coin keeps the choice
    * reproducible and engine-portable (exact integer arithmetic, no
    * float log). The training-data use: sample documents ∝ token count so
    * a byte-budgeted subcorpus is token-representative, not doc-count-
    * representative.
    *
    * Scale shape: one shuffle on the stratum key, rank window only. */
  def weightedPrioritySample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k >= 0, "k must be non-negative")
    val priority = call_function("div",
      md5Ppm(col(keyCol)) * 1000000L, greatest(col(weightCol).cast("long"), lit(1L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("priority"), col(keyCol))
    df.withColumn("priority", priority)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic CONTEXT PACKING — assign documents to fixed token-budget
    * bins (training-context assembly): within each stratum, documents in
    * key order accumulate tokens; a document's bin is
    * `exclusive_prefix_tokens div budget`. The greedy-first-fit refinement
    * is sequential by nature; this prefix-sum formulation is the
    * shuffle-free approximation production packers batch with (a document
    * straddling a boundary stays in its prefix bin — bins overflow by at
    * most one document, never split one).
    *
    * Scale shape: ONE shuffle on the stratum key; the running sum and the
    * bin id ride the same window partition. Bin ids are stratum-local. */
  def contextPack(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      nTokensCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("tokens_before", coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .withColumn("bin", call_function("div", col("tokens_before"), lit(budgetTokens)))
      .drop("tokens_before")
  }

  /** Annotate every row with its (bucket, split) — the reproducible
    * train/val/test assignment. */
  /** Largest-remainder (Hamilton) apportionment of a sample budget across
    * strata, proportional to stratum size — the exact integer answer to
    * "give me 1000 docs spread like the corpus" (floats + rounding either
    * overshoot the budget or lose determinism). quota = ⌊B·n/N⌋; the
    * leftover B − Σquota goes one-each to the strata with the largest
    * remainders (ties → stratum key order), so Σalloc = B ALWAYS.
    *
    * Scale shape: one partial-agg'd count per stratum; everything after
    * runs on the STRATUM-sized frame (global windows there are fine — the
    * frame is |strata| rows, not the corpus). Pair with
    * [[stratifiedCap]]'s hash-rank to materialize the per-stratum rows. */
  def largestRemainderAlloc(
      df: DataFrame,
      strataCols: Seq[String],
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val g = strataCols.map(col)
    val strata = df.groupBy(g: _*).agg(count(lit(1)).as("n_rows"))
    val wAll = Window.partitionBy()
    val withTot = strata.withColumn("__N", sum(col("n_rows")).over(wAll))
    val quota = call_function("div", lit(budget) * col("n_rows"), col("__N"))
    val rem = (lit(budget) * col("n_rows")) % col("__N")
    val q = withTot.withColumn("quota", quota).withColumn("__rem", rem)
      .withColumn("__left", lit(budget) - sum(col("quota")).over(wAll))
      .withColumn("__rk",
        row_number().over(Window.orderBy((col("__rem").desc +: g): _*)))
    q.withColumn("extra", (col("__rk") <= col("__left")).cast("long"))
      .withColumn("alloc", col("quota") + col("extra"))
      .select(g ++ Seq(col("n_rows"), col("quota"), col("extra"), col("alloc")): _*)
  }

  /** Temperature-scaled mixture allocation (τ = ½): spread a sample budget
    * across strata proportional to √size instead of size — the standard
    * LLM-corpus mixing move (multinomial sampling with temperature, as in
    * the GPT-3 / XLM-R data recipes) that upweights small domains without
    * letting any one giant domain dominate.
    *
    * Exactness: the weight is `⌊√(n·10⁶)⌋` — one long→double conversion,
    * one IEEE sqrt, one floor, all correctly rounded and therefore
    * bit-identical across engines (the repo's canonical-double rule); the
    * apportionment over those integer weights is the same Hamilton
    * largest-remainder scheme as [[largestRemainderAlloc]], so Σalloc =
    * budget ALWAYS. Same scale shape too: one stratum count, then
    * stratum-sized windows. */
  def temperatureMixtureAlloc(
      df: DataFrame,
      strataCols: Seq[String],
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val g = strataCols.map(col)
    val strata = df.groupBy(g: _*).agg(count(lit(1)).as("n_rows"))
      .withColumn("w", floor(sqrt(col("n_rows").cast("double") * lit(1000000.0))).cast("long"))
    val wAll = Window.partitionBy()
    val withTot = strata.withColumn("__W", sum(col("w")).over(wAll))
    val quota = call_function("div", lit(budget) * col("w"), col("__W"))
    val rem = (lit(budget) * col("w")) % col("__W")
    val q = withTot.withColumn("quota", quota).withColumn("__rem", rem)
      .withColumn("__left", lit(budget) - sum(col("quota")).over(wAll))
      .withColumn("__rk",
        row_number().over(Window.orderBy((col("__rem").desc +: g): _*)))
    q.withColumn("extra", (col("__rk") <= col("__left")).cast("long"))
      .withColumn("alloc", col("quota") + col("extra"))
      .select(g ++ Seq(col("n_rows"), col("w"), col("quota"), col("extra"), col("alloc")): _*)
  }

  def trainValTestSplit(
      df: DataFrame,
      keyCol: String,
      trainUpTo: Int = 200,
      valUpTo: Int = 228): DataFrame = {
    require(0 <= trainUpTo && trainUpTo <= valUpTo && valUpTo <= 256, "thresholds must be ordered")
    df.withColumn("bucket", md5Bucket256(col(keyCol)))
      .withColumn("split", splitCol(col(keyCol), trainUpTo, valUpTo))
  }

  /** Leakage-free train/val/test split: label every doc by the md5 bucket
    * of its near-dup CLUSTER representative instead of its own id, so no
    * near-dup pair can ever cross a split boundary — both ends of any pair
    * share the representative by construction. The production remedy for
    * what [[graft.operators.Dedup.splitLeakage]] measures; row-local given
    * the cluster label (zero shuffles added to the clustering). */
  def clusterAwareSplit(
      clustered: DataFrame,
      clusterCol: String = "cluster_id",
      trainUpTo: Int = 200,
      valUpTo: Int = 228): DataFrame = {
    require(0 <= trainUpTo && trainUpTo <= valUpTo && valUpTo <= 256, "thresholds must be ordered")
    clustered.withColumn("split", splitCol(col(clusterCol), trainUpTo, valUpTo))
  }
}
