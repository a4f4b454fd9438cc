package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the engine's LLM-pipeline operators
  * composed the way a 100 TB corpus job would run them —
  *
  *   1. quality gate (TextAnalysis.qualityScore `keep` rule);
  *   2. exact dedup: keep the min-id doc of each normalized-content group;
  *   3. near-dup removal: MinHash+LSH candidate pairs at ≥ `minEstimate`,
  *      dropping the higher id of every pair (simple deterministic rule;
  *      a doc is dropped if ANY qualifying pair names it as id_b);
  *   4. annotation: predicted language + content fingerprint + token count.
  *
  * Every stage is one of the already-audited operators, so the composition
  * inherits their scale shapes: narrow projections, hash-bucket candidate
  * generation, no all-pairs work. The whole pipeline is SQL-expressible and
  * oracle-checked end-to-end (p1_training_pipeline).
  */
object TrainingDataPipeline {

  /** `materializeCandidates` forwards to Dedup.minhashLsh — opt in for
    * batch jobs (see that method's trade-offs).
    *
    * `maxBucketSize` is the production degenerate-bucket cap, forwarded to
    * the LSH stage (see [[Dedup.capBuckets]]). With the cap on, docs of an
    * oversized band bucket generate no pairs — they SURVIVE curation
    * instead of being dropped as near-dups. That is the safe failure mode
    * (over-keep, never over-drop), and the cap bounds the pair join at
    * cap² per bucket; default off for oracle parity. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minEstimate: Double = 0.5,
      materializeCandidates: Boolean = false,
      maxBucketSize: Long = Dedup.defaultMaxBucketSize): DataFrame = {
    // 1. quality gate
    val quality = TextAnalysis.qualityScore(docs, idCol, textCol)
      .filter(col("keep"))
      .select(col(idCol), col("n_tokens"))
    val candidates = docs.join(quality, idCol)

    // 2. exact dedup (within quality survivors). exactDeduped is consumed
    // twice but its lineage is narrow projections + broadcast joins —
    // pinning it measured as a wash at sf0.1, so it stays lazy (the heavy
    // banded projection inside minhashLsh has its own checkpoint opt-in).
    val keepers = Dedup.exact(candidates, idCol, textCol, minGroupSize = 1)
      .select(col("keep_id").as(idCol))
    val exactDeduped = candidates.join(keepers, idCol)

    // 3. near-dup removal: drop id_b of every LSH pair above threshold
    val nearDupIds = Dedup.minhashLsh(exactDeduped, idCol, textCol,
      numHashes = 8, shingleSize = 3, rowsPerBand = 2, minEstimate = minEstimate,
      materializeCandidates = materializeCandidates, maxBucketSize = maxBucketSize)
      .select(col("id_b").as(idCol)).distinct()
    val surviving = exactDeduped.join(nearDupIds, Seq(idCol), "left_anti")

    // 4. annotation — plain column expressions in one projection (joining
    // the languageId/fingerprints frames back by id would re-evaluate the
    // surviving lineage three times and shuffle the corpus twice)
    surviving.select(
      col(idCol),
      TextAnalysis.predictedLangCol(col(textCol)).as("predicted_lang"),
      TextAnalysis.contentFpCol(col(textCol)).as("content_fp"),
      col("n_tokens"))
  }

  /** Curation v2 — the round-2 operators composed into the full large-corpus
    * recipe (each stage is an audited operator; the composition inherits
    * their scale shapes):
    *
    *   1. repetition gate: drop docs whose duplicate-trigram ratio ≥
    *      `maxDupPpm` (native one-pass scoring, row-local);
    *   2. decontamination: drop training docs sharing any word-8-gram with
    *      the eval corpus (broadcast eval gram set);
    *   3. near-dup clustering: transitive keep-one — only cluster keepers
    *      survive (CC over the LSH pair graph only);
    *   4. corpus rebalance: deterministic hash-ranked cap per language.
    */
  /** `materialize` checkpoints the two frames the pipeline re-reads (the
    * post-gate train set is consumed by the gram explode, the
    * decontamination re-join, and the survivor join; the survivor set by
    * the minhash self-join and the final cap) — without it every consumer
    * re-runs the full upstream lineage per pass. On by default: three
    * passes over a materialized corpus beat three recomputations of the
    * gate + overlap stages at any scale. */
  def curateV2(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      evalFilter: org.apache.spark.sql.Column,
      maxDupPpm: Long = 10000L,
      capPerLang: Int = 40,
      materialize: Boolean = true,
      strataCols: Seq[String] = Seq("lang"),
      maxBucketSize: Long = Dedup.defaultMaxBucketSize): DataFrame = {
    def pin(df: DataFrame): DataFrame = if (materialize) df.localCheckpoint(true) else df
    val repOk = TextAnalysis.repetition(docs, idCol, textCol, n = 3)
      .filter(col("dup_ppm") < maxDupPpm)
      .select(col(idCol))
    val train = pin(docs.filter(!evalFilter).join(repOk, idCol))
    val eval = docs.filter(evalFilter)
    val cleanIds = Dedup.decontaminate(train, eval, idCol, textCol, n = 8)
      .filter(!col("contaminated"))
      .select(col(idCol))
    val survivors = pin(train.join(cleanIds, idCol))
    val keeperIds = Dedup.nearDupClusters(spark, survivors, idCol, textCol,
      maxBucketSize = maxBucketSize)
      .filter(col("is_keeper"))
      .select(col(idCol))
    Sampling.stratifiedCap(survivors.join(keeperIds, idCol),
      strataCols, idCol, capPerLang)
  }

  /** TARGETED curation — the round-three tier of a curation stack: after
    * heuristic gates (curate) and dedup/decontamination (curateV2), select
    * the slice of the corpus that best matches a TARGET distribution,
    * using the corpus-trained models of [[Retrieval]]:
    *
    *   1. ban-list removal: any document containing one of the top
    *      `spanK` cross-document repeated spans ([[Dedup.repeatedSpans]])
    *      is dropped — the memorization-risk rule;
    *   2. fluency gate: per-stratum top `keepPpm` by bigram-LM fluency
    *      ([[Retrieval.bigramLmFluency]]) — adaptive (rank within the
    *      stratum), so one noisy source cannot starve clean ones and the
    *      gate needs no corpus-specific threshold;
    *   3. importance gate: per-stratum top `keepPpm` by DSIR
    *      target-likeness ([[Retrieval.dsirImportance]]).
    *
    * Output: `(id, strata, fluency_ppm, importance_ppm)` of the selected
    * documents. Deterministic end to end (rank ties break on id) and
    * SQL-expressible — oracle-checked as p3_targeted_curation.
    *
    * Scale shape: every stage inherits its operator's audited shape; the
    * ban list is `spanK` rows broadcast against a native one-pass gram
    * scan; both gates are ONE shuffle each on the stratum key (rank and
    * count share the window partition). */
  def curateTargeted(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      strataCol: String,
      isTarget: org.apache.spark.sql.Column,
      spanN: Int = 5,
      spanDf: Long = 2L,
      spanK: Int = 100,
      keepPpm: Long = 500000L): DataFrame = {
    require(keepPpm >= 0 && keepPpm <= 1000000L, "keepPpm is parts-per-million")
    def ldiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("div", a, b)
    // per-stratum adaptive keep-top gate (the adaptiveQualityFilter rule)
    def topPpm(df: DataFrame, scoreCol: String): DataFrame = {
      val part = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
      df.withColumn("__rank",
          row_number().over(part.orderBy(col(scoreCol).desc, col(idCol))))
        .withColumn("__n", count(lit(1)).over(part))
        .filter(col("__rank") <= ldiv(col("__n") * keepPpm, lit(1000000L)))
        .drop("__rank", "__n")
    }
    val ban = Dedup.repeatedSpans(docs, idCol, textCol, spanN, spanDf, spanK)
      .select("gram")
    val banned = docs
      .select(col(idCol), explode(wordNgramList(col(textCol), spanN)).as("gram"))
      .join(broadcast(ban), "gram")
      .select(col(idCol)).distinct()
    val fl = Retrieval.bigramLmFluency(docs, idCol, textCol)
      .select(col(idCol), col("fluency_ppm"))
    val imp = Retrieval.dsirImportance(docs, idCol, textCol, isTarget)
      .select(col(idCol), col("importance_ppm"))
    val cand = docs.select(col(idCol), col(strataCol))
      .join(banned, Seq(idCol), "left_anti")
      .join(fl, idCol)
      .join(imp, idCol)
    topPpm(topPpm(cand, "fluency_ppm"), "importance_ppm")
  }
}
