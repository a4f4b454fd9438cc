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
}
