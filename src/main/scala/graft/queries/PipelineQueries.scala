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

/** Multimodal (m*) and composed training-data pipelines (p*). Registry split from the former monolithic
  * SparkEntry maps; aggregated by [[graft.SparkEntry]]. Each query entry
  * has its DuckDB oracle adjacent in [[PipelineQueries.oracles]]. */
private[graft] object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // targeted curation: repeated-span ban list, then per-source top-half
    // gates by LM fluency and DSIR target-likeness (adaptive ranks — no
    // corpus-specific thresholds, robust at any scale factor)
    "p3_targeted_curation" -> ((s, d) => {
      TrainingDataPipeline.curateTargeted(Tables.documents(s, d), "doc_id",
          "text", "source", isTarget = col("source") === "src1")
        .orderBy("doc_id")
    }),


    // multimodal metadata struct over the binary payload
    "m2_media_metadata" -> ((s, d) => {
      Multimodal.withPayload(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("media_meta.kind").as("kind"),
          col("media_meta.size_bytes").as("size_bytes"),
          col("media_meta.content_md5").as("content_md5"))
        .orderBy("doc_id")
    }),


    // multimodal binary-column plumbing with stubbed decoder
    "m1_multimodal_features" -> ((s, d) => {
      val docs = Multimodal.withPayload(Tables.documents(s, d), "text")
      Multimodal.decodeFeatures(docs, "doc_id")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),


    // composed curation pipeline: quality gate → exact dedup → minhash
    // near-dup removal → language/fingerprint annotation, oracle-checked
    // end-to-end
    "p1_training_pipeline" -> ((s, d) => {
      TrainingDataPipeline.curate(Tables.documents(s, d), "doc_id", "text",
        minEstimate = 0.5, materializeCandidates = true)
        .orderBy("doc_id")
    }),


    // curation v2: repetition gate → decontaminate → cluster dedup → lang cap
    "p2_curation_v2" -> ((s, d) => {
      TrainingDataPipeline.curateV2(s, Tables.documents(s, d), "doc_id", "text",
        evalFilter = col("source") === "src0")
        .select(col("doc_id"), col("lang"), col("source"), col("rank"))
        .orderBy("lang", "rank")
    }),


    // video-shaped frame sampling: every 4th 16-char frame, fingerprinted
    "m3_frame_sample" -> ((s, d) => {
      Multimodal.sampleFrames(Tables.documents(s, d), "doc_id", "text",
        frameChars = 16, stride = 4)
        .orderBy("doc_id", "frame_idx")
    }),


    // cross-media duplicate frames: sampled fingerprints shared by >= 2
    // media, with the canonical first (doc, frame) occurrence
    "m4_duplicate_frames" -> ((s, d) => {
      Multimodal.duplicateFrames(Tables.documents(s, d), "doc_id", "text",
        frameChars = 16, stride = 4, minDocs = 2L)
        .orderBy("frame_md5")
    }),


    // near-duplicate media by sampled-frame fingerprint overlap: the
    // re-encoded/re-posted-clip detector (a clip contained in a longer
    // reel scores 1e6 — the d10 containment rule on frame sets).
    // Boilerplate frames excluded by definition (df > 64); pair volume
    // bounded by the capped-df rule at any corpus size
    "m6_media_near_dup" -> ((s, d) => {
      Multimodal.mediaNearDup(Tables.documents(s, d), "doc_id", "text",
        frameChars = 16, stride = 4, maxFrameDf = 64L, minOverlapPpm = 100000L)
        .orderBy("id_a", "id_b")
    }),

    // temporal alignment of m6's near-dup media pairs: the frame OFFSET
    // aligning the most shared fingerprints (re-posted clip with an
    // added intro) — first-occurrence votes, packed-max election; the
    // candidate-pair definition is single-sourced with m6
    // (Support.mediaCandPairsSql on the oracle side)
    "m8_media_alignment" -> ((s, d) => {
      Multimodal.alignMedia(Tables.documents(s, d), "doc_id", "text")
        .orderBy("id_a", "id_b")
    }),

    // shot-boundary segmentation on the sampled-frame scene levels (the
    // m3 frame grid at stride 1): cuts where the stubbed per-frame level
    // jumps > 13 between consecutive frames, shots = cut-free runs —
    // the video curation primitive (shots/media, longest shot) that
    // feeds frame-dedup and clip-extraction decisions
    "m7_shot_boundaries" -> ((s, d) => {
      Multimodal.shotBoundaries(Tables.documents(s, d), "doc_id", "text",
        frameChars = 16, cutThreshold = 13)
        .orderBy("doc_id")
    }),

    // training-shard packing audit: media blobs assigned to fixed-size
    // shards by running byte offset (shard = prefix-bytes div target) —
    // the tar/webdataset layout plan. Global strict-past window here; at
    // fleet scale the same assignment is two-pass (per-partition byte sums
    // → broadcast offsets), which preserves the identical shard ids
    "m5_shard_packing" -> ((s, d) => {
      val m = Multimodal.withPayload(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("media_meta.size_bytes").as("sz"))
      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      m.withColumn("pre", coalesce(sum(col("sz")).over(w), lit(0L)))
        .withColumn("shard_id", expr("pre div 65536"))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_items"), sum(col("sz")).as("bytes"),
          max(col("sz")).as("max_item"))
        .orderBy("shard_id")
    }),


    // dataset card: the one-row corpus summary a training run is stamped
    // with — docs, tokens, vocabulary, exact-dup and near-dup-candidate
    // ppm, language/source spread; every number exact and composed from
    // the same primitives the dedicated queries use
    "p4_dataset_card" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(explode(tokens(col("text"))).as("tok"))
      val base = docs.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(md5(col("text"))).as("n_unique_texts"))
      val tk = toks.agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_types"))
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text", numHashes = 8,
          shingleSize = 3, rowsPerBand = 2, minEstimate = 0.5,
          materializeCandidates = true)
        .localCheckpoint(true)
      val nd = pairs.select(col("id_a"))
        .union(pairs.select(col("id_b")))
        .distinct().agg(count(lit(1)).as("n_near_dup_docs"))
      base.crossJoin(tk).crossJoin(nd)
        .select(col("n_docs"), col("n_langs"), col("n_sources"),
          col("total_chars"), col("n_tokens"), col("n_types"),
          // greatest-clamp class (a): an empty corpus is legal (empty-world gate)
          expr("((n_docs - n_unique_texts) * 1000000) div greatest(n_docs, 1)")
            .as("exact_dup_ppm"),
          expr("(n_near_dup_docs * 1000000) div greatest(n_docs, 1)").as("near_dup_ppm"))
    }),

    // release gate: the end-to-end pre-training data contract in ONE row —
    // length gate → sorted-neighborhood dedup (keep-min-id of each window
    // pair) → decontamination against the held-out src0 eval set → BPE
    // tokenizer compression learned on the survivors. Every stage is an
    // audited shape (row-local gate, O(n·w) window blocker, broadcast
    // eval-gram semi-join, vocabulary-sized merge rounds); the card
    // crossJoins one-row aggregates only (the q155 pattern)
    "p5_release_gate" -> ((s, d) => {
      val (train, q, deduped, clean) = releaseGateStages(s, d)
      val (_, t0, fin) = Bpe.learn(s, clean, rounds = 8)
      val card = Bpe.compressionAudit(t0, fin)
        .select(col("n_tokens"), col("compression_ppm"))
      train.agg(count(lit(1)).as("n_input"))
        .crossJoin(q.agg(count(lit(1)).as("n_quality")))
        .crossJoin(deduped.agg(count(lit(1)).as("n_dedup")))
        .crossJoin(clean.agg(count(lit(1)).as("n_clean")))
        .crossJoin(card)
    }),


    // the shipped artifact on top of p5's gate chain: tokenizer trained on
    // the CLEAN survivors, every clean document encoded to its id stream,
    // release manifest rolled up per lang — the end-to-end "what does the
    // training run actually ingest" number; encode replay stays
    // vocabulary-sized, the rollup is one lang-keyed partial agg
    "p6_tokenized_release" -> ((s, d) => {
      val (_, _, _, clean) = releaseGateStages(s, d)
      val (merges, _, fin) = Bpe.learn(s, clean, rounds = 8)
      Bpe.encodeDocs(clean, "doc_id", "text", merges, fin)
        .join(clean.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"),
          sum(col("n_tokens")).as("total_tokens"))
        .orderBy("lang")
    }),

    // the round-10 split machinery composed end-to-end on p5's gate chain:
    // clean survivors → near-dup clusters → CLUSTER-representative split
    // (leakage-free by construction, d34) → per-(split, lang) manifest —
    // "which shard does each clean doc ship in, and how big is each shard"
    "p7_split_release" -> ((s, d) => {
      val (_, _, _, clean) = releaseGateStages(s, d)
      val clustered = Dedup.nearDupClusters(s, clean, "doc_id", "text")
      Sampling.clusterAwareSplit(clustered)
        .select(col("doc_id"), col("split"))
        .join(clean.select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("nt")), "doc_id")
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        .orderBy("split", "lang")
    }),

    // INCREMENTAL release: a new crawl lands against a FROZEN base release
    // — the operational shape at 100 TB, where re-running the full p5
    // chain per ingest is off the table. The increment (a simulated
    // re-crawl: 20% exact re-ingests + 20% edited re-ingests under fresh
    // ids — the d28 convention; this corpus has no native increment) flows
    // through the frozen row-local gates, is exact-deduped against the
    // base's PERSISTED hash table (history participates only through
    // hashes — the d28/d15 incremental rule), deduped within itself
    // (min-id keeper), decontaminated against the frozen src0 eval set,
    // and split-assigned by the row-local d33 hash rule (no history
    // needed: the split is a FUNCTION of the id). Output is the ingest
    // funnel card: every stage's survivor count in one row. Per-ingest
    // cost tracks the INCREMENT size; the base corpus is touched once to
    // build the hash table it would already have persisted.
    "p8_incremental_release" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val increment = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
          col("lang"), col("source"))
        .unionByName(docs.filter(col("doc_id") % 5 === 1)
          .select((col("doc_id") + 200000L).as("doc_id"),
            concat(col("text"), lit(" updatedcontent")).as("text"),
            col("lang"), col("source")))
        .localCheckpoint(true)
      val gated = increment
        .filter(col("source") =!= "src0" && length(col("text")) >= 150)
      val history = docs
        .filter(col("source") =!= "src0" && col("n_chars") >= 150)
        .select(md5(normalizeText(col("text"))).as("content_hash")).distinct()
      val fresh = gated
        .withColumn("content_hash", md5(normalizeText(col("text"))))
        .join(history, Seq("content_hash"), "left_anti")
      val kept = fresh
        .withColumn("rn", row_number().over(
          Window.partitionBy("content_hash").orderBy("doc_id")))
        .filter(col("rn") === 1).drop("rn")
        .localCheckpoint(true)
      val contaminated = Dedup.decontaminate(kept,
          docs.filter(col("source") === "src0"), "doc_id", "text", n = 8)
        .filter(col("contaminated")).select("doc_id")
      val clean = kept.join(contaminated, Seq("doc_id"), "left_anti")
        .withColumn("split", Sampling.splitCol(col("doc_id")))
        .localCheckpoint(true)
      increment.agg(count(lit(1)).as("n_increment"))
        .crossJoin(gated.agg(count(lit(1)).as("n_gated")))
        .crossJoin(fresh.agg(count(lit(1)).as("n_fresh")))
        .crossJoin(kept.agg(count(lit(1)).as("n_kept")))
        .crossJoin(clean.agg(count(lit(1)).as("n_clean"),
          coalesce(sum(when(col("split") === "train", 1L).otherwise(0L)), lit(0L))
            .as("n_train"),
          coalesce(sum(when(col("split") === "val", 1L).otherwise(0L)), lit(0L))
            .as("n_val"),
          coalesce(sum(when(col("split") === "test", 1L).otherwise(0L)), lit(0L))
            .as("n_test")))
    }),

  )

  /** p5/p6's shared gate chain (single-sourced so the release card and the
    * tokenized release can never drift): length gate → sorted-neighborhood
    * dedup → decontamination. Returns (train, quality, deduped, clean);
    * deduped and clean are checkpointed (each is read by ≥2 consumers). */
  private def releaseGateStages(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("source") =!= "src0")
    val evalSet = docs.filter(col("source") === "src0")
    val q = train.filter(col("n_chars") >= 150)
    val losers = Dedup.sortedNeighborhoodJaccard(q, "doc_id", "text",
        partitionCols = Seq("lang"), keyLen = 24, window = 4, n = 3,
        minJaccard = 0.5)
      .select(col("id_b").as("doc_id")).distinct()
    val deduped = q.join(losers, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val contaminated = Dedup.decontaminate(deduped, evalSet, "doc_id", "text",
        n = 8)
      .filter(col("contaminated")).select("doc_id")
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    (train, q, deduped, clean)
  }

  val oracles: Map[String, String] = Map(

    // composed targeted curation: ban-list anti-join (top repeated spans),
    // then two chained per-source keep-top-half rank gates (fluency, DSIR
    // importance) — each stage's CTE is the verbatim standalone oracle
    "p3_targeted_curation" ->
      s"""WITH ban AS (SELECT gram FROM ($repeatedSpansSql)),
         |rw2 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |dg AS (SELECT doc_id, ${wordGramSql(5)} AS gram
         |  FROM rw2, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)),
         |bd AS (SELECT DISTINCT doc_id FROM dg JOIN ban USING (gram)),
         |fl AS (SELECT doc_id, fluency_ppm FROM ($lmFluencySql)),
         |imp AS (SELECT doc_id, importance_ppm FROM ($dsirImportanceSql)),
         |cand AS (SELECT d.doc_id, d.source, fl.fluency_ppm, imp.importance_ppm
         |  FROM documents d JOIN fl USING (doc_id) JOIN imp USING (doc_id)
         |  WHERE d.doc_id NOT IN (SELECT doc_id FROM bd)),
         |g1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY fluency_ppm DESC, doc_id) AS r,
         |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n FROM cand),
         |k1 AS (SELECT doc_id, source, fluency_ppm, importance_ppm FROM g1
         |  WHERE r <= (n*500000)//1000000),
         |g2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY importance_ppm DESC, doc_id) AS r,
         |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n FROM k1)
         |SELECT doc_id, source, fluency_ppm, importance_ppm FROM g2
         |WHERE r <= (n*500000)//1000000 ORDER BY doc_id""".stripMargin,


    "m2_media_metadata" ->
      """SELECT doc_id, 'image/fake' AS kind,
        |  octet_length(encode(text))::BIGINT AS size_bytes,
        |  md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,


    "m1_multimodal_features" ->
      """SELECT doc_id, octet_length(encode(text))::BIGINT AS size_bytes,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  list_sum(list_prepend(0::BIGINT,
        |    [ascii(substr(text, i, 1))::BIGINT for i in range(1, length(text)+1)]))::BIGINT % 1000000007 AS byte_sum_mod
        |FROM documents ORDER BY doc_id""".stripMargin,


    "p1_training_pipeline" ->
      s"""WITH m AS (${qualityMetricsSql("documents")}),
         |q AS (SELECT doc_id, n_tokens FROM m
         |      WHERE n_tokens >= 10 AND n_tokens <= 100000
         |        AND (CASE WHEN n_chars > 0 THEN alpha_len*1000000//n_chars ELSE 0 END) >= 500000),
         |cand AS (SELECT d.*, q.n_tokens FROM documents d JOIN q USING (doc_id)),
         |keepers AS (SELECT MIN(doc_id) AS doc_id
         |            FROM (SELECT doc_id, md5($normSql) AS h FROM cand) GROUP BY h),
         |ed AS (SELECT c.* FROM cand c JOIN keepers USING (doc_id)),
         |${minhashPairsSql("ed")},
         |dropped AS (SELECT DISTINCT id_b AS doc_id FROM mh_pairs WHERE jaccard_est >= 0.5),
         |surv AS (SELECT * FROM ed ANTI JOIN dropped USING (doc_id)),
         |sc AS (
         |${langScoresSql("surv")}
         |), best AS (SELECT doc_id, lang, score,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM sc)
         |SELECT s.doc_id,
         |  (SELECT CASE WHEN b.score = 0 THEN 'und' ELSE b.lang END
         |   FROM best b WHERE b.rn = 1 AND b.doc_id = s.doc_id) AS predicted_lang,
         |  md5($normSql) AS content_fp, s.n_tokens
         |FROM surv s ORDER BY s.doc_id""".stripMargin,


    "p2_curation_v2" ->
      s"""WITH RECURSIVE
         |rw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |rg AS (SELECT doc_id, substr(md5(${wordGramSql(3)}), 1, 15) AS h
         |    FROM rw, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
         |ra AS (SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT h) AS nd
         |    FROM rg GROUP BY doc_id),
         |rep_ok AS (SELECT d.doc_id FROM documents d LEFT JOIN ra USING (doc_id)
         |    WHERE CASE WHEN COALESCE(ra.n, 0) > 0
         |      THEN FLOOR((ra.n - ra.nd) * 1000000 / ra.n) ELSE 0 END < 10000),
         |train AS (SELECT d.doc_id, d.text, d.lang, d.source
         |    FROM documents d JOIN rep_ok USING (doc_id) WHERE d.source <> 'src0'),
         |tw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM train),
         |tg AS (SELECT DISTINCT doc_id, substr(md5(${wordGramSql(8)}), 1, 15) AS h
         |    FROM tw, UNNEST(generate_series(1, len(ws) - 7)) AS t(i)),
         |ew AS (SELECT string_split(text, ' ') AS ws FROM documents WHERE source = 'src0'),
         |eg AS (SELECT DISTINCT substr(md5(${wordGramSql(8)}), 1, 15) AS h
         |    FROM ew, UNNEST(generate_series(1, len(ws) - 7)) AS t(i)),
         |contaminated AS (SELECT DISTINCT doc_id FROM tg JOIN eg USING (h)),
         |surv AS (SELECT t.* FROM train t LEFT JOIN contaminated c USING (doc_id)
         |    WHERE c.doc_id IS NULL),
         |${minhashPairsSql("surv")},
         |$clusterCompSql,
         |kept AS (SELECT s.doc_id, s.lang, s.source
         |    FROM surv s LEFT JOIN cl_comp c USING (doc_id)
         |    WHERE COALESCE(c.cluster_id, s.doc_id) = s.doc_id),
         |ranked AS (SELECT doc_id, lang, source, ROW_NUMBER() OVER
         |    (PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) AS rank
         |  FROM kept)
         |SELECT doc_id, lang, source, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 40 ORDER BY lang, rank""".stripMargin,


    "m3_frame_sample" ->
      """WITH f AS (SELECT doc_id, text,
        |    CAST(FLOOR(length(text)/16.0) AS BIGINT) AS nf FROM documents),
        |s AS (SELECT doc_id, text, unnest(range(0, nf, 4)) AS frame_idx
        |      FROM f WHERE nf > 0)
        |SELECT doc_id, frame_idx,
        |  md5(substr(text, CAST(frame_idx*16 + 1 AS INTEGER), 16)) AS frame_md5
        |FROM s ORDER BY doc_id, frame_idx""".stripMargin,


    // same frame CTE as m3; pair packed as doc*2^20+idx so MIN is one
    // comparable BIGINT on both engines
    "m4_duplicate_frames" ->
      """WITH f AS (SELECT doc_id, text,
        |    CAST(FLOOR(length(text)/16.0) AS BIGINT) AS nf FROM documents),
        |s AS (SELECT doc_id, text, unnest(range(0, nf, 4)) AS frame_idx
        |      FROM f WHERE nf > 0),
        |fr AS (SELECT doc_id, frame_idx,
        |         md5(substr(text, CAST(frame_idx*16 + 1 AS INTEGER), 16)) AS frame_md5
        |       FROM s),
        |g AS (SELECT frame_md5, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_frames,
        |        MIN(doc_id * 1048576 + frame_idx) AS fp
        |      FROM fr GROUP BY frame_md5)
        |SELECT frame_md5, n_docs, n_frames,
        |  fp // 1048576 AS first_doc, fp % 1048576 AS first_idx
        |FROM g WHERE n_docs >= 2 ORDER BY frame_md5""".stripMargin,


    // m3's frame CTE distinct'd per media; df-capped shared-fingerprint
    // pairs; overlap coefficient vs the smaller frame set
    "m6_media_near_dup" ->
      s"""WITH ${mediaCandPairsSql(100000L)}
         |SELECT id_a, id_b, inter, na, nb, overlap_ppm FROM mcand
         |ORDER BY id_a, id_b""".stripMargin,

    // m6's shared pair chain + stride-1 first-occurrence frames for the
    // candidate ids only; shift votes; packed-max n*2^21 + (2^20 - shift)
    "m8_media_alignment" ->
      s"""WITH ${mediaCandPairsSql(100000L)},
         |ids AS (SELECT id_a AS id FROM mcand UNION SELECT id_b FROM mcand),
         |s1 AS (SELECT doc_id, text, unnest(range(0, nf)) AS fi1
         |      FROM f JOIN ids ON f.doc_id = ids.id WHERE nf > 0),
         |fo AS (SELECT doc_id AS id,
         |    md5(substr(text, CAST(fi1*16 + 1 AS INTEGER), 16)) AS h,
         |    CAST(MIN(fi1) AS BIGINT) AS fi
         |  FROM s1 GROUP BY 1, 2),
         |mt AS (SELECT c.id_a, c.id_b, b.fi - a.fi AS shift
         |  FROM mcand c JOIN fo a ON a.id = c.id_a
         |  JOIN fo b ON b.id = c.id_b AND a.h = b.h),
         |cnt AS (SELECT id_a, id_b, shift, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM mt GROUP BY 1, 2, 3),
         |el AS (SELECT id_a, id_b,
         |    MAX(n * 2097152 + (1048576 - shift)) AS pk FROM cnt GROUP BY 1, 2)
         |SELECT id_a, id_b, CAST(pk // 2097152 AS BIGINT) AS n_aligned,
         |  CAST(1048576 - (pk % 2097152) AS BIGINT) AS best_shift
         |FROM el ORDER BY id_a, id_b""".stripMargin,

    // m3's frame grid at stride 1; level = ascii of the frame's first
    // char; cut flag via lag (NULL first row -> 0 in both engines);
    // islands = running cut sum
    "m7_shot_boundaries" ->
      """WITH f AS (SELECT doc_id, text,
        |    CAST(FLOOR(length(text)/16.0) AS BIGINT) AS nf FROM documents),
        |s AS (SELECT doc_id, text, unnest(range(0, nf)) AS fi
        |      FROM f WHERE nf > 0),
        |lv AS (SELECT doc_id, fi,
        |    ascii(substr(text, CAST(fi*16 + 1 AS INTEGER), 1)) AS lvl FROM s),
        |ct AS (SELECT doc_id, fi, CASE WHEN abs(lvl - lag(lvl) OVER
        |    (PARTITION BY doc_id ORDER BY fi)) > 13 THEN 1 ELSE 0 END AS cut
        |  FROM lv),
        |rn AS (SELECT doc_id, CAST(SUM(cut) OVER (PARTITION BY doc_id
        |    ORDER BY fi ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run FROM ct),
        |sh AS (SELECT doc_id, run, CAST(COUNT(*) AS BIGINT) AS len
        |  FROM rn GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(len) AS BIGINT) AS n_frames,
        |  CAST(MAX(run) + 1 AS BIGINT) AS n_shots,
        |  CAST(MAX(len) AS BIGINT) AS longest_shot
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // strict-past byte prefix sum → fixed-size shard id
    "m5_shard_packing" ->
      """WITH m AS (SELECT doc_id, octet_length(encode(text))::BIGINT AS sz
        |  FROM documents),
        |w AS (SELECT sz, COALESCE(CAST(SUM(sz) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |    AS pre
        |  FROM m)
        |SELECT pre // 65536 AS shard_id, COUNT(*) AS n_items,
        |  CAST(SUM(sz) AS BIGINT) AS bytes, MAX(sz) AS max_item
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,


    // base registers + token registers + near-dup doc set from mh_pairs
    "p4_dataset_card" ->
      s"""WITH ${minhashPairsSql("documents")},
         |base AS (SELECT COUNT(*) AS n_docs,
         |    COUNT(DISTINCT lang) AS n_langs,
         |    COUNT(DISTINCT source) AS n_sources,
         |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |    COUNT(DISTINCT md5(text)) AS n_unique_texts
         |  FROM documents),
         |tk AS (SELECT COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_types
         |  FROM (SELECT unnest($toksSql) AS tok FROM documents)),
         |nd AS (SELECT COUNT(*) AS n_near_dup_docs FROM (
         |  SELECT id_a AS d FROM mh_pairs WHERE jaccard_est >= 0.5
         |  UNION SELECT id_b FROM mh_pairs WHERE jaccard_est >= 0.5))
         |SELECT n_docs, n_langs, n_sources, total_chars, n_tokens, n_types,
         |  CAST(((n_docs - n_unique_texts) * 1000000) // GREATEST(n_docs, 1) AS BIGINT)
         |    AS exact_dup_ppm,
         |  CAST((n_near_dup_docs * 1000000) // GREATEST(n_docs, 1) AS BIGINT) AS near_dup_ppm
         |FROM base, tk, nd""".stripMargin,

    // stage CTEs are the d30 / d6 / t36 oracle chains verbatim, re-rooted
    // on each stage's survivor set; the card is one-row aggregates crossed
    "p5_release_gate" ->
      s"""WITH $releaseGateChainSql,
         |${bpeChainSql(8, 16, "clean")},
         |base AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         |    $bpeSymMassSql AS base_syms FROM t0),
         |fin AS (SELECT $bpeSymMassSql AS merged_syms FROM t8),
         |cnts AS (SELECT
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
         |      WHERE source <> 'src0') AS n_input,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM q5) AS n_quality,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ded) AS n_dedup,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM clean) AS n_clean)
         |SELECT n_input, n_quality, n_dedup, n_clean, n_tokens,
         |  CAST((merged_syms * 1000000) // base_syms AS BIGINT) AS compression_ppm
         |FROM cnts, base, fin""".stripMargin,

    // same gate chain, then the word-keyed encode replay + per-lang
    // release manifest (Support.bpeEncodeChainSql)
    "p6_tokenized_release" ->
      s"""WITH $releaseGateChainSql,
         |${bpeEncodeChainSql(8, 16, "clean")}
         |SELECT c.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_words) AS BIGINT) AS n_words,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM enc JOIN clean c USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // same gate chain, then d7's cluster labels over the CLEAN set and the
    // q29 split rule on the representative id (d34's leakage-free split)
    "p7_split_release" ->
      s"""WITH RECURSIVE $releaseGateChainSql,
         |${minhashPairsSql("clean")},
         |$clusterCompSql,
         |asg AS (SELECT c.doc_id, c.lang,
         |    CAST(len(string_split(c.text, ' ')) AS BIGINT) AS nt,
         |    COALESCE(cc.cluster_id, c.doc_id) AS cluster_id
         |  FROM clean c LEFT JOIN cl_comp cc USING (doc_id)),
         |sp AS (SELECT lang, nt, ${md5SplitCaseSql("cluster_id")} AS split
         |  FROM asg)
         |SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(nt) AS BIGINT) AS n_tokens
         |FROM sp GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    // increment CTE (re-crawl + edits), frozen gates, hash anti-join vs
    // the base hash table, min-id keeper, d6 decontamination re-rooted on
    // the kept set, d33 split case — the funnel as scalar counts
    "p8_incremental_release" ->
      s"""WITH inc AS (
         |  SELECT doc_id + 100000 AS doc_id, text, lang, source
         |    FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 200000, text || ' updatedcontent', lang, source
         |    FROM documents WHERE doc_id % 5 = 1),
         |g AS MATERIALIZED (SELECT doc_id, text, lang, source, md5($normSql) AS h
         |  FROM inc WHERE source <> 'src0' AND length(text) >= 150),
         |hist AS (SELECT DISTINCT md5($normSql) AS h FROM documents
         |  WHERE source <> 'src0' AND n_chars >= 150),
         |fresh AS MATERIALIZED (SELECT * FROM g
         |  WHERE h NOT IN (SELECT h FROM hist)),
         |kept AS MATERIALIZED (SELECT doc_id, text FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
         |    FROM fresh) WHERE rn = 1),
         |kw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM kept),
         |kg AS (SELECT DISTINCT doc_id, substr(md5(${wordGramSql(8)}), 1, 15) AS gh
         |  FROM kw, UNNEST(generate_series(1, len(ws) - 7)) AS t(i)),
         |ew AS (SELECT string_split(text, ' ') AS ws FROM documents
         |  WHERE source = 'src0'),
         |eg AS (SELECT DISTINCT substr(md5(${wordGramSql(8)}), 1, 15) AS gh
         |  FROM ew, UNNEST(generate_series(1, len(ws) - 7)) AS t(i)),
         |cont AS (SELECT DISTINCT doc_id FROM kg JOIN eg USING (gh)),
         |clean AS MATERIALIZED (SELECT doc_id,
         |    ${md5SplitCaseSql("doc_id")} AS split
         |  FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM cont))
         |SELECT
         |  (SELECT COUNT(*) FROM inc) AS n_increment,
         |  (SELECT COUNT(*) FROM g) AS n_gated,
         |  (SELECT COUNT(*) FROM fresh) AS n_fresh,
         |  (SELECT COUNT(*) FROM kept) AS n_kept,
         |  (SELECT COUNT(*) FROM clean) AS n_clean,
         |  (SELECT CAST(COALESCE(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) FROM clean) AS n_train,
         |  (SELECT CAST(COALESCE(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) FROM clean) AS n_val,
         |  (SELECT CAST(COALESCE(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) FROM clean) AS n_test""".stripMargin,

  )

  /** The p5/p6 shared gate-chain CTE prefix (`q5` → `clean`) — the oracle
    * mirror of [[releaseGateStages]], single-sourced for the same reason:
    * d30's rank blocker + d6's gram decontamination re-rooted per stage. */
  private lazy val releaseGateChainSql: String =
    s"""q5 AS MATERIALIZED (SELECT * FROM documents
       |    WHERE source <> 'src0' AND n_chars >= 150),
       |nn AS (SELECT doc_id, lang, $normSql AS s FROM q5),
       |g AS (SELECT doc_id, lang, substr(s, 1, 24) AS sk,
       |    list_distinct([substr(md5(x), 1, 15) for x in
       |      list_distinct([substr(s, i, 3) for i in
       |        range(1, greatest(length(s)-2, 0)+1)])]) AS grams
       |  FROM nn),
       |sz AS (SELECT doc_id, lang, sk, grams, len(grams) AS ng
       |  FROM g WHERE len(grams) > 0),
       |r AS (SELECT doc_id, lang, sk, grams, ng, ROW_NUMBER() OVER
       |    (PARTITION BY lang ORDER BY sk, doc_id) AS rn
       |  FROM sz),
       |pr AS (SELECT least(a.doc_id, b.doc_id) AS id_a,
       |    greatest(a.doc_id, b.doc_id) AS id_b,
       |    len(list_intersect(a.grams, b.grams)) AS i,
       |    a.ng AS na, b.ng AS nb
       |  FROM r a JOIN r b
       |    ON a.lang = b.lang AND b.rn - a.rn BETWEEN 1 AND 4),
       |losers AS (SELECT DISTINCT id_b AS doc_id FROM pr
       |  WHERE CAST(i AS DOUBLE)/(na + nb - i) >= 0.5),
       |ded AS MATERIALIZED (SELECT * FROM q5
       |  WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
       |tw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM ded),
       |tg AS (SELECT DISTINCT doc_id, substr(md5(${wordGramSql(8)}), 1, 15) AS h
       |    FROM tw, UNNEST(generate_series(1, len(ws) - 7)) AS t(i)),
       |ew AS (SELECT string_split(text, ' ') AS ws
       |    FROM documents WHERE source = 'src0'),
       |eg AS (SELECT DISTINCT substr(md5(${wordGramSql(8)}), 1, 15) AS h
       |    FROM ew, UNNEST(generate_series(1, len(ws) - 7)) AS t(i)),
       |contam AS (SELECT DISTINCT doc_id FROM tg JOIN eg USING (h)),
       |clean AS MATERIALIZED (SELECT * FROM ded
       |  WHERE doc_id NOT IN (SELECT doc_id FROM contam))""".stripMargin
}
