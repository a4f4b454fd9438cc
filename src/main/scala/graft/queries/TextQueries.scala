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

/** Text-analysis queries (t*). Registry split from the former monolithic
  * SparkEntry maps; aggregated by [[graft.SparkEntry]]. Each query entry
  * has its DuckDB oracle adjacent in [[TextQueries.oracles]]. */
private[graft] object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // hashed-feature linear quality classifier (fastText shape): 4096
    // buckets, deterministic md5-derived weights, keep = score >= 0
    "t12_quality_classifier" -> ((s, d) => {
      TextAnalysis.hashedLinearScore(Tables.documents(s, d), "doc_id", "text",
          dims = 4096)
        .orderBy("doc_id")
    }),


    // BM25 top-k lexical retrieval (integer-exact: rational idf with 20x
    // saturation, tf saturation at k1=1.2 b=0.75 as BIGINT ratios)
    "t13_bm25_search" -> ((s, d) => {
      Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        terms = Seq("spark", "join", "shuffle"), k = 25)
    }),


    // bigram-LM fluency scoring: add-one-smoothed mean bigram probability
    // (KenLM-style quality filter, trained on the corpus itself)
    "t14_lm_fluency" -> ((s, d) => {
      Retrieval.bigramLmFluency(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),


    // Kneser-Ney smoothed bigram LM: absolute discount + continuation-
    // probability interpolation, exact integer ppm (t14's sharper sibling)
    "t45_kn_fluency" -> ((s, d) => {
      Retrieval.knBigramFluency(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),


    // TRAINED linear classifier in-engine: balanced Rocchio on hashed
    // bigram features, English-vs-rest (probed: 218/282 and vocabulary-
    // separable; a source target collapsed to the majority class, and the
    // batch-perceptron rounds oscillated — the measured winner is the
    // one-shot class-weighted centroid difference, 86% here)
    "t46_rocchio_classifier" -> ((s, d) => {
      Retrieval.rocchioScore(Tables.documents(s, d), "doc_id", "text",
          isPositive = col("lang") === "en", buckets = 4096)
        .orderBy("doc_id")
    }),


    // Zipf rank-frequency fit per language: power-law health check of the
    // token distribution (a templated/truncated corpus flattens the
    // slope). Exact log2 via bitlength (the q63 rho trick), exact integer
    // OLS moments (q102 machinery) — vocabulary-sized after one corpus
    // token aggregate
    "t47_zipf_fit" -> ((s, d) => {
      TextAnalysis.zipfFit(Tables.documents(s, d), Seq("lang"), "text")
        .orderBy("lang")
    }),


    // TEXTRANK keyword extraction (Mihalcea & Tarau 2004): PageRank on
    // the word co-occurrence graph — an edge between tokens at distance
    // ≤ 2 within a document, undirected — top 15 corpus keywords by rank.
    // Pair generation is t20's native-generator explode (posexplode +
    // slice, never an interpreted HOF chain); the graph is
    // VOCABULARY-sized after the distinct, so the exact ppm iteration
    // (q35's pageRankPpm, 10 rounds, d = 0.85, oracle = the same unrolled
    // CTE chain with the word-pair edge source) runs on a frame that
    // cannot grow with corpus row count — only with vocabulary.
    "t48_textrank_keywords" -> ((s, d) => {
      val pos = Tables.documents(s, d)
        .select(tokens(col("text")).as("t"))
        .select(col("t"), posexplode(col("t")).as(Seq("i", "w")))
      val fwd = pos.select(col("w").as("src"),
          explode(expr("slice(t, i + 2, 2)")).as("dst"))
        .filter(col("src") =!= col("dst"))
      val sym = fwd.unionAll(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      GraphAlgorithms.pageRankPpm(s, sym, iterations = 10, dampingPpm = 850000L)
        .orderBy(desc("rank_ppm"), col("vertex"))
        .limit(15)
        .select(col("vertex").as("word"), col("rank_ppm"))
    }),


    // language ID (stopword n-gram heuristic)
    "t1_lang_id" -> ((s, d) => {
      TextAnalysis.languageId(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),


    // language-confusion matrix: declared metadata lang vs t1's predicted
    // lang — the label-quality audit for a multilingual corpus
    "t17_lang_confusion" -> ((s, d) => {
      val c = Tables.documents(s, d)
        .select(col("lang").as("declared_lang"),
          TextAnalysis.predictedLangCol(col("text")).as("predicted_lang"))
        .groupBy("declared_lang", "predicted_lang")
        .agg(count(lit(1)).as("n"))
      c.withColumn("share_ppm",
          call_function("div", col("n") * 1000000L,
            sum(col("n")).over(Window.partitionBy(col("declared_lang")))))
        .orderBy("declared_lang", "predicted_lang")
    }),


    // quality scoring (integer-ratio heuristics)
    "t2_quality_score" -> ((s, d) => {
      TextAnalysis.qualityScore(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),


    // Moore-Lewis contrastive selection: per-doc target-LM (src1) vs
    // general-LM score difference — "reads like the target domain, unlike
    // the average"; the cross-entropy-difference classic next to s6's DSIR
    "t16_moore_lewis" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Retrieval.mooreLewis(docs, "doc_id", "text", col("source") === "src1")
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), col("source"), col("target_ppm"),
          col("general_ppm"), col("ml_ppm"))
        .orderBy("doc_id")
    }),


    // token counting (whitespace + BPE-ish pre-tokenizer)
    "t3_token_counts" -> ((s, d) => {
      TextAnalysis.tokenCounts(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),


    // document fingerprinting (md5 + rolling polynomial hash)
    "t4_fingerprints" -> ((s, d) => {
      TextAnalysis.fingerprints(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),


    // per-language top-5 corpus terms (term-frequency profile)
    "t5_top_terms" -> ((s, d) => {
      TextAnalysis.topTermsPerGroup(Tables.documents(s, d), "lang", "text", k = 5)
        .select(col("lang"), col("token"), col("n"), col("rank"))
        .orderBy("lang", "rank")
    }),


    // PII scrubbing: synthetic log lines (no PII in the testdata) built from
    // event columns, then redacted — only the scrub side is scored
    // sliding 64-token windows, 16-token overlap (context-window prep)
    "t8_chunking" -> ((s, d) => {
      TextAnalysis.chunk(Tables.documents(s, d), "doc_id", "text",
        chunkTokens = 64, overlap = 16)
        .orderBy("doc_id", "chunk_idx")
    }),


    // per-source adaptive quality gate: keep the best 60% of EVERY source
    // (rank-within-stratum, not a global threshold)
    "t9_adaptive_quality" -> ((s, d) => {
      TextAnalysis.adaptiveQualityFilter(Tables.documents(s, d), "doc_id", "text",
        strataCol = "source", keepPpm = 600000L)
        .orderBy("source", "rank")
    }),


    // corpus vocabulary drift stats per source (type-token + hapax ppm)
    "t10_vocab_stats" -> ((s, d) => {
      TextAnalysis.vocabStats(Tables.documents(s, d), "text", "source")
        .orderBy("source")
    }),


    // most over-represented terms per source (integer-ppm lift — TF-IDF's
    // job without the float log)
    "t11_characteristic_terms" -> ((s, d) => {
      TextAnalysis.characteristicTerms(Tables.documents(s, d), "source", "text",
        k = 5, minCount = 2L)
        .orderBy("source", "rank")
    }),


    "t7_pii_scrub" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val raw = concat(
        lit("user "), col("user_id").cast("string"),
        when(col("user_id") % 3 === 0,
          concat(lit(" mail u"), col("user_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("user_id") % 2 === 0,
          concat(lit(" ip 10.0."), (col("user_id") % 250).cast("string"), lit(".7")))
          .otherwise(lit("")),
        when(col("event_id") % 5 === 0,
          concat(lit(" card 4111222233334"),
            lpad((col("event_id") % 1000).cast("string"), 3, "0")))
          .otherwise(lit("")),
        lit(" type="), col("event_type"))
      TextAnalysis.scrubPii(
        graft.core.Par.fanOut(ev.select(col("event_id"), raw.as("raw"))),
        "event_id", "raw")
        .select(col("event_id"), col("n_emails"), col("n_ips"), col("n_cards"),
          md5(col("scrubbed")).as("scrub_md5"))
        .orderBy("event_id")
    }),


    // duplicate word-trigram ratio per document (repetition quality signal)
    "t6_repetition" -> ((s, d) => {
      TextAnalysis.repetition(Tables.documents(s, d), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),


    // vocabulary health: hapax legomena (corpus-count-1 tokens) share per
    // source — one token-count shuffle, token occurrences re-join their
    // corpus count on the same key
    "t24_hapax_ratio" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
      val corpus = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      toks.join(corpus, "tok")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum((col("c") === 1L).cast("long")).as("n_hapax"))
        .withColumn("hapax_ppm", expr("(n_hapax * 1000000) div n_tokens"))
        .orderBy("source")
    }),


    // lexical-diversity audit: type-token ratio by document-length decile
    // (does vocabulary keep growing with length?) — one ntile window over
    // doc-level stats, exact ppm ratios
    "t23_ttr_deciles" -> ((s, d) => {
      val st = Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        size(array_distinct(tokens(col("text")))).cast("long").as("n_types"))
      st.withColumn("decile",
          ntile(10).over(Window.orderBy(col("n_chars"), col("doc_id"))))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tokens"),
          sum(col("n_types")).as("types"))
        // div class (a): a decile of all-EMPTY documents is legal input
        // (tokens = 0 → ttr 0; caught by the degenerate-world gate r12)
        .withColumn("ttr_ppm", expr("(types * 1000000) div greatest(tokens, 1)"))
        .orderBy("decile")
    }),


    // novelty audit: what fraction of each doc's bigrams is it the FIRST
    // (lowest-id) to introduce — the "is the corpus still adding new
    // content" curve; one gram-keyed min + a co-keyed join back, never a
    // doc×doc comparison
    "t22_ngram_novelty" -> ((s, d) => {
      // native one-pass distinct-bigram HASH set (≡ the old interpreted
      // explode(wordNgrams(tokens(text),2)) definition: same distinct gram
      // set per doc, keyed by its 60-bit md5 instead of the string — the
      // rule-4 convention, so the gram-keyed shuffle moves longs, never
      // gram text; oracle unchanged, counts identical)
      val grams = graft.core.Par.fanOut(Tables.documents(s, d))
        .select(col("doc_id"),
          explode(wordNgramHashSet(concat_ws(" ", tokens(col("text"))), 2)).as("g"))
      val firstOwner = grams.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
      grams.join(firstOwner, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum((col("doc_id") === col("first_doc")).cast("long")).as("n_novel"))
        .withColumn("novelty_ppm", expr("(n_novel * 1000000) div n_grams"))
        .orderBy("doc_id")
    }),


    // effective-dataset-size report: per language, docs/tokens BEFORE and
    // AFTER near-dup removal (d7's min-id keeper rule) — the KPI a corpus
    // curation run actually publishes; dedup keeps its bounded LSH+CC
    // shape, the report is one lang-keyed aggregate over the keeper join
    "t21_effective_tokens" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val clusters = Dedup.nearDupClusters(s, docs, "doc_id", "text",
        numHashes = 8, shingleSize = 3, rowsPerBand = 2, minEstimate = 0.5)
      docs.select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .join(clusters.select(col("doc_id"), col("is_keeper")), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_keeper").cast("long")).as("n_kept"),
          sum(col("n_tokens")).as("tokens_raw"),
          sum(when(col("is_keeper"), col("n_tokens")).otherwise(0L)).as("tokens_kept"))
        .withColumn("kept_ppm", expr("(tokens_kept * 1000000) div tokens_raw"))
        .orderBy("lang")
    }),


    // PMI keyword pairs: top-20 token pairs by pointwise mutual information
    // (ranked by the exact rational N·c(a,b)/(c(a)·c(b)) — log is monotone,
    // so it never needs to exist); pairs explode row-locally from per-doc
    // distinct token arrays, counts are two partial-agg'd shuffles
    "t20_pmi_pairs" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), array_sort(array_distinct(tokens(col("text")))).as("ps"))
      val nDocs = base.agg(count(lit(1)).as("nd"))
      val tokc = base.select(explode(col("ps")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      // Boilerplate rule (pair DEFINITION, mirrored in the oracle): tokens
      // in > 90% of documents never pair — df·10 > nd·9. Non-binding at the
      // test SFs (synthetic df peaks at ~80%) but it bounds the head-token
      // pair explosion at real corpus scale, where stopword df → ~100%.
      // The banned set is ≤ avgDocLen/0.9 tokens by counting, so the
      // broadcast is always tiny (the q70 runtime-filter pattern).
      val banned = tokc.crossJoin(broadcast(nDocs))
        .filter(col("c") * 10 > col("nd") * 9)
        .agg(sort_array(collect_list(col("tok"))).as("banned"))
      val filtered = base.crossJoin(broadcast(banned))
        .select(col("doc_id"), array_except(col("ps"), col("banned")).as("ps"))
        .filter(size(col("ps")) >= 2)
      // ordered-pair explode as two native generators (posexplode + slice)
      // — the previous nested transform/sequence/struct HOF chain was
      // interpreted per element and dominated t20's wall clock
      val pairs = filtered
        .select(col("ps"), posexplode(col("ps")).as(Seq("i", "a")))
        .select(col("a"),
          explode(expr("slice(ps, i + 2, size(ps) - i - 1)")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 5L)
      pairs
        .join(tokc.select(col("tok").as("a"), col("c").as("ca")), "a")
        .join(tokc.select(col("tok").as("b"), col("c").as("cb")), "b")
        .crossJoin(broadcast(nDocs))
        .withColumn("pmi_ratio",
          (col("nd") * col("cab")).cast("double") / (col("ca") * col("cb")).cast("double"))
        .orderBy(col("pmi_ratio").desc, col("a"), col("b")).limit(20)
        .withColumn("rank", row_number()
          .over(Window.orderBy(col("pmi_ratio").desc, col("a"), col("b"))).cast("int"))
        .select(col("rank"), col("a"), col("b"), col("cab"), col("pmi_ratio"))
        .orderBy("rank")
    }),


    // exact phrase retrieval over a positional index: only the 3 query
    // terms survive the posexplode, word i shifts to pos−i, and adjacency
    // is two co-keyed equi-joins on (doc, pos) — the adjacency question a
    // gram-SET index (q38) cannot answer
    "t19_phrase_search" -> ((s, d) => {
      Retrieval.phraseSearch(Tables.documents(s, d), "doc_id", "text",
          phrase = Seq("slow", "hash", "batch"))
        .orderBy("doc_id")
    }),


    // quality-percentile normalization: per-language percent-rank of doc
    // length in exact ppm — RANK over the value alone (ties share a rank,
    // so no tie-break column is needed: the result depends only on the
    // value multiset), ×1e6 floor-divided by (n−1)
    "t18_rank_normalize" -> ((s, d) => {
      val doc = Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
      val w = Window.partitionBy("lang")
      doc
        .withColumn("rk", rank().over(w.orderBy(col("n_chars"))))
        .withColumn("n", count(lit(1)).over(w))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          when(col("n") > 1L,
            expr("(CAST(rk - 1 AS BIGINT) * 1000000) div (n - 1)"))
            .otherwise(0L).as("pr_ppm"))
        .orderBy("doc_id")
    }),


    // winnowed-fingerprint copy candidates (MOSS): per-window min gram
    // hash (packed hash|pos BIGINT argmin), df-capped inverted-index
    // join, pairs sharing >= 2 fingerprints
    "t15_winnowing" -> ((s, d) => {
      Dedup.winnowedPairs(Tables.documents(s, d), "doc_id", "text",
          n = 4, window = 4, minShared = 2L, maxFpDf = 50L)
        .orderBy("id_a", "id_b")
    }),


    // lexical diversity per source via the Simpson/repeat-probability index:
    // P(two random tokens collide) = Σc(c−1)/(N(N−1)) — an exact rational
    // from the token-count marginal (no logs, unlike entropy). Staged ×1000
    // ppm division for long headroom (q98 pattern); corpora where Σc(c−1)
    // itself exceeds long range need DECIMAL(38) moments
    "t25_simpson_diversity" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
      toks.groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(col("c") * (col("c") - 1L)).as("coll"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          // greatest(…, 1): a source with ≤ 32 token occurrences has
          // n·(n−1) div 1000 = 0 — below the staged formula's resolution;
          // clamping the denominator reports a saturated ratio instead of
          // an ANSI divide-by-zero abort (rule mirrored in the oracle)
          expr("(coll * 1000) div greatest((n_tokens * (n_tokens - 1)) div 1000, 1)")
            .as("collision_ppm"))
        .orderBy("source")
    }),


    // term burstiness: variance-to-mean ratio of per-document counts for the
    // top-20 corpus terms, zeros included (docs without the term) — VMR > 1
    // means clumped/topical, ≈1 Poisson-like function words. All-integer:
    // VMR·1e6 = (N·Σx² − (Σx)²)·10⁶ div ((N−1)·Σx), non-negative by
    // Cauchy–Schwarz so truncating div is engine-identical
    "t26_burstiness" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val perDoc = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("tok", "doc_id").agg(count(lit(1)).as("x"))
      val stats = perDoc.groupBy("tok")
        .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
          count(lit(1)).as("n_docs_with"))
        .orderBy(col("sx").desc, col("tok")).limit(20)
      stats.crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
        .select(col("tok"), col("sx").as("total_count"), col("n_docs_with"),
          expr("((n * sxx - sx * sx) * 1000000) div ((n - 1) * sx)").as("vmr_ppm"))
        .orderBy(col("total_count").desc, col("tok"))
    }),


    // atypicality audit: 5 least-centroid-like docs per source by TF cosine
    // between the doc's integer term counts and its source's aggregate term
    // profile — low cosine = off-topic/outlier doc, the curation signal
    // before manual review. Integer dot/norms + ONE canonical double
    // division (the proven bit-identical formula), rank ties by doc_id
    "t27_atypical_docs" -> ((s, d) => {
      val dc = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("source", "doc_id", "tok").agg(count(lit(1)).as("cd"))
      val sc = dc.groupBy("source", "tok").agg(sum(col("cd")).as("cs"))
      val nd = dc.groupBy("source", "doc_id")
        .agg(sum(col("cd") * col("cd")).as("nd"))
      val ns = sc.groupBy("source").agg(sum(col("cs") * col("cs")).as("ns"))
      val dot = dc.join(sc, Seq("source", "tok"))
        .groupBy("source", "doc_id").agg(sum(col("cd") * col("cs")).as("dot"))
      dot.join(nd, Seq("source", "doc_id")).join(ns, "source")
        .withColumn("cosine",
          col("dot").cast("double") / sqrt((col("nd") * col("ns")).cast("double")))
        .withColumn("rank", row_number().over(
          Window.partitionBy("source").orderBy(col("cosine"), col("doc_id"))))
        .filter(col("rank") <= 5)
        .select(col("source"), col("rank"), col("doc_id"), col("cosine"))
        .orderBy("source", "rank")
    }),


    // template detection: the 20 most duplicated 8-token document prefixes
    // (form letters / boilerplate headers) with how many sources they span
    // — a groupBy on the prefix string, no pairwise comparison anywhere
    "t28_template_prefixes" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"),
          concat_ws(" ", slice(tokens(col("text")), 1, 8)).as("prefix"))
        .filter(size(tokens(col("text"))) >= 8)
        .groupBy("prefix")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("n_docs").desc, col("prefix")).limit(20)
    }),


    // Heaps-law corpus growth curve: cumulative docs / token occurrences /
    // vocabulary size at each doc-id decile — new types charge their FIRST
    // decile (min over a monotone bucketing ≡ decile of first occurrence),
    // so one token shuffle serves the whole curve; sub-linear vocab growth
    // is the healthy-corpus signature
    "t29_vocab_growth" -> ((s, d) => {
      val dec = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("decile", ntile(10).over(Window.orderBy("doc_id")))
      val tokDec = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .join(dec, "doc_id")
      val occ = tokDec.groupBy("decile").agg(count(lit(1)).as("n_occ"))
      val vocabNew = tokDec.groupBy("tok").agg(min(col("decile")).as("decile"))
        .groupBy("decile").agg(count(lit(1)).as("new_types"))
      val docsPer = dec.groupBy("decile").agg(count(lit(1)).as("n_docs"))
      val w = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docsPer.join(occ, "decile").join(vocabNew, Seq("decile"), "left")
        .withColumn("nt0", coalesce(col("new_types"), lit(0L)))
        .select(col("decile"),
          sum(col("n_docs")).over(w).as("docs_cum"),
          sum(col("n_occ")).over(w).as("tokens_cum"),
          sum(col("nt0")).over(w).as("vocab_cum"))
        .orderBy("decile")
    }),


    // language purity per source: share of docs carrying the source's
    // plurality language (ties to the lexicographically first lang) — the
    // mislabeled-shard screen run before language-filtered training cuts
    "t30_language_purity" -> ((s, d) => {
      val cnt = Tables.documents(s, d).groupBy("source", "lang")
        .agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy("source").agg(sum(col("c")).as("n_docs"))
      cnt.withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy(col("c").desc, col("lang"))))
        .filter(col("rn") === 1)
        .join(tot, "source")
        .select(col("source"), col("n_docs"), col("lang").as("top_lang"),
          expr("(c * 1000000) div n_docs").as("purity_ppm"))
        .orderBy("source")
    }),


    // corpus-diversity audit: exact vocabulary Jaccard between source
    // pairs — distinct (source, token) sets self-join on the token key,
    // |A∪B| = |A|+|B|−|A∩B|, overlap in ppm; 20 most-similar pairs
    "t31_vocab_overlap" -> ((s, d) => {
      val st = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .distinct().localCheckpoint(true)
      val sizes = st.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = st.select(col("source").as("sa"), col("tok"))
        .join(st.select(col("source").as("sb"), col("tok")), "tok")
        .filter(col("sa") < col("sb"))
        .groupBy("sa", "sb").agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(sizes.select(col("source").as("sa"), col("n").as("na"))), "sa")
        .join(broadcast(sizes.select(col("source").as("sb"), col("n").as("nb"))), "sb")
        .select(col("sa"), col("sb"), col("n_inter"),
          expr("(n_inter * 1000000) div (na + nb - n_inter)").as("jaccard_ppm"))
        .orderBy(col("jaccard_ppm").desc, col("sa"), col("sb")).limit(20)
    }),


    // OOV-heavy documents: share of tokens whose corpus count ≤ 2, per
    // doc in exact ppm — the docs most likely to be noise/garble; token
    // occurrences re-join their corpus counts on the token key, top-20
    "t32_rare_token_docs" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val corpus = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      toks.join(corpus, "tok")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum((col("c") <= 2L).cast("long")).as("n_rare"))
        .withColumn("rare_ppm", expr("(n_rare * 1000000) div n_tokens"))
        .orderBy(col("rare_ppm").desc, col("doc_id")).limit(20)
    }),


    // vocabulary concentration: exact Gini of token frequencies per source
    // (q119's rank-weighted integer identity on the token-count marginal)
    // — Zipfian corpora sit high; a flat Gini flags synthetic/templated
    // text
    "t34_token_gini" -> ((s, d) => {
      def dec(c: Column) = c.cast("decimal(38,0)")
      val cnt = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("source").orderBy(col("c"), col("tok"))
      cnt.withColumn("i", row_number().over(w).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_types"), sum(dec(col("c"))).as("t"),
          sum(dec(col("i")) * dec(col("c"))).as("w1"))
        .select(col("source"), col("n_types"),
          col("t").cast("double").as("n_tokens"),
          ((lit(2).cast("decimal(38,0)") * col("w1") -
            dec(col("n_types") + 1) * col("t")).cast("double") /
            (dec(col("n_types")) * col("t")).cast("double")).as("gini"))
        .orderBy("source")
    }),


    // head heaviness: the top token's share of the top-10 mass per source —
    // a Zipf-steepness proxy with no logs; rank over (count desc, token)
    // is total so both prefix sums agree
    "t35_head_heaviness" -> ((s, d) => {
      val cnt = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      cnt.withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy(col("c").desc, col("tok"))))
        .filter(col("rn") <= 10)
        .groupBy("source")
        .agg(max(when(col("rn") === 1, col("c"))).as("top1"),
          sum(col("c")).as("top10"))
        .withColumn("head_ppm", expr("(top1 * 1000000) div top10"))
        .orderBy("source")
    }),

    // tokenizer training: the first 8 BPE merges learned on the corpus
    // word-type table — one corpus-sized token aggregate, then every
    // round runs on the VOCABULARY-sized frame (corpus-size-independent;
    // see Bpe scaladoc for the greedy-replace parity argument)
    "t36_bpe_merges" -> ((s, d) =>
      Bpe.learn(s, Tables.documents(s, d), rounds = 8)._1.orderBy("round")),

    // the training's acceptance number: corpus symbols before/after the 8
    // merges and the compression ratio in ppm — rides the same chain
    "t37_bpe_compression" -> ((s, d) => {
      val (_, t0, fin) = Bpe.learn(s, Tables.documents(s, d), rounds = 8)
      Bpe.compressionAudit(t0, fin)
    }),

    // tokenizer TRAINING-STABILITY audit: the 8-round merge sequences
    // learned independently on the even-id and odd-id corpus halves,
    // joined per round — disagreement at round k means the tokenizer is
    // sensitive to the data split from rank k on (the "can I retrain on a
    // sample" question). Both trainings run on vocabulary-sized type
    // tables; the oracle runs two scoped bpe chains (WITH inside each
    // join side — CTE names cannot collide) over the same halves.
    "t49_bpe_stability" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val even = Bpe.learn(s, docs.filter(col("doc_id") % 2 === 0L), rounds = 8)._1
      val odd = Bpe.learn(s, docs.filter(col("doc_id") % 2 === 1L), rounds = 8)._1
      even.select(col("round"), col("merged").as("merged_even"))
        .join(odd.select(col("round"), col("merged").as("merged_odd")),
          Seq("round"), "full_outer")
        .select(col("round"), col("merged_even"), col("merged_odd"),
          coalesce(col("merged_even") === col("merged_odd"), lit(false))
            .as("agree"))
        .orderBy("round")
    }),


    // VOCABULARY GROWTH (Heaps' law) curve: cumulative distinct-token
    // count at 10 ingestion checkpoints (NTILE deciles of doc_id — the
    // acceptable row-sort) plus type-token ratio — the "is the corpus
    // still teaching the tokenizer new words" audit, t47's Zipf
    // companion. The whole curve costs ONE token aggregate: a token's
    // first-occurrence doc (min doc_id per type) makes cumulative vocab
    // at threshold t = count(first_doc ≤ t) — no per-prefix distinct
    // passes; both range joins broadcast the 10-row checkpoint frame.
    "t50_heaps_curve" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tiles = docs
        .select(col("doc_id"), ntile(10).over(Window.orderBy("doc_id")).as("k"))
        .groupBy("k").agg(max(col("doc_id")).as("thr"), count(lit(1)).as("nd"))
        .localCheckpoint(true)
      val perDoc = docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ntk"))
      val firstDoc = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(min(col("doc_id")).as("fdoc"))
      val vocabCum = broadcast(tiles).join(firstDoc, col("fdoc") <= col("thr"))
        .groupBy("k").agg(count(lit(1)).as("vocab_cum"))
      val tokCum = broadcast(tiles).join(perDoc, col("doc_id") <= col("thr"))
        .groupBy("k").agg(sum(col("ntk")).as("n_tokens_cum"))
      val wcum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
      tiles.withColumn("n_docs_cum", sum(col("nd")).over(wcum))
        .join(tokCum, "k").join(vocabCum, "k")
        .select(col("k"), col("thr"), col("n_docs_cum"),
          col("n_tokens_cum"), col("vocab_cum"),
          // class (a): an all-empty-text corpus is legal
          call_function("div", col("vocab_cum") * 1000000L,
            greatest(col("n_tokens_cum"), lit(1L))).as("ttr_ppm"))
        .orderBy("k")
    }),


    // curation gate ablation: which combination of the three standard
    // gates (length, quality keep-flag, lang-id agreement) passes how many
    // docs/tokens — the "why was my data dropped" matrix every filter
    // pipeline tuning session starts from; three row-local flags, one
    // 8-cell aggregate
    "t39_gate_ablation" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val q = TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("keep").as("q_ok"))
      docs.select(col("doc_id"), col("lang"), (col("n_chars") >= 150).as("len_ok"))
        .join(q, "doc_id")
        .join(TextAnalysis.languageId(docs, "doc_id", "text"), "doc_id")
        .withColumn("lang_ok", col("predicted_lang") === col("lang"))
        .groupBy("len_ok", "q_ok", "lang_ok")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("len_ok", "q_ok", "lang_ok")
    }),

    // tokenizer drift monitor: merges trained on 90% of the corpus are
    // applied AS-IS (no retrain — k row-local replaces) to the arriving
    // 10% increment; the compression audit runs on the increment. A
    // falling ratio vs t37 is the "retrain the tokenizer" alarm. Per-
    // increment cost tracks the increment's vocabulary, not the corpus
    "t38_bpe_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (merges, _, _) = Bpe.learn(s, docs.filter(col("doc_id") % 10 =!= 0),
        rounds = 8)
      val inc0 = Bpe.wordTypes(docs.filter(col("doc_id") % 10 === 0), 16)
        .localCheckpoint(true)
      Bpe.compressionAudit(inc0, Bpe.applyMerges(inc0, merges))
    }),


    // the tokenizer loop closed: the learned merges applied to the
    // DOCUMENTS — per doc, the BPE token-id stream (ids = lexicographic
    // rank in the final vocabulary), in reading order as a hash-stable
    // space-joined string. Merge replay is vocabulary-sized (distinct
    // words, never per token); the corpus pays one tokenize-explode and
    // one doc-keyed rollup shuffle
    "t40_bpe_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (merges, _, fin) = Bpe.learn(s, docs, rounds = 8)
      Bpe.encodeDocs(docs, "doc_id", "text", merges, fin)
        .orderBy("doc_id")
    }),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020, the repo's
    // integer bigram-LM algebra in place of KenLM): every doc scored under
    // a PER-LANGUAGE reference LM (trained on the src0 slice), then
    // per-lang terciles head/middle/tail — the classic quality-mixing
    // partition for web corpora
    "t44_ccnet_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = Retrieval.bigramLmScore(docs,
        docs.filter(col("source") === "src0"), "doc_id", "text", "lm_ppm",
        partitionCols = Seq("lang"))
      docs.select(col("doc_id"), col("lang"))
        .join(scored.select(col("doc_id"), col("lm_ppm")), Seq("doc_id"))
        .withColumn("nt", ntile(3).over(
          Window.partitionBy("lang").orderBy(col("lm_ppm").desc, col("doc_id"))))
        .select(col("doc_id"), col("lang"), col("lm_ppm"),
          when(col("nt") === 1, "head").when(col("nt") === 2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy("doc_id")
    }),

    // vocabulary-coverage curve: fraction of token OCCURRENCES covered by
    // the top-k types at k in {1k..16k} — the "how big must the vocab be"
    // card; ranked/cumulated over the VOCAB-sized type table only
    "t43_vocab_coverage" -> ((s, d) => {
      val tt = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val ranked = tt.withColumn("rn",
        row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
      val tot = tt.agg(sum(col("cnt")).as("total_occ"),
        count(lit(1)).as("n_types"))
      s.sql("SELECT explode(array(1000, 2000, 4000, 8000, 16000)) AS vocab_size")
        .join(ranked, col("rn") <= col("vocab_size"))
        .groupBy("vocab_size").agg(sum(col("cnt")).as("covered_occ"))
        .crossJoin(tot)
        .select(col("vocab_size").cast("long").as("vocab_size"),
          col("n_types"), col("covered_occ"), col("total_occ"),
          call_function("div", col("covered_occ") * 1000000L,
            greatest(col("total_occ"), lit(1L))).as("coverage_ppm"))
        .orderBy("vocab_size")
    }),

    // Gopher-style intra-document repetition gate: per-doc fraction of
    // tokens covered by a within-doc duplicated word 3-gram (exact ppm)
    "t41_intra_doc_repetition" -> ((s, d) =>
      TextAnalysis.intraDocRepetition(Tables.documents(s, d), "doc_id", "text",
          n = 3)
        .orderBy("doc_id")),

    // tokenizer fertility per language: BPE tokens per qualifying word
    // (the per-lang cost-of-tokenization card, computed on the t40 chain)
    "t42_bpe_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (merges, _, fin) = Bpe.learn(s, docs, rounds = 8)
      Bpe.encodeDocs(docs, "doc_id", "text", merges, fin)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_tokens")).as("n_tokens"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
          call_function("div", col("n_tokens") * 1000000L,
            greatest(col("n_words"), lit(1L))).as("fertility_ppm"))
        .orderBy("lang")
    }),

  )

  val oracles: Map[String, String] = Map(

    // bucket = md5_60bit(tok) % 4096; weight = (md5_60bit(bucket) % 1e6)
    // % 2001 - 1000 — both engines derive the same integer weights
    "t12_quality_classifier" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tb AS (SELECT doc_id,
         |    CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % 4096 AS b
         |  FROM tk),
         |tw AS (SELECT doc_id,
         |    (CAST(concat('0x', substr(md5(CAST(b AS VARCHAR)), 1, 15)) AS BIGINT)
         |      % 1000000) % 2001 - 1000 AS w
         |  FROM tb),
         |sc AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS score FROM tw GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(sc.score, 0) AS score,
         |  COALESCE(sc.score, 0) >= 0 AS keep
         |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin,


    // integer-exact BM25: idf = least((2(N-df)+1)*1e6 // (2df+1), 2e7)
    // (the Robertson idf argument as a rational, 20x saturation instead of
    // log); tfsat = 44*tf*avgdl*1e6 // (20*tf*avgdl + 6*avgdl + 18*dl)
    // (k1=1.2, b=0.75 with num/den scaled by 20*avgdl); avgdl floored
    "t13_bm25_search" -> bm25TopKSql,


    // add-one-smoothed bigram LM over graft_tokens; prefix counts c1 are
    // sums over the bigram table (NOT raw unigram counts — the last token
    // of each doc is no bigram prefix); V = corpus distinct tokens
    "t14_lm_fluency" -> s"$lmFluencySql ORDER BY doc_id",


    "t45_kn_fluency" -> s"$knFluencySql ORDER BY doc_id",


    "t46_rocchio_classifier" -> rocchioSql(buckets = 4096),


    // exact bitlength log2 buckets (length(bin(x)), the q63 rho spelling)
    // + the q102 exact-integer-moment OLS double tree, verbatim
    "t47_zipf_fit" ->
      s"""WITH tk AS (SELECT lang, unnest($toksSql) AS tok FROM documents),
         |ty AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS freq
         |  FROM tk GROUP BY 1, 2),
         |rk AS (SELECT lang, freq, CAST(ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY freq DESC, tok) AS BIGINT) AS rank FROM ty),
         |pt AS (SELECT lang, CAST(length(bin(rank)) AS BIGINT) AS x,
         |    CAST(length(bin(freq)) AS BIGINT) AS y FROM rk),
         |m AS (SELECT lang, COUNT(*) AS n,
         |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         |    CAST(SUM(x*x) AS HUGEINT) AS sxx, CAST(SUM(y*y) AS HUGEINT) AS syy,
         |    CAST(SUM(x*y) AS HUGEINT) AS sxy
         |  FROM pt GROUP BY 1),
         |dd AS (SELECT lang, n, sx, sy,
         |    n*sxy - sx*sy AS num, n*sxx - sx*sx AS d1, n*syy - sy*sy AS d2
         |  FROM m)
         |SELECT lang, n,
         |  CASE WHEN d1 > 0 THEN num::DOUBLE / d1::DOUBLE END AS slope,
         |  CASE WHEN d1 > 0 THEN
         |    (sy::DOUBLE - (num::DOUBLE / d1::DOUBLE) * sx::DOUBLE) / n::DOUBLE
         |  END AS intercept,
         |  CASE WHEN d1 > 0 AND d2 > 0 THEN
         |    (num::DOUBLE / sqrt(d1::DOUBLE * d2::DOUBLE)) *
         |    (num::DOUBLE / sqrt(d1::DOUBLE * d2::DOUBLE))
         |  END AS r2
         |FROM dd ORDER BY lang""".stripMargin,


    // q35's unrolled PageRank CTE chain with the word co-occurrence edge
    // source (positional parallel unnest, 0-based ≡ posexplode; distance
    // 1..2 forward pairs + their reverses; dedup/self-loop removal happen
    // in the builder's `e` CTE exactly as the Spark side's pageRankPpm)
    // the token-position frame is hoisted into a scoped AS MATERIALIZED
    // CTE (the q71 inlining rule): the four join-side references otherwise
    // make DuckDB tokenize the corpus 4× per verification run
    "t48_textrank_keywords" ->
      pageRankSql(iterations = 10, dampingPpm = 850000L,
        erawSql =
          s"""  WITH wt AS MATERIALIZED (SELECT doc_id, unnest($toksSql) AS w,
             |    unnest(range(len($toksSql))) AS i FROM documents)
             |  SELECT a.w AS src, b.w AS dst
             |  FROM wt a JOIN wt b
             |    ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND 2 AND a.w <> b.w
             |  UNION ALL
             |  SELECT b.w AS src, a.w AS dst
             |  FROM wt a JOIN wt b
             |    ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND 2 AND a.w <> b.w""".stripMargin,
        finalSelect = "SELECT vertex AS word, r AS rank_ppm FROM {r} " +
          "ORDER BY rank_ppm DESC, word LIMIT 15"),


    "t1_lang_id" ->
      s"""WITH sc AS (
         |${langScoresSql()}
         |), best AS (SELECT doc_id, lang, score,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM sc)
         |SELECT doc_id, CASE WHEN score = 0 THEN 'und' ELSE lang END AS predicted_lang
         |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,


    // t1's predicted-lang CTE joined back to the declared metadata lang
    "t17_lang_confusion" ->
      s"""WITH sc AS (
         |${langScoresSql()}
         |), best AS (SELECT doc_id, lang, score,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM sc),
         |pred AS (SELECT doc_id, CASE WHEN score = 0 THEN 'und' ELSE lang END AS predicted_lang
         |  FROM best WHERE rn = 1),
         |c AS (SELECT d.lang AS declared_lang, p.predicted_lang, COUNT(*) AS n
         |  FROM documents d JOIN pred p USING (doc_id) GROUP BY 1, 2)
         |SELECT declared_lang, predicted_lang, n,
         |  CAST((n * 1000000) // CAST(SUM(n) OVER (PARTITION BY declared_lang) AS BIGINT)
         |    AS BIGINT) AS share_ppm
         |FROM c ORDER BY declared_lang, predicted_lang""".stripMargin,


    "t2_quality_score" -> {
      s"""WITH m AS (${qualityMetricsSql("documents")})
         |SELECT doc_id, n_tokens, n_chars,
         |  CASE WHEN n_tokens > 0 THEN stop_hits*1000000//n_tokens ELSE 0 END AS stopword_ppm,
         |  CASE WHEN n_chars > 0 THEN alpha_len*1000000//n_chars ELSE 0 END AS alpha_ppm,
         |  CASE WHEN n_tokens > 0 THEN sum_tok_len*1000000//n_tokens ELSE 0 END AS mean_tok_len_ppm,
         |  ${keepSql()} AS keep
         |FROM m ORDER BY doc_id""".stripMargin
    },


    // two LMs over the same bigram algebra as t14 — the target LM from the
    // src1 slice with LEFT-join add-one smoothing for unseen bigrams
    "t16_moore_lewis" ->
      s"""WITH tk AS (SELECT doc_id, source, $toksSql AS t FROM documents),
         |bg AS (SELECT doc_id, source, t[i] AS w1, t[i+1] AS w2
         |  FROM tk, UNNEST(generate_series(1, len(t)-1)) AS u(i)),
         |db AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM bg GROUP BY doc_id, w1, w2),
         |t12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
         |  FROM bg WHERE source = 'src1' GROUP BY w1, w2),
         |t1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM t12 GROUP BY w1),
         |tv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
         |  FROM (SELECT unnest(t) AS tok FROM tk WHERE source = 'src1')),
         |g12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
         |  FROM bg GROUP BY w1, w2),
         |g1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM g12 GROUP BY w1),
         |gv AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
         |  FROM (SELECT unnest(t) AS tok FROM tk)),
         |st AS (SELECT db.doc_id,
         |    CAST(SUM(db.cnt * (((COALESCE(t12.c12, 0) + 1)*1000000)
         |      // (COALESCE(t1.c1, 0) + tv.v))) AS BIGINT) AS sp,
         |    CAST(SUM(db.cnt) AS BIGINT) AS nb
         |  FROM db LEFT JOIN t12 USING (w1, w2) LEFT JOIN t1 USING (w1) CROSS JOIN tv
         |  GROUP BY db.doc_id),
         |sg AS (SELECT db.doc_id,
         |    CAST(SUM(db.cnt * (((COALESCE(g12.c12, 0) + 1)*1000000)
         |      // (COALESCE(g1.c1, 0) + gv.v))) AS BIGINT) AS sp,
         |    CAST(SUM(db.cnt) AS BIGINT) AS nb
         |  FROM db LEFT JOIN g12 USING (w1, w2) LEFT JOIN g1 USING (w1) CROSS JOIN gv
         |  GROUP BY db.doc_id),
         |f AS (SELECT d.doc_id, d.source,
         |    CASE WHEN COALESCE(st.nb, 0) > 0 THEN st.sp // st.nb ELSE 0 END AS target_ppm,
         |    CASE WHEN COALESCE(sg.nb, 0) > 0 THEN sg.sp // sg.nb ELSE 0 END AS general_ppm
         |  FROM documents d LEFT JOIN st USING (doc_id) LEFT JOIN sg USING (doc_id))
         |SELECT doc_id, source, target_ppm, general_ppm,
         |  target_ppm - general_ppm AS ml_ppm
         |FROM f ORDER BY doc_id""".stripMargin,


    "t3_token_counts" ->
      s"""SELECT doc_id, len($toksSql)::BIGINT AS ws_tokens,
         |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]'))::BIGINT AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,


    "t4_fingerprints" ->
      s"""SELECT doc_id, md5($normSql) AS content_fp,
         |  list_reduce(list_prepend(0::BIGINT,
         |    [ (ascii(substr(x,1,1))*7 + length(x))::BIGINT for x in $toksSql ]),
         |    (a, b) -> (a*131 + b) % 1000000007) AS rolling_fp
         |FROM documents ORDER BY doc_id""".stripMargin,


    "t5_top_terms" ->
      s"""WITH tok AS (SELECT lang, unnest($toksSql) AS token FROM documents),
         |c AS (SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY 1, 2),
         |r AS (SELECT *, ROW_NUMBER() OVER
         |    (PARTITION BY lang ORDER BY n DESC, token) AS rank FROM c)
         |SELECT lang, token, n, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,


    // chunk starts 0,48,96,… while < n (range(0,n,48)); slice caps at n on
    // both engines; final short chunk keeps least(64, n-s) tokens
    "t8_chunking" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |nn AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
         |st AS (SELECT doc_id, t, n, unnest(range(0, n, 48)) AS s FROM nn),
         |c AS (SELECT doc_id, CAST(s//48 AS INTEGER) AS chunk_idx,
         |        array_to_string(t[CAST(s+1 AS INTEGER):CAST(s+64 AS INTEGER)], ' ') AS chunk_text,
         |        CAST(least(64, n - s) AS BIGINT) AS n_chunk_tokens
         |      FROM st)
         |SELECT doc_id, chunk_idx, chunk_text, n_chunk_tokens FROM c
         |ORDER BY doc_id, chunk_idx""".stripMargin,


    "t9_adaptive_quality" ->
      """WITH s AS (SELECT doc_id, source,
        |    CASE WHEN length(text) > 0
        |      THEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))*1000000//length(text)
        |      ELSE 0 END AS alpha_ppm
        |  FROM documents),
        |r AS (SELECT doc_id, source, alpha_ppm,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY alpha_ppm DESC, doc_id) AS rank,
        |    COUNT(*) OVER (PARTITION BY source) AS n_total
        |  FROM s)
        |SELECT doc_id, source, alpha_ppm, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= n_total * 600000 // 1000000
        |ORDER BY source, rank""".stripMargin,


    "t10_vocab_stats" ->
      s"""WITH tk AS (SELECT source, unnest($toksSql) AS tok FROM documents),
         |c AS (SELECT source, tok, COUNT(*) AS cnt FROM tk GROUP BY 1, 2),
         |a AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         |        CAST(COUNT(*) AS BIGINT) AS n_types,
         |        CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
         |      FROM c GROUP BY 1)
         |SELECT source, n_tokens, n_types, n_hapax,
         |  CASE WHEN n_tokens > 0 THEN n_types*1000000//n_tokens ELSE 0 END AS type_token_ppm,
         |  CASE WHEN n_types > 0 THEN n_hapax*1000000//n_types ELSE 0 END AS hapax_ppm
         |FROM a ORDER BY source""".stripMargin,


    // two-step integer flooring mirrored exactly; corpus rate clamped >= 1
    "t11_characteristic_terms" ->
      s"""WITH tk AS (SELECT source, unnest($toksSql) AS term FROM documents),
         |bs AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt_s FROM tk GROUP BY 1, 2),
         |st AS (SELECT source, CAST(SUM(cnt_s) AS BIGINT) AS n_s FROM bs GROUP BY 1),
         |bc AS (SELECT term, CAST(SUM(cnt_s) AS BIGINT) AS cnt_c FROM bs GROUP BY 1),
         |ct AS (SELECT CAST(SUM(cnt_c) AS BIGINT) AS n_c FROM bc),
         |sc AS (SELECT bs.source, bs.term, bs.cnt_s,
         |         (cnt_s*1000000//n_s) * 1000000 // greatest(cnt_c*1000000//n_c, 1) AS lift_ppm
         |       FROM bs JOIN st USING (source) JOIN bc USING (term) CROSS JOIN ct
         |       WHERE cnt_s >= 2),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
         |        ORDER BY lift_ppm DESC, term) AS rank FROM sc)
         |SELECT source, term, cnt_s, lift_ppm, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,


    "t7_pii_scrub" -> {
      val em = graft.operators.TextAnalysis.EmailRe
      val ip = graft.operators.TextAnalysis.Ipv4Re
      val cc = graft.operators.TextAnalysis.CardRe
      s"""WITH x AS (SELECT event_id, 'user ' || CAST(user_id AS VARCHAR)
         |  || CASE WHEN user_id % 3 = 0
         |       THEN ' mail u' || CAST(user_id AS VARCHAR) || '@example.com' ELSE '' END
         |  || CASE WHEN user_id % 2 = 0
         |       THEN ' ip 10.0.' || CAST(user_id % 250 AS VARCHAR) || '.7' ELSE '' END
         |  || CASE WHEN event_id % 5 = 0
         |       THEN ' card 4111222233334' || lpad(CAST(event_id % 1000 AS VARCHAR), 3, '0') ELSE '' END
         |  || ' type=' || event_type AS raw FROM events)
         |SELECT event_id,
         |  len(regexp_extract_all(raw, '$em'))::BIGINT AS n_emails,
         |  len(regexp_extract_all(raw, '$ip'))::BIGINT AS n_ips,
         |  len(regexp_extract_all(raw, '$cc'))::BIGINT AS n_cards,
         |  md5(regexp_replace(regexp_replace(regexp_replace(raw,
         |    '$em', '[PII]', 'g'), '$ip', '[PII]', 'g'), '$cc', '[PII]', 'g')) AS scrub_md5
         |FROM x ORDER BY event_id""".stripMargin
    },


    "t6_repetition" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |    substr(md5(${wordGramSql(3)}), 1, 15) AS h
        |  FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
        |a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |    CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct FROM g GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.n_grams, 0) AS n_grams,
        |  COALESCE(a.n_distinct, 0) AS n_distinct,
        |  CASE WHEN COALESCE(a.n_grams, 0) > 0
        |    THEN CAST(FLOOR((a.n_grams - a.n_distinct) * 1000000 / a.n_grams) AS BIGINT)
        |    ELSE 0 END AS dup_ppm
        |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,


    // corpus token counts once; hapax = count exactly 1
    "t24_hapax_ratio" ->
      s"""WITH tok AS (SELECT source, unnest($toksSql) AS tok FROM documents),
         |c AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY 1)
         |SELECT source, COUNT(*) AS n_tokens,
         |  CAST(SUM(CASE WHEN c.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         |  CAST((CAST(SUM(CASE WHEN c.c = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // COUNT(*) AS BIGINT) AS hapax_ppm
         |FROM tok JOIN c USING (tok)
         |GROUP BY 1 ORDER BY 1""".stripMargin,


    // doc-level token/type counts, one ntile; `//` ppm
    "t23_ttr_deciles" ->
      s"""WITH st AS (SELECT doc_id, n_chars,
         |    CAST(len($toksSql) AS BIGINT) AS n_tok,
         |    CAST(len(list_distinct($toksSql)) AS BIGINT) AS n_types
         |  FROM documents),
         |dd AS (SELECT *, CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INTEGER)
         |    AS decile FROM st)
         |SELECT decile, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens,
         |  CAST(SUM(n_types) AS BIGINT) AS types,
         |  CAST((CAST(SUM(n_types) AS BIGINT) * 1000000)
         |    // greatest(CAST(SUM(n_tok) AS BIGINT), 1) AS BIGINT) AS ttr_ppm
         |FROM dd GROUP BY 1 ORDER BY 1""".stripMargin,


    // distinct bigrams per doc; MIN over the gram key decides novelty
    "t22_ngram_novelty" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
         |gr AS (SELECT doc_id, unnest(list_distinct(
         |    [t[i] || ' ' || t[i+1] for i in range(1, len(t))])) AS gram
         |  FROM tk WHERE len(t) >= 2),
         |f AS (SELECT gram, MIN(doc_id) AS first_doc FROM gr GROUP BY 1)
         |SELECT doc_id, COUNT(*) AS n_grams,
         |  CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST((CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000) // COUNT(*) AS BIGINT) AS novelty_ppm
         |FROM gr JOIN f USING (gram)
         |GROUP BY 1 ORDER BY 1""".stripMargin,


    // d7's cluster CTEs + per-doc token counts rolled up per language
    "t21_effective_tokens" ->
      s"""WITH RECURSIVE ${minhashPairsSql("documents")},
         |$clusterCompSql,
         |k AS (SELECT doc_id, lang, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |j AS (SELECT k.lang, k.n_tokens,
         |    CASE WHEN k.doc_id = COALESCE(c.cluster_id, k.doc_id) THEN 1 ELSE 0 END AS keep
         |  FROM k LEFT JOIN cl_comp c ON c.doc_id = k.doc_id)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(keep) AS BIGINT) AS n_kept,
         |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_raw,
         |  CAST(SUM(keep * n_tokens) AS BIGINT) AS tokens_kept,
         |  CAST((CAST(SUM(keep * n_tokens) AS BIGINT) * 1000000)
         |    // CAST(SUM(n_tokens) AS BIGINT) AS BIGINT) AS kept_ppm
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,


    // pair counts via the doc-keyed self-join (≡ the engine's in-array
    // explode on the same distinct sets); rank by the exact rational
    "t20_pmi_pairs" ->
      s"""WITH tk AS (SELECT doc_id, list_sort(list_distinct($toksSql)) AS ps FROM documents),
         |nd AS (SELECT COUNT(*) AS nd FROM tk),
         |po AS (SELECT doc_id, unnest(ps) AS tok FROM tk),
         |tc AS (SELECT tok, COUNT(*) AS c FROM po GROUP BY 1),
         |ok AS (SELECT doc_id, tok FROM po JOIN tc USING (tok)
         |  WHERE c * 10 <= (SELECT nd FROM nd) * 9),
         |pairs AS (SELECT x.tok AS a, y.tok AS b, COUNT(*) AS cab
         |  FROM ok x JOIN ok y ON x.doc_id = y.doc_id AND x.tok < y.tok
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
         |sc AS (SELECT a, b, cab,
         |    ((SELECT nd FROM nd) * cab)::DOUBLE / (ca.c * cb.c)::DOUBLE AS pmi_ratio
         |  FROM pairs JOIN tc ca ON ca.tok = a JOIN tc cb ON cb.tok = b),
         |rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pmi_ratio DESC, a, b) AS rank
         |  FROM sc)
         |SELECT CAST(rank AS INTEGER) AS rank, a, b, cab, pmi_ratio
         |FROM rk WHERE rank <= 20 ORDER BY rank""".stripMargin,


    // parallel unnest zips (term, 0-based pos); per-word CTEs shift by i
    "t19_phrase_search" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
         |po AS (SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS pos FROM tk),
         |w0 AS (SELECT doc_id, pos AS p FROM po WHERE term = 'slow'),
         |w1 AS (SELECT doc_id, pos - 1 AS p FROM po WHERE term = 'hash'),
         |w2 AS (SELECT doc_id, pos - 2 AS p FROM po WHERE term = 'batch')
         |SELECT doc_id, COUNT(*) AS n_hits
         |FROM w0 JOIN w1 USING (doc_id, p) JOIN w2 USING (doc_id, p)
         |GROUP BY 1 ORDER BY 1""".stripMargin,


    // RANK (ties share) over the bare value — order-free; Spark rank is INT
    // so the oracle's BIGINT rank stays inside the CAST'd arithmetic
    "t18_rank_normalize" ->
      """WITH r AS (SELECT doc_id, lang, n_chars,
        |    RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS rk,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT doc_id, lang, n_chars,
        |  CAST(CASE WHEN n > 1 THEN ((rk - 1) * 1000000) // (n - 1)
        |    ELSE 0 END AS BIGINT) AS pr_ppm
        |FROM r ORDER BY doc_id""".stripMargin,


    "t15_winnowing" -> winnowingPairsSql(n = 4, window = 4,
      minShared = 2L, maxFpDf = 50L),


    // token-count marginal → exact collision probability (staged ppm)
    "t25_simpson_diversity" ->
      s"""WITH tok AS (SELECT source, unnest($toksSql) AS tok FROM documents),
         |c AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
         |m AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    COUNT(*) AS n_types,
         |    CAST(SUM(c * (c - 1)) AS BIGINT) AS coll
         |  FROM c GROUP BY 1)
         |SELECT source, n_tokens, n_types,
         |  CAST((coll * 1000) // greatest((n_tokens * (n_tokens - 1)) // 1000, 1)
         |    AS BIGINT) AS collision_ppm
         |FROM m ORDER BY source""".stripMargin,


    // per-doc count moments; VMR from N·Σx² − (Σx)² (zeros implicit)
    "t26_burstiness" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |x AS (SELECT tok, doc_id, COUNT(*) AS x FROM tok GROUP BY 1, 2),
         |st AS (SELECT tok, CAST(SUM(x) AS BIGINT) AS sx,
         |    CAST(SUM(x*x) AS BIGINT) AS sxx, COUNT(*) AS n_docs_with
         |  FROM x GROUP BY 1
         |  ORDER BY sx DESC, tok LIMIT 20),
         |nd AS (SELECT COUNT(*) AS n FROM documents)
         |SELECT tok, sx AS total_count, n_docs_with,
         |  CAST(((n * sxx - sx * sx) * 1000000) // ((n - 1) * sx) AS BIGINT)
         |    AS vmr_ppm
         |FROM st, nd ORDER BY total_count DESC, tok""".stripMargin,


    // integer TF dot/norms per (doc, source); one canonical double division
    "t27_atypical_docs" ->
      s"""WITH tok AS (SELECT source, doc_id, unnest($toksSql) AS tok FROM documents),
         |dc AS (SELECT source, doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cd
         |  FROM tok GROUP BY 1, 2, 3),
         |sc AS (SELECT source, tok, CAST(SUM(cd) AS BIGINT) AS cs
         |  FROM dc GROUP BY 1, 2),
         |nd AS (SELECT source, doc_id, CAST(SUM(cd*cd) AS BIGINT) AS nd
         |  FROM dc GROUP BY 1, 2),
         |ns AS (SELECT source, CAST(SUM(cs*cs) AS BIGINT) AS ns FROM sc GROUP BY 1),
         |dt AS (SELECT dc.source, dc.doc_id, CAST(SUM(dc.cd * sc.cs) AS BIGINT) AS dot
         |  FROM dc JOIN sc ON dc.source = sc.source AND dc.tok = sc.tok
         |  GROUP BY 1, 2),
         |cosd AS (SELECT dt.source, dt.doc_id,
         |    CAST(dot AS DOUBLE) / sqrt(CAST(nd.nd * ns.ns AS DOUBLE)) AS cosine
         |  FROM dt JOIN nd ON dt.source = nd.source AND dt.doc_id = nd.doc_id
         |  JOIN ns ON dt.source = ns.source),
         |r AS (SELECT source, doc_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY cosine, doc_id) AS rank
         |  FROM cosd)
         |SELECT source, CAST(rank AS INTEGER) AS rank, doc_id, cosine
         |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,


    // 8-token prefix families with source spread
    "t28_template_prefixes" ->
      s"""WITH t AS (SELECT source, $toksSql AS ts FROM documents),
         |p AS (SELECT source, array_to_string(ts[1:8], ' ') AS prefix
         |  FROM t WHERE len(ts) >= 8)
         |SELECT prefix, COUNT(*) AS n_docs,
         |  COUNT(DISTINCT source) AS n_sources
         |FROM p GROUP BY 1
         |ORDER BY n_docs DESC, prefix LIMIT 20""".stripMargin,


    // NTILE bucketing is allocation-exact on both engines (the q120 rule);
    // new types charge their first decile
    "t29_vocab_growth" ->
      s"""WITH dec AS (SELECT doc_id, NTILE(10) OVER (ORDER BY doc_id) AS decile
         |  FROM documents),
         |tok AS (SELECT d.doc_id, unnest($toksSql) AS tok FROM documents d),
         |td AS (SELECT t.tok, dec.decile FROM tok t JOIN dec ON t.doc_id = dec.doc_id),
         |occ AS (SELECT decile, COUNT(*) AS n_occ FROM td GROUP BY 1),
         |vn AS (SELECT decile, COUNT(*) AS new_types FROM (
         |    SELECT tok, MIN(decile) AS decile FROM td GROUP BY 1) GROUP BY 1),
         |dp AS (SELECT decile, COUNT(*) AS n_docs FROM dec GROUP BY 1)
         |SELECT dp.decile,
         |  CAST(SUM(n_docs) OVER w AS BIGINT) AS docs_cum,
         |  CAST(SUM(n_occ) OVER w AS BIGINT) AS tokens_cum,
         |  CAST(SUM(COALESCE(new_types, 0)) OVER w AS BIGINT) AS vocab_cum
         |FROM dp JOIN occ USING (decile) LEFT JOIN vn USING (decile)
         |WINDOW w AS (ORDER BY dp.decile ROWS UNBOUNDED PRECEDING)
         |ORDER BY dp.decile""".stripMargin,


    // plurality lang per source (c desc, lang) then exact ppm purity
    "t30_language_purity" ->
      """WITH cnt AS (SELECT source, lang, COUNT(*) AS c FROM documents
        |  GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs FROM cnt GROUP BY 1),
        |r AS (SELECT source, lang, c,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, lang) AS rn
        |  FROM cnt)
        |SELECT r.source, tot.n_docs, r.lang AS top_lang,
        |  CAST((r.c * 1000000) // tot.n_docs AS BIGINT) AS purity_ppm
        |FROM r JOIN tot USING (source) WHERE rn = 1 ORDER BY r.source""".stripMargin,


    // distinct (source, token) sets; |A∪B| = |A|+|B|−|A∩B|
    "t31_vocab_overlap" ->
      s"""WITH st AS (SELECT DISTINCT source, unnest($toksSql) AS tok
         |  FROM documents),
         |sz AS (SELECT source, COUNT(*) AS n FROM st GROUP BY 1),
         |iv AS (SELECT a.source AS sa, b.source AS sb, COUNT(*) AS n_inter
         |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT sa, sb, n_inter,
         |  CAST((n_inter * 1000000) // (na.n + nb.n - n_inter) AS BIGINT)
         |    AS jaccard_ppm
         |FROM iv JOIN sz na ON na.source = sa JOIN sz nb ON nb.source = sb
         |ORDER BY jaccard_ppm DESC, sa, sb LIMIT 20""".stripMargin,


    // corpus counts re-joined per occurrence; rare = count ≤ 2
    "t32_rare_token_docs" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |c AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY 1),
         |p AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |    CAST(SUM(CASE WHEN c.c <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
         |  FROM tok JOIN c USING (tok) GROUP BY 1)
         |SELECT doc_id, n_tokens, n_rare,
         |  CAST((n_rare * 1000000) // n_tokens AS BIGINT) AS rare_ppm
         |FROM p ORDER BY rare_ppm DESC, doc_id LIMIT 20""".stripMargin,


    // q119's rank-weighted Gini identity on the token-count marginal
    "t34_token_gini" ->
      s"""WITH tok AS (SELECT source, unnest($toksSql) AS tok FROM documents),
         |c AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
         |k AS (SELECT source, c,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY c, tok) AS i FROM c),
         |m AS (SELECT source, COUNT(*) AS n_types, CAST(SUM(c) AS HUGEINT) AS t,
         |    CAST(SUM(CAST(i AS HUGEINT) * c) AS HUGEINT) AS w1
         |  FROM k GROUP BY 1)
         |SELECT source, n_types, t::DOUBLE AS n_tokens,
         |  (2*w1 - (n_types+1)*t)::DOUBLE / (n_types*t)::DOUBLE AS gini
         |FROM m ORDER BY source""".stripMargin,


    // top-1 share of the top-10 mass; (c desc, tok) rank is total
    "t35_head_heaviness" ->
      s"""WITH tok AS (SELECT source, unnest($toksSql) AS tok FROM documents),
         |c AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
         |r AS (SELECT source, c,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, tok) AS rn
         |  FROM c),
         |m AS (SELECT source, MAX(CASE WHEN rn = 1 THEN c END) AS top1,
         |    CAST(SUM(c) AS BIGINT) AS top10
         |  FROM r WHERE rn <= 10 GROUP BY 1)
         |SELECT source, top1, top10,
         |  CAST((top1 * 1000000) // top10 AS BIGINT) AS head_ppm
         |FROM m ORDER BY source""".stripMargin,

    // 8 unrolled merge rounds over the word-type table (Support.bpeChainSql)
    "t36_bpe_merges" -> bpeMergesSql(rounds = 8, maxWordLen = 16),

    // first-occurrence register: vocab at threshold = count(fdoc <= thr);
    // NTILE(10) checkpoints (Spark ntile INT -> rule-5 cast)
    "t50_heaps_curve" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |tile AS (SELECT doc_id,
         |    CAST(NTILE(10) OVER (ORDER BY doc_id) AS INTEGER) AS k
         |  FROM documents),
         |tl AS (SELECT k, MAX(doc_id) AS thr, CAST(COUNT(*) AS BIGINT) AS nd
         |  FROM tile GROUP BY 1),
         |nt AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS ntk FROM t),
         |fd AS (SELECT tok, MIN(doc_id) AS fdoc
         |  FROM (SELECT doc_id, unnest(tk) AS tok FROM t) GROUP BY 1),
         |vc AS (SELECT tl.k, CAST(COUNT(*) AS BIGINT) AS vocab_cum
         |  FROM tl JOIN fd ON fd.fdoc <= tl.thr GROUP BY 1),
         |tc AS (SELECT tl.k, CAST(SUM(nt.ntk) AS BIGINT) AS n_tokens_cum
         |  FROM tl JOIN nt ON nt.doc_id <= tl.thr GROUP BY 1),
         |dc AS (SELECT k, thr, CAST(SUM(nd) OVER (ORDER BY k
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_docs_cum FROM tl)
         |SELECT dc.k, dc.thr, dc.n_docs_cum, tc.n_tokens_cum, vc.vocab_cum,
         |  CAST((vc.vocab_cum * 1000000) // GREATEST(tc.n_tokens_cum, 1)
         |    AS BIGINT) AS ttr_ppm
         |FROM dc JOIN tc USING (k) JOIN vc USING (k) ORDER BY k""".stripMargin,

    // two SCOPED bpe chains (WITH inside each join side); explicit ON +
    // COALESCE key for the full outer round alignment
    "t49_bpe_stability" ->
      s"""SELECT COALESCE(le.round, ri.round) AS round,
         |  le.merged AS merged_even, ri.merged AS merged_odd,
         |  COALESCE(le.merged = ri.merged, FALSE) AS agree
         |FROM (${bpeMergesSql(rounds = 8, maxWordLen = 16,
              trainSrcSql = "(SELECT * FROM documents WHERE doc_id % 2 = 0)")}) le
         |FULL OUTER JOIN (${bpeMergesSql(rounds = 8, maxWordLen = 16,
              trainSrcSql = "(SELECT * FROM documents WHERE doc_id % 2 = 1)")}) ri
         |  ON le.round = ri.round
         |ORDER BY round""".stripMargin,

    // same chain, aggregated before/after symbol mass
    "t37_bpe_compression" -> bpeCompressionSql(rounds = 8, maxWordLen = 16),

    // train chain on the 90%, replay b1..b8 over the increment types
    "t38_bpe_drift" -> bpeDriftSql(rounds = 8, maxWordLen = 16,
      trainWhere = "doc_id % 10 <> 0", incWhere = "doc_id % 10 = 0"),

    // word-keyed replay of the same chain + lexicographic-rank vocab +
    // per-doc id rollup (Support.bpeEncodeChainSql)
    "t40_bpe_encode" ->
      s"""WITH ${bpeEncodeChainSql(rounds = 8, maxWordLen = 16)}
         |SELECT doc_id, n_words, n_tokens, token_ids
         |FROM enc ORDER BY doc_id""".stripMargin,

    // within-doc duplicated 3-gram coverage in exact integer ppm
    "t41_intra_doc_repetition" -> intraDocRepetitionSql(n = 3),

    // lang-scoped t14 algebra trained on src0; unseen bigrams hit the
    // coalesce-to-0 left joins; ntile(3) per lang (desc score, doc_id)
    "t44_ccnet_buckets" ->
      s"""WITH tk AS (SELECT doc_id, lang, source, $toksSql AS t FROM documents),
         |bg AS (SELECT doc_id, lang, source, t[i] AS w1, t[i+1] AS w2
         |  FROM tk, UNNEST(generate_series(1, len(t)-1)) AS u(i)),
         |db AS (SELECT doc_id, lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM bg GROUP BY doc_id, lang, w1, w2),
         |c12 AS (SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
         |  FROM bg WHERE source = 'src0' GROUP BY lang, w1, w2),
         |c1 AS (SELECT lang, w1, CAST(SUM(c12) AS BIGINT) AS c1
         |  FROM c12 GROUP BY lang, w1),
         |v AS (SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
         |  FROM (SELECT lang, unnest(t) AS tok FROM tk WHERE source = 'src0')
         |  GROUP BY lang),
         |sc AS (SELECT db.doc_id,
         |    CAST(SUM(db.cnt * (((COALESCE(c12.c12, 0) + 1)*1000000)
         |      // (COALESCE(c1.c1, 0) + v.v))) AS BIGINT) AS sp,
         |    CAST(SUM(db.cnt) AS BIGINT) AS n_bigrams
         |  FROM db LEFT JOIN c12 USING (lang, w1, w2)
         |    LEFT JOIN c1 USING (lang, w1) JOIN v USING (lang)
         |  GROUP BY db.doc_id),
         |s2 AS (SELECT d.doc_id, d.lang,
         |    CAST(CASE WHEN COALESCE(sc.n_bigrams, 0) > 0
         |      THEN sc.sp // sc.n_bigrams ELSE 0 END AS BIGINT) AS lm_ppm
         |  FROM documents d LEFT JOIN sc USING (doc_id)),
         |b AS (SELECT doc_id, lang, lm_ppm,
         |    NTILE(3) OVER (PARTITION BY lang ORDER BY lm_ppm DESC, doc_id) AS nt
         |  FROM s2)
         |SELECT doc_id, lang, lm_ppm,
         |  CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM b ORDER BY doc_id""".stripMargin,

    // rank types by (count desc, tok), cumulate at each threshold
    "t43_vocab_coverage" ->
      s"""WITH tt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
         |    FROM (SELECT unnest($toksSql) AS tok FROM documents) GROUP BY tok),
         |r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rn FROM tt),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_occ,
         |    CAST(COUNT(*) AS BIGINT) AS n_types FROM tt),
         |ks AS (SELECT UNNEST([1000, 2000, 4000, 8000, 16000]) AS vocab_size),
         |cv AS (SELECT k.vocab_size, CAST(SUM(r.cnt) AS BIGINT) AS covered_occ
         |  FROM ks k JOIN r ON r.rn <= k.vocab_size GROUP BY k.vocab_size)
         |SELECT CAST(c.vocab_size AS BIGINT) AS vocab_size, t.n_types,
         |  c.covered_occ, t.total_occ,
         |  CAST((c.covered_occ * 1000000) // GREATEST(t.total_occ, 1) AS BIGINT)
         |    AS coverage_ppm
         |FROM cv c CROSS JOIN tot t ORDER BY vocab_size""".stripMargin,

    // per-lang rollup of the same encode chain (docs with zero qualifying
    // words drop out of enc on BOTH sides)
    "t42_bpe_fertility" ->
      s"""WITH ${bpeEncodeChainSql(rounds = 8, maxWordLen = 16)},
         |f AS (SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(e.n_words) AS BIGINT) AS n_words,
         |    CAST(SUM(e.n_tokens) AS BIGINT) AS n_tokens
         |  FROM enc e JOIN documents d USING (doc_id) GROUP BY d.lang)
         |SELECT lang, n_docs, n_words, n_tokens,
         |  CAST((n_tokens * 1000000) // GREATEST(n_words, 1) AS BIGINT)
         |    AS fertility_ppm
         |FROM f ORDER BY lang""".stripMargin,

    // t2's keep-flag + t17's predicted-lang chains, one 8-cell aggregate
    "t39_gate_ablation" ->
      s"""WITH m AS (${qualityMetricsSql("documents")}),
         |qf AS (SELECT doc_id, n_tokens,
         |    (n_tokens >= 10 AND n_tokens <= 100000 AND
         |     (CASE WHEN n_chars > 0 THEN alpha_len*1000000//n_chars ELSE 0 END)
         |       >= 500000) AS q_ok
         |  FROM m),
         |sc AS (
         |${langScoresSql()}
         |), best AS (SELECT doc_id, lang, score,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, lang DESC) AS rn FROM sc),
         |pred AS (SELECT doc_id,
         |    CASE WHEN score = 0 THEN 'und' ELSE lang END AS predicted_lang
         |  FROM best WHERE rn = 1),
         |j AS (SELECT d.doc_id, (d.n_chars >= 150) AS len_ok, q.q_ok,
         |    (p.predicted_lang = d.lang) AS lang_ok, q.n_tokens
         |  FROM documents d JOIN qf q USING (doc_id) JOIN pred p USING (doc_id))
         |SELECT len_ok, q_ok, lang_ok, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM j GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

  )
}
