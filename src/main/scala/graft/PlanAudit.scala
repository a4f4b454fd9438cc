package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps physical-plan highlights for representative queries → PLANS.md.
  * The review loop for shuffle/broadcast/pushdown hygiene: run after
  * changing any operator and eyeball the diff. */
object PlanAudit {
  private val Audited = Seq(
    "q1_pricing_summary" -> "partial+final agg (scatter-gather shape)",
    "q2_range_scan" -> "prefix predicate pushed below compaction to the scan",
    "q3_point_lookup" -> "point predicate pushed to the scan",
    "q4_compact_latest" -> "compaction: max_by partial agg, shuffle carries one row per key",
    "q5_star_join" -> "broadcast dim join, fact never shuffles pre-agg",
    "q10_global_enrich" -> "broadcast chain (global stores)",
    "q24_topk_revenue" -> "filters pushed to all scans + broadcast dim + top-k",
    "d5_dedup_embedding" -> "blocked pair join, codegen'd integer cosine",
    "s1_knn_bruteforce" -> "query set broadcast; corpus scanned map-side",
    "d4_dedup_ngram" -> "native gram hash-set + merge-count intersect",
    "q29_split_sample" -> "zero-shuffle row-local split (scan + project only)",
    "q30_cube" -> "cube expand + partial/final agg",
    "q31_histogram" -> "row-local binning, shuffle carries (group, bin) partials",
    "t5_top_terms" -> "explode + partial-agg counts, window only on distinct terms",
    "d3_dedup_simhash" -> "native one-pass simhash at scan speed",
    "q33_range_join" -> "range join as bucket equi-join + residual (no nested-loop)",
    "q34_fuzzy_join" -> "token blocking bounds candidates; levenshtein on deduped pairs",
    "t6_repetition" -> "native one-pass repetition stats at scan speed (zero shuffle)",
    "d6_decontaminate" -> "eval gram set broadcast; train side map-side semi-join",
    "q37_stratified_cap" -> "single shuffle on stratum key, streaming window rank",
    "q41_outliers" -> "broadcast moments into a row-local decimal filter",
    "q38_search_and" -> "postings pruned to query terms pre-shuffle; broadcast semi-join",
    "q39_funnel" -> "stage frontiers co-partitioned on the entity key",
    "q42_equidepth" -> "per-group ntile window, one shuffle on the group key",
    "t7_pii_scrub" -> "regex scrub at scan speed (row-local, zero shuffle)",
    "q47_time_weighted" -> "interval window + decimal partial aggregation",
    "p2_curation_v2" -> "composed pipeline inherits stage shapes (broadcast gram set, CC on pair graph)",
    "d8_minhash_capped" -> "window count on the band key (reuses the join's partitioning), oversized buckets dropped pre-join",
    "d9_simhash_pairs" -> "band equi-join bounds candidates; codegen'd popcount residual",
    "t8_chunking" -> "row-local explode at scan speed (zero shuffle)",
    "q48_interval_overlap" -> "bucket equi-join + canonical-bucket emit (no nested-loop, no dedup shuffle)",
    "q50_gap_fill" -> "grid explode + LOCF window partitioned on the aggregation key (exchange reused)",
    "m4_duplicate_frames" -> "one partial-agg'd shuffle on the frame fingerprint",
    "q49_entity_resolution" -> "frequency-capped token blocking bounds candidate pairs; levenshtein only on deduped pairs; CC iterates over matched vertices only — candidate volume is governed by maxTokenDf, not corpus size, so 100x data is 100x bounded blocks",
    "p1_training_pipeline" -> "composed pipeline: every stage is an audited shape (row-local scoring, broadcast gram set, capped LSH bands) — no stage is all-pairs, so the composition inherits linear scaling",
    "s3_knn_ivf" -> "centroids broadcast, cell assignment map-side; probe joins only selected cells — corpus scan is the only full pass, query cost scales with probed cells not corpus",
    "q36_xml_view" -> "one StAX from_xml parse per row at scan speed (zero shuffle pre-agg) — row-local cost, embarrassingly parallel at any scale",
    "q32_snapshot_diff" -> "time midpoint as a 1-row broadcast (no driver job, no extra scan); snapshots are partial-agg'd on user_id before the diff join",
    "q52_bucketed_join" -> "write-once bucketed layout: the fact-fact sort-merge join has NO Exchange below it (bucketing satisfies the distribution on both sides); the only shuffles are the tiny post-join agg + order",
    "d10_containment" -> "containment dedup: hashed gram set once per doc, blocked self-join, codegen'd merge-intersect per pair — candidates bounded by block, never all-pairs",
    "t9_adaptive_quality" -> "per-stratum quantile gate: ONE shuffle on the stratum key; rank and count share the window partition (exchange reused)",
    "t10_vocab_stats" -> "vocabulary stats: explode + two chained partial-agg'd shuffles (stratum, token)->(stratum) — no distinct over the raw corpus",
    "d11_source_overlap" -> "pair list is tiny next to the corpus: both source-lookup joins broadcast the pairs, corpus never reshuffles",
    "s4_semantic_dedup" -> "semantic dedup without a blocking key: k-means cells bound candidate pairs (centroids broadcast, assignment map-side); pair cost is sum(|cell|^2), never n^2",
    "q53_triangles" -> "degree-ordered orientation: wedges only from out-pairs (out-degree <= sqrt(2m)), each triangle counted once from its lowest-ranked corner; support>=2 prunes the pair graph 300x before any wedge forms",
    "d12_lsh_verified" -> "two-stage dedup: LSH bounds candidates, exact verify is one codegen'd merge-intersect per CANDIDATE (native gram sets once per doc) — never per corpus pair",
    "t11_characteristic_terms" -> "two chained partial-agg'd counts ((stratum, term) then (term)), equi-join on the term key, window only over the minCount-surviving term set",
    "q40_cohort_retention" -> "first-event cohort via one partial-agg'd min per entity, then an equi-join co-partitioned on the SAME entity key (exchange reused, no window over raw events); countDistinct partial-aggs on (cohort, offset) — at 100x the only growth is the entity-keyed shuffle, never an all-events sort",
    "q54_copurchase_capped" -> "ONE basket-key shuffle builds sorted distinct item arrays (collect_set partial-aggs map-side); the cap is a row-local size filter and pairing is a row-local in-array explode — degenerate baskets are dropped before any pair exists, candidate pairs bounded by cap^2 per basket",
    "q55_store_stats" -> "two partial-agg'd single-row aggregates (raw log + compacted view) cross-joined; file stats from catalog metadata — no data scan beyond the two aggs",
    "d13_boilerplate" -> "native gram hash-sets at scan speed, ONE partial-agg'd df shuffle on the 60-bit gram hash; boilerplate set is the high-df vocabulary tail (small) — AQE sizes the marker join at runtime; final score one partial-agg'd count per doc key",
    "q57_epoch_upsample" -> "pure row-local projection + explode: zero shuffle, output rows proportional to epochs — the md5 coin is keyed, so 100x data is 100x map work and nothing else",
    "q56_signed_requests" -> "per-row sha2 over codegen'd built-ins at scan speed — zero shuffle pre-order, no UDF boundary",
    "q58_context_pack" -> "ONE shuffle on the stratum key; running token sum and bin id ride the same window partition (exchange reused)",
    "s5_label_outliers" -> "one posexplode partial-agg'd shuffle on (label, dim); centroid table broadcast (|labels| rows); scoring is a map-side codegen'd integer dot — the corpus never self-joins or reshuffles",
    "t12_quality_classifier" -> "hashing-trick linear model: token explode with weights computed IN the projection (row-local, no weight join on the default path), one partial-agg'd shuffle on the doc key",
    "t13_bm25_search" -> "inverted-index shape: the explode keeps ONLY query-term tokens (filter inside the scan projection), so the tf shuffle moves matching tokens, never the corpus; term df + corpus stats broadcast (<=|terms| rows); final top-k is TakeOrdered, no global sort",
    "t14_lm_fluency" -> "bigram LM: native one-pass gram list at scan speed; model = two chained partial-agg'd shuffles ((w1,w2) then w1); scoring joins distinct-bigrams-per-doc (pre-aggregated), not tokens — the hot-prefix skew edge is AQE's runtime skew split",
    "s6_dsir_importance" -> "hashed-feature importance: features pre-agg per (doc, bucket); bucket stats ONE partial-agg'd shuffle on <=8192 keys; weight table broadcast back — the corpus is never joined fact-to-fact",
    "d14_repeated_spans" -> "native one-pass gram list + ONE partial-agg'd shuffle on the gram (count/distinct-doc/min share the grouping); df>=minDf prunes the vocabulary tail before a TakeOrdered top-k",
    "q60_kmv_distinct" -> "KMV registers: distinct partial-agg on (group, hash), rank<=k compiles to WindowGroupLimit (per-partition top-k before the merge) — the distinct hash set is never globally sorted; estimator is one tiny per-group agg",
    "q61_cms_counts" -> "CMS: depth-way explode map-side combined into ONE partial-agg'd shuffle on <=depth*width register keys; probes broadcast-join the finished sketch — the stream/corpus is never rescanned per probe",
    "q62_bloom_membership" -> "bloom build is one partial-agg'd bit_or on <=words keys; the probe joins the <=words-row filter broadcast — membership is per-row bit math, no shuffle of the probe beyond its own distinct",
    "q63_hll_distinct" -> "HLL: ONE partial-agg'd shuffle on <=m register keys per group (no distinct pre-pass needed — max rho absorbs duplicates); estimate is a per-group integer fold, empty registers handled arithmetically (no m-row fill join)",
    "q64_zorder_layout" -> "z-value is literal-shift integer math inside whole-stage codegen (zero shuffle); ONE partial-agg'd shuffle on <=partitions keys for the footer stats — at a real write the same value feeds repartitionByRange + sortWithinPartitions",
    "q65_kmv_setops" -> "set algebra runs on REGISTERS (pairs x 2k rows), never the corpus: one re-rank window per pair for the union sketch, inclusion-exclusion is row arithmetic; the only corpus-sized work is the one distinct building the base sketches",
    "q66_label_prop" -> "per round: edges x labels equi-join co-partitioned on the vertex key, plurality pick is a partial-agg'd count + WindowGroupLimit top-1 — no global sort; labels checkpoint on cadence so lineage stays flat",
    "q67_profile" -> "single scan: row-local explode to (column, value), ONE partial-agg'd shuffle to value counts (profile-sized, checkpointed); every stat derives from that frame — base stats as a chained agg, top value as WindowGroupLimit top-1",
    "q68_bloom_join" -> "runtime-filter join: build-side bloom collects to a bounded literal array, probe rows die in a row-local codegen'd filter BEFORE the shuffle — shuffled bytes scale with the build side's selectivity, and FPs are eliminated by the join itself",
    "s7_hybrid_rrf" -> "fusion runs on top-k lists (hundreds of rows): the rankers keep their own bounded shapes (BM25 never shuffles the corpus, ANN broadcasts queries); RRF is a union + one tiny agg",
    "q69_quantile_sketch" -> "log-histogram registers: row-local bucket id inside codegen, ONE partial-agg'd shuffle on <=hundreds of bucket keys per group; quantile lookup windows run over register rows, never the data",
    "q70_heavy_hitters" -> "exact heavy hitters with a CMS-pruned shuffle: counters collect bounded (depth*width), rows die in a row-local codegen'd threshold gate BEFORE the groupBy — shuffled keys scale with candidate density, not corpus keys; the exact HAVING kills colliding light keys",
    "q71_kcore" -> "synchronous peel per round: one partial-agg'd degree count + two equi-joins against the shrinking keep set, adjacency checkpointed — shuffles on vertex keys only, rounds bounded by peeling depth with an edge-count fixpoint stop",
    "t15_winnowing" -> "winnowed fingerprints: row-local gram explode, per-doc window argmin over ONE doc-key exchange (both windows share it); pairs from a df-capped inverted-index equi-join on the fingerprint — posting lists bounded, candidates never corpus^2",
    "q72_join_size_sketch" -> "join-size estimate runs on REGISTERS (<=depth*width rows per side): register equi-join + per-row dot + min — the corpora are scanned once to build sketches and never again; the certified upper bound is what you consult BEFORE committing to the real shuffle",
    "q73_ktruss" -> "k-truss: per round, triangles enumerate via degree-ordered orientation (out-degree <= sqrt(2m), hub wedges never explode), support is ONE partial-agg'd shuffle on the canonical edge key, under-supported edges drop synchronously; the shrinking edge frame checkpoints per round",
    "q74_rendezvous_route" -> "rendezvous routing: per-key argmax over node-seeded hashes is a pure row-local codegen'd expression — zero shuffle before the tiny (nodes x nodes) move-matrix agg; membership change recomputes nothing but the expression",
    "q75_sketch_partition" -> "sketch-ranged layout: bounds come from the register sketch (ONE <=hundreds-of-keys shuffle; no sampling scan of the data), pid is a row-local indicator sum inside codegen, audit is one partial-agg'd shuffle on <=partitions keys",
    "s8_knn_multiprobe" -> "multi-probe ANN: corpus bucketed once map-side; the 9x probe explosion lives inside the BROADCAST query relation, so the corpus is never re-scanned or re-shuffled; per-candidate cost is one codegen'd integer dot",
    "q76_winsorized" -> "winsorized aggregation: quantile bounds derive from the register sketch (ONE register-key shuffle), broadcast as one row per group into a row-local clamp — the data passes twice at scan speed (sketch build + clamped agg), with the first pass free whenever yesterday's registers exist",
    "s9_cluster_balanced" -> "cluster-balanced subset: centroids broadcast (map-side cell assignment), then ONE shuffle on the cell key with a streaming window rank — the corpus never self-joins; the cap bounds every topic's contribution deterministically",
    "q80_rmw_fold" -> "per-key RMW fold without state: the clamp-at-zero recurrence folds in closed form — ONE ordered window over the key exchange (running sum + prefix-min share it) and one order-free aggregate; no mapGroupsWithState, no per-key sequential pass",
    "t16_moore_lewis" -> "contrastive selection: TWO bigram LMs share the t14 shape (two chained partial-agg'd shuffles each, the target LM over the small src1 slice only); scoring joins the per-doc distinct-bigram frame, V is a 1-row broadcast — never a token-level join",
    "q79_sliding_hll" -> "sliding distinct from mergeable registers: hourly HLL registers built ONCE (one <=units*m-key shuffle), each overlapping window max-merges them via a row-local explode + one register-key shuffle — the raw events are scanned once regardless of window count or overlap",
    "d16_quality_keeper" -> "keeper election: clustering keeps its bounded LSH+CC shape, quality is a row-local projection joined on the doc key, and the argmax-quality keeper + cluster size are TWO windows sharing ONE cluster-key exchange",
    "d15_incremental_dedup" -> "incremental dedup: history participates ONLY through its persisted band table (no re-banding, no history-history pairs — the build relation is the fresh increment's bands); per-increment cost tracks the increment's bucket density, not |corpus|^2",
    "s10_hard_negatives" -> "filtered ANN (hard-negative mining): ONE full-corpus IVF index serves any label predicate — the label gate is a candidate-side filter inside the probed-cell join (before the top-k window), so changing the filter re-trains nothing and re-scans nothing",
    "p3_targeted_curation" -> "composed pipeline (the suite's slowest query): lang/quality gates are row-local scans; decontamination broadcasts the eval gram set (map-side semi-join); near-dup stage is capped-band LSH + verify on CANDIDATES only; the final stratified cap is one stratum-key shuffle with a streaming window rank — no stage is all-pairs, so 100x data is 100x per-stage work",
    "q81_mv_incremental" -> "incremental MV maintenance: base and delta halves aggregate independently (partial-agg'd on the key), the merge aggregates STATE-sized frames — at a real deployment the base state is yesterday's table, so the 100 TB history is scanned once on arrival and never again",
    "q82_rolling_anomaly" -> "trailing-window anomaly: ONE ordered window per key carries three integer registers (n, S, Q in decimal); the flag is a row-local integer comparison — no self-join, no doubles, and the same exact test runs as bounded-ring streaming state (StatefulOps.anomalyMonitor)",
    "q84_pareto_front" -> "Pareto frontier without the O(n^2) dominance join: both dominance tests are windows over ONE sort per group (strict-x via RANGE-to-1-PRECEDING on the DESC integer ordering, x-ties via the tie partition) — the all-pairs check never materializes",
    "q85_cumulative_distinct" -> "COUNT(DISTINCT) OVER in first-seen-flag form: one narrow window keyed (key, value) marks first occurrences, then the running sum rides PERIOD-sized rows — no per-row distinct state, no O(n^2) window",
    "d17_tf_cosine" -> "TF cosine join: candidates from the RARE-gram inverted index (relative df cap — each qualifying gram contributes <= cap^2 pairs), the exact dot re-joins gram vectors per CANDIDATE pair only; tf frame checkpointed once, re-read by all four consumers",
    "s11_mmr_diversify" -> "MMR re-rank: the pool is the audited broadcast-queries brute-force shape (corpus never shuffles); the greedy is one flatMapGroups over <= poolSize rows per query — sequential where the algorithm is sequential, parallel across queries, zero driver involvement",
    "s12_ann_recall" -> "recall evaluation joins two RESULT-sized top-k frames on (query, neighbor) — the corpus is never touched; zero-hit queries survive via the left join from the truth side",
    "q87_markov_transitions" -> "Markov transitions: one lead window per key (the only corpus-sized shuffle), counts partial-agg on (from, to) — state-space-sized; probabilities divide via a window over the COUNT frame, never the data",
    "q89_distribution_drift" -> "drift monitor: one partial-agg'd shuffle on (group, bin), cohort totals via a window over BIN-sized rows, TV in exact integer cross-products — probabilities never materialize as floats",
    "q90_peak_concurrency" -> "sweep line: 2 delta points per interval, ONE ordered window per group — the O(n^2) overlap self-join never forms; peak and attaining time are order-free under tied timestamps",
    "d18_consensus_dedup" -> "consensus: each detector keeps its own bounded candidate shape; the merge full-outer-joins PAIR-sized frames on (id_a, id_b) — the corpus is never touched by the consensus step",
    "q96_small_qty_parts" -> "decorrelated correlated-avg subquery (Q17 shape): per-part aggregate re-joined on the SAME key (one extra fact shuffle, no per-row subquery), threshold cross-multiplied to integers, dim broadcast — at 100x the only growth is the two part-keyed exchanges",
    "q97_waiting_suppliers" -> "EXISTS/NOT-EXISTS decorrelated into per-order counts (Q21 shape): two chained partial-agg'd group-bys on keys the join already shuffled by — no correlated probes, no row-at-a-time semi-joins",
    "q99_bfs_hops" -> "frontier BFS: each round joins the FRONTIER (not the cumulative labels) to the adjacency and anti-joins known nodes — work tracks the expanding wavefront; round count constant; frontier + labels checkpoint per round so lineage stays flat",
    "q101_cusum" -> "CUSUM in closed form: prefix sum and prefix min share ONE ordered window exchange per key; the per-type integer target is a 5-row broadcast — the sequential monitor never runs sequentially",
    "d19_prefix_join" -> "prefix-filtered similarity join: candidates from the RAREST-first prefix postings (lossless — provably superset of all qualifying pairs), size filter applied inside the join, exact verify one codegen'd merge-intersect per candidate; gram sets checkpointed once, read by df/prefix/verify. Measured candidate growth (CandidateProbe): 7.7k -> 8.4k -> 911k at 500/500/5000 docs — QUADRATIC on this vocabulary-saturated corpus, and provably irreducible while lossless (true pairs share only common grams: median min-shared-df 94 at 5k docs, so any posting cap loses pairs). Data-dependent by design; the maxGramDf escape hatch (capBuckets pattern, changes the pair definition) or a lossy blocker (d2/d25/d30) is the 100 TB path when the vocabulary saturates",
    "q107_incremental_cc" -> "incremental CC: the delta CC runs on the CONTRACTED graph (component-label vertices + delta edges), the 100 TB base edge log contributes only its label table, re-joined once — base edges are never re-iterated",
    "s19_item_cosine" -> "item-item CF: ONE user-key shuffle builds each user's sorted (item, value) array ((user,item) dupes pre-summed so the cap counts distinct items), the cap is a row-local size filter with whole-heavy-user drop (cap^2 bound per user), co-rated pairs are a row-local in-array upper-triangle explode (two native generators — the former per-user self-join exchange is gone), norms one item-keyed partial agg over the same checkpointed arrays; top-k is TakeOrdered",
    "q110_weighted_median" -> "weighted median via BUCKETED two-phase election over (group, value) weight registers: the registers (one corpus-sized partial-agg'd shuffle) roll up to (group, value>>12) bucket weights, the median bucket is elected on that tiny frame (cum monotone → the first bucket whose end-cumulative passes 2·cum ≥ tot provably contains the elected value), and ONLY the winning bucket's registers see an ordered window — no stage sorts more than max(buckets/group, values/bucket) rows even on a near-unique value domain (which made the single-window register form slower than raw: measured 3.05s vs 2.3s fresh-JVM, scaling 4.4x → 1.6x)",
    "t20_pmi_pairs" -> "PMI pairs: >90%-df boilerplate tokens leave BEFORE pairing (banned set is <=avgDocLen/0.9 tokens, broadcast — the q70 runtime-filter pattern), the ordered-pair explode is two native generators (posexplode + slice, no interpreted HOFs), two chained partial-agg'd count shuffles (pair, token), broadcast N — at real corpus scale the stopword head (df->100%) is exactly what the rule removes, so per-doc pair volume is bounded by the distinct NON-boilerplate token count squared",
    "q116_stickiness" -> "exact DAU/MAU: each distinct user-day explodes onto its <=30 window days ROW-LOCALLY (bounded blowup), then one (day)-keyed distinct+count — the raw log is scanned once, no per-day rescan, no sliding-distinct state",
    "q121_nearest_click" -> "nearest as-of: backward last() and forward first() carries share ONE key exchange AND one sort; the direction pick is row-local CASE arithmetic — the range join (O(n*m) per key) never forms",
    "s23_mutual_nn" -> "mutual NN: candidate pairs bounded by IVF cells (centroids broadcast, assignment map-side); the mutual check joins two CORPUS-sized 1-NN tables, never the pair set against itself",
    "q113_nation_volume" -> "trade matrix: the fact table takes exactly two key-joins (order, supplier); all four dimension hops are broadcasts — no fact-fact shuffle beyond the order join, group-by partial-aggs map-side",
    "s13_pq_topk" -> "PQ ANN: codebooks are driver literals (m x ksub x subDim longs), the 8-code encode is ONE zero-shuffle codegen'd projection, queries broadcast — the searchable index is codes (8 small ints/vector), 64x narrower than the vectors",
    "s14_pq_rerank" -> "two-stage retrieval: the code index narrows to poolSize candidates per query; ONLY those rows join back to the full-vector table for the exact re-rank — full vectors are read per-candidate, never per-corpus",
    "s15_kcenter_coreset" -> "farthest-first coreset: the corpus carries ONE integer dmin register; each of the k rounds is a map-side LEAST relax + a top-1 reduction (one-row collect) — no pairwise distance matrix ever forms, cost is k scans of a checkpointed narrow frame",
    "q92_watermark_lag" -> "watermark audit: ONE prefix-max window per type over ingest order, then a partial-agg'd summary — disorder statistics without sorting the stream twice or joining arrival against event time",
    "d25_simhash_calibration" -> "simhash<->Jaccard calibration: 32-bit fingerprint keeps each of the 4 bands at 256 values (16-bit bands go dense as the corpus grows) and capBuckets(128) whole-bucket-drops template clusters BEFORE the band self-join — candidate pairs <= 4*256*128^2/2 ~ 8.4M at ANY corpus size (measured linear 26k->262k on 10x data); exact token-set ops run per CANDIDATE only",
    "t22_ngram_novelty" -> "novelty audit: gram explode partial-aggs into ONE (gram)-keyed min (first owner), the join back re-uses the same gram-key partitioning, per-doc rollup is a second partial-agg'd shuffle — never a doc x doc comparison; AQE skew-join splits any hot boilerplate gram at runtime",
    "s17_link_prediction" -> "Jaccard link prediction: wedges come from the hub-keyed self-join of the checkpointed adjacency with whole-hub-drop at degree<=50 (wedge volume is sum d(h)^2 — one celebrity hub otherwise owns the job), existing edges leave via an anti-join, denominators stay full-graph degrees, top-k is TakeOrdered",
    "q136_degree_histogram" -> "degree distribution: symmetric edge union partial-aggs into (vertex)->degree then (degree)->count — two hash-agg shuffles, histogram-sized result; the expensive part (cooccurrenceEdges) keeps its capped-basket bound (<=5^2 pairs per order)",
    "q122_clustering_coeff" -> "transitivity: triangles via degree-ordered orientation (out-degree <= sqrt(2m)), wedges are ARITHMETIC on the degree table (sum d(d-1)/2, no wedge materialization); both exact integers cross-joined as 1-row frames, one canonical double division",
    "d28_incremental_exact" -> "incremental exact dedup: the history corpus participates ONLY through its persisted (id, content_hash) table, semi-join-probed by the increment's DISTINCT hash set (increment-sized — broadcastable); per-ingest cost tracks the increment, equivalence to full-corpus dedup is by construction",
    "s36_ann_delete_mask" -> "ANN under deletion: tombstoned vectors are masked on the CELL table at probe time (no retrain, no index rebuild) — masking the cells masks the corpus join side with it, so deleted vectors are neither candidates nor results; identical probe shape to s3",
    "q174_deindex_tombstone" -> "R6 de-index: the secondary index derives from the compacted latest view in the SAME plan — tombstoned keys leave the index and the lookup in one pass, no separate de-index write to drift (the reference's CDC de-indexing TODOs dissolve structurally)",
    "q175_k_anonymity" -> "k-anonymity audit: two chained partial-agg'd shuffles (QI tuple -> group sizes -> k-band histogram), both frames QI-space-sized; the balance band is offset floor-div integer math inside codegen",
    "s37_principal_direction" -> "integer power iteration: the covariance register is ONE (dim,dim)-keyed partial-agg'd shuffle (corpus touched once, work n*d^2 map-side); every power step runs on the d^2-row register with a 1-row broadcast max — DECIMAL(38) matvec + per-iteration ppm normalization means magnitudes cannot grow, so iteration count is unbounded-safe",
    "s38_variance_concentration" -> "Rayleigh/trace ppm over the SAME covariance + direction registers as s37 — the only corpus-sized work is the one Gram-matrix shuffle; numerator is PSD (floor==truncate), everything else is register-sized arithmetic",
    "q176_l_diversity" -> "l-diversity audit: countDistinct partial-aggs on the (QI, band) pair then rolls to QI — two chained QI-space-sized shuffles, no row-level window",
    "s39_embedding_clusters" -> "mutual-1-NN clustering: candidate cosines bounded by IVF cells (sum |cell|^2, never n^2); the mutual check joins two CORPUS-sized 1-NN tables; CC runs on the mutual edge set (<= n/2 edges, every vertex 1-NN out-degree 1); purity aggregates are component-space-sized",
    "s40_ann_insert" -> "insert-into-frozen-index: new vectors assign map-side against broadcast centroid literals (codegen'd ldot, zero shuffle) and union onto the existing cell table — no retrain, no corpus re-scan; probe path identical to s3",
    "d30_sorted_neighborhood" -> "sorted-neighborhood blocking: ONE ordered-window exchange per lang builds ranks; candidates are window row-local lead()s — O(n*w) pairs BY CONSTRUCTION (a rank window cannot degenerate like a hash bucket); exact verify joins the checkpointed gram-set frame by id",
    "t36_bpe_merges" -> "BPE training: ONE corpus-sized token aggregate builds the word-type table; every merge round runs on the VOCABULARY-sized frame (corpus-size-independent) — pair explode is row-local, argmax is a 1-row bounded collect, merge application is native codegen'd replace",
    "t37_bpe_compression" -> "same chain as t36; the audit is two one-row aggregates over the initial/final type tables crossed into one row",
    "t38_bpe_drift" -> "frozen merges replayed over the increment's type table: k row-local replaces, no retrain — per-increment cost tracks the increment's vocabulary, not the corpus",
    "p5_release_gate" -> "composed release gate: row-local length gate -> O(n*w) window blocker -> broadcast eval-gram semi-join -> vocabulary-sized BPE rounds; the card crossJoins one-row aggregates only — no stage is all-pairs or corpus-quadratic",
    "q177_edge_churn" -> "temporal edge churn: half-membership folds to min/max flags in ONE edge-keyed partial-agg'd shuffle — no edge-set self-join, no second scan",
    "s41_pq_drift" -> "PQ drift: training is threshold-gated on the OLD corpus; the increment pays a row-local encode against literal codebooks + one subspace-keyed partial agg — no retrain, no corpus re-scan",
    "t39_gate_ablation" -> "gate ablation: all three gate flags are row-local codegen'd column math (native stopword/lang-score expressions); the matrix is ONE 8-cell partial-agg'd aggregate",
    "q178_association_rules" -> "association rules: supports come from the one-basket-shuffle co-purchase aggregate (pair volume bounded per basket); rule math is staged integer ppm on pair-sized frames; top-50 is a TakeOrdered",
    "d31_consensus_v2" -> "four-signal consensus: each signal is its own audited blocker (capped LSH bands / simhash bytes / hash blocks / O(n*w) rank window); flag joins run on PAIR-sized frames, the corpus is never re-shuffled by the merge",
    "s16_ivf_pq" -> "IVF-PQ (the billion-scale index shape): coarse centroids AND the per-subspace codebooks are driver literals (broadcast into codegen), cell assignment + 8-code encode are zero-shuffle projections; a query scores only probed-cell candidates against CODES — it touches neither the corpus nor any full vector, so query cost follows probed-cell size at any scale",
    "t21_effective_tokens" -> "effective-dataset-size KPI: dedup keeps its bounded LSH+CC shape (capped bands, pair-graph CC); the report joins the doc-keyed keeper table back on the doc key and rolls up per lang — one lang-keyed partial agg over corpus-sized (not pair-sized) frames",
    "s30_probe_recall_curve" -> "probe sweep on ONE shared training: the IVF index is built once and checkpointed; each probe depth re-joins only the probed cells (candidate volume follows probe depth), recall joins RESULT-sized top-k frames — 3 sweep points cost 3 probe joins, never 3 trainings or 3 corpus scans",
    "d20_cluster_sizes" -> "duplication profile: clustering keeps its capped-band LSH + pair-graph CC bound; the histogram is two chained partial-agg'd rollups (cluster -> size, size -> count) over CLUSTER-sized frames — never docs^2",
    "q163_brand_cross_sell" -> "brand co-occurrence: the fact joins the brand dim broadcast, distinct (order, brand) is one partial-agg'd shuffle, and the self-join key is the ORDER key with <=25 brands bounding the per-order blow-up (<=300 pairs/order) — pair volume is linear in orders; top-20 is TakeOrdered",
    "t23_ttr_deciles" -> "lexical diversity: token stats are row-local native expressions at scan speed; the ntile ranks the DOC-LEVEL stats frame (corpus-sized but narrow — at 100 TB the decile bounds would come from Layout.sketchRangeBounds registers instead of a global sort), rollup is one 10-key partial agg",
    "t40_bpe_encode" -> "document encoding: merge replay runs on the DISTINCT-WORD table (vocabulary-sized, never per token); the corpus pays one tokenize-explode, one word-keyed join against the vocab-sized id table (AQE-broadcastable), one doc-keyed rollup — vocab rank is a window over the vocabulary frame only",
    "t42_bpe_fertility" -> "fertility card: the t40 encode chain (vocabulary-sized replay, one corpus tokenize-explode, one doc-keyed rollup) followed by a lang-keyed partial agg over the DOC-sized encode output — the rollup never revisits tokens",
    "p6_tokenized_release" -> "tokenized release: p5's gate chain (row-local gates, O(n*w) window blocker, broadcast decontamination) feeds the t40 encode on SURVIVORS only; the manifest is a lang-keyed partial agg over the doc-sized encode output",
    "t41_intra_doc_repetition" -> "intra-doc repetition gate: one row-local gram explode, one count window over the HIGH-cardinality (doc, gram) key (parallelism follows docs, not groups), coverage explodes n rows per duplicated occurrence into a doc-keyed partial agg — linear in corpus tokens, no joins beyond the doc-keyed merge",
    "d32_span_coverage" -> "exact-substring span coverage: NO pair table — the dup-gram set is vocabulary-sized (one gram-keyed partial-agg'd distinct-doc count) and each gram OCCURRENCE joins it at most once, so a million-df boilerplate gram adds its occurrence count, never a pair product; gram keys shuffle as 60-bit md5 longs, not strings; coverage is a doc-keyed partial agg; the occurrence frame is checkpointed once for its two readers",
    "d33_split_leakage" -> "split-leakage audit: the split label is a ROW-LOCAL md5 function of the id, so labeling both pair ends adds ZERO joins and zero shuffles to the blocker's pair frame; the eval-doc rollup is one pair-sized partial agg — audit cost rides the blocker, never the corpus",
    "d34_cluster_split" -> "cluster-aware split: one row-local md5 label on the clustering's output (zero shuffles beyond the audited LSH+CC chain); leakage is zero BY CONSTRUCTION — both ends of any pair share the representative id",
    "d35_span_trim" -> "span trimming: same occurrence-linear frames as d32 (vocabulary-sized dup-gram/keeper table via one gram-keyed partial agg, occurrence-sized join) plus one (doc, pos)-keyed anti-join and a doc-keyed rebuild rollup — still no pair table; gram keys shuffle as 60-bit md5 longs; keeper election is a packed-BIGINT min (map-side partial agg, no window sort)",
    "d36_dup_weights" -> "duplicate-discounted weights: the d7 cluster chain (bounded LSH + pair-graph CC) followed by a CLUSTER-sized size rollup and a doc-keyed join — weight math is row-local integer ppm",
    "t43_vocab_coverage" -> "vocab coverage curve: one corpus token aggregate to the VOCABULARY-sized type table; rank, cumulation and the 5-threshold join all run over the type table (the 5-row threshold side broadcasts into a nested-loop over vocab rows) — the corpus is scanned once")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val interesting = Seq("PushedFilters", "Scan parquet", "Join", "HashAggregate",
      "Exchange", "Window", "Sort")
    val out = new StringBuilder
    out.append("# PLANS — physical-plan evidence (generated by `sbt \"runMain graft.PlanAudit\"`)\n\n")
    out.append("Highlight lines only (joins/aggregates/exchanges/scans) at sf0.001.\n")
    for ((name, why) <- Audited) {
      out.append(s"\n## $name — $why\n\n```\n")
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      plan.split("\n")
        .filter(l => interesting.exists(l.contains))
        .take(16)
        .foreach(l => out.append(l.trim.take(200)).append("\n"))
      out.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), out.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
