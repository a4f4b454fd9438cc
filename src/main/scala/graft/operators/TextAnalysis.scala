package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All scoring is integer or integer-ratio arithmetic (parts-per-million)
  * — deterministic, partition-order-free, and reproducible in the SQL
  * oracle. Everything is a narrow per-row projection (no shuffle at all),
  * which is the ideal 100 TB shape: these run at parquet-scan speed.
  */
object TextAnalysis {

  /** Tiny per-language stopword marker lists for the n-gram/stopword
    * language-ID heuristic. Public common function words. */
  val StopwordLists: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"),
    "zh" -> Seq("的", "是", "了", "在"))

  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    stopwordCount(toks, words)

  /** Exact long floor-division (Catalyst IntegralDivide, SQL `div`) —
    * matches DuckDB `//` for non-negative operands at ANY magnitude. The
    * former floor(double-division) form was only exact while the numerator
    * stayed under 2^53 (~9e9 token counts), which a 100 TB corpus exceeds. */
  private def ldiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** Predicted-language column expression: argmax of stopword hits per
    * language; zero scores map to "und"(etermined); score ties break to the
    * lexicographically *last* language code. One native pass over the token
    * array (PredictedLang) — the per-language HOF-filter scoring was
    * interpreted per (token, word). Exposed as a Column so compositions
    * (the curation pipeline) can attach it in a projection instead of
    * re-joining. */
  def predictedLangCol(text: Column): Column =
    langId(tokens(text), StopwordLists.toSeq.sortBy(_._1))

  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), predictedLangCol(col(textCol)).as("predicted_lang"))

  /** Alpha-ratio in exact integer ppm over a text column — THE quality
    * number [[qualityScore]] reports and
    * [[graft.operators.Dedup.qualityKeeper]] elects keepers on;
    * single-sourced so the election can never drift from the gate.
    * Zero-length texts score 0. */
  def alphaPpmCol(text: Column): Column = {
    val textLen = length(text).cast("long")
    // native byte-scan count ≡ length(regexp_replace(text, "[^a-zA-Z]", ""))
    // (AsciiAlphaCount scaladoc) — the regex spelling allocates the stripped
    // string per row and dominated t2/d16's single-split quality projection
    val alphaLen = call_function("graft_alpha_count", text)
    when(textLen > 0, ldiv(alphaLen * 1000000L, textLen)).otherwise(0L)
  }

  /** Quality scoring: token count, character stats, stopword ratio (ppm),
    * alpha ratio (ppm), mean token length (ppm) and a boolean keep flag.
    * Heuristics follow public quality-filter recipes (Gopher/C4-style
    * length + ratio rules) re-expressed as codegen'd column math. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("long")
    val allStop = StopwordLists.values.flatten.toSeq.distinct
    val stopHits = stopwordHits(toks, allStop).cast("long")
    val textLen = length(col(textCol)).cast("long")
    val sumTokLen = sumTokenChars(toks)
    // exact long floor-division ≡ DuckDB `//` at any magnitude
    def ppm(num: Column, den: Column): Column =
      when(den > 0, ldiv(num * 1000000L, den)).otherwise(0L)
    docs.select(
      col(idCol),
      nTok.as("n_tokens"),
      textLen.as("n_chars"),
      ppm(stopHits, nTok).as("stopword_ppm"),
      alphaPpmCol(col(textCol)).as("alpha_ppm"),
      ppm(sumTokLen, nTok).as("mean_tok_len_ppm"),
      keepCol(col(textCol)).as("keep"))
  }

  /** The t2 keep rule as ONE reusable row-local Column (single-source:
    * [[qualityScore]], the w15 streaming gate and the w16 curation loop
    * must agree on the gate definition by construction). */
  def keepCol(text: Column): Column = {
    val nTok = size(tokens(text)).cast("long")
    nTok >= 10L && nTok <= 100000L && alphaPpmCol(text) >= 500000L
  }

  /** Token counting: whitespace tokens plus a BPE-ish subword segmentation
    * (letter runs / digit runs / single other chars — the GPT-2 pre-tokenizer
    * shape, portable regex). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = size(tokens(col(textCol))).cast("long")
    val bpe = size(regexp_extract_all(lower(col(textCol)), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")
    docs.select(col(idCol), ws.as("ws_tokens"), bpe.as("bpe_tokens"))
  }

  /** Fingerprint column expressions (md5 over normalized text; polynomial
    * rolling hash h = (h*131 + ascii(first char)*7 + len) mod 1e9+7). */
  def contentFpCol(text: Column): Column = md5(normalizeText(text))

  /** Native one-pass fold (RollingFingerprint) — the interpreted `aggregate`
    * HOF form evaluated 4 sub-expressions per (row, token). */
  def rollingFpCol(text: Column): Column = rollingFp(tokens(text))

  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      contentFpCol(col(textCol)).as("content_fp"),
      rollingFpCol(col(textCol)).as("rolling_fp"))

  /** Repetition scoring: duplicate word-n-gram ratio per document (the
    * Gopher-style "duplicate n-gram fraction" quality signal). One native
    * pass per row (WordNgramStats: split, hash each gram to 60-bit md5,
    * sort, count) — no shuffle, runs at parquet-scan speed; the ratio is
    * exact integer ppm arithmetic. Splits on single spaces with empties
    * kept (≡ DuckDB `string_split(text,' ')`), NOT the lowercasing
    * `tokens()` — repetition is a surface-form property. */
  def repetition(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    docs.select(col(idCol), wordNgramStats(col(textCol), n).as("st"))
      .select(
        col(idCol),
        col("st").getItem(0).as("n_grams"),
        col("st").getItem(1).as("n_distinct"))
      // exact long floor-division ≡ DuckDB `//` at any magnitude
      .withColumn("dup_ppm",
        when(col("n_grams") > 0,
          ldiv((col("n_grams") - col("n_distinct")) * 1000000L, col("n_grams")))
          .otherwise(0L))
  }

  /** PII patterns shared by the scrubber and its oracle — deliberately
    * limited to regex constructs with identical semantics in Java regex and
    * RE2 (char classes, bounded repetition, \b, (?i)): no lookaround, no
    * backreferences. */
  val EmailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val CardRe = "\\b[0-9]{13,19}\\b"

  /** PII scrubbing — the redaction pass a training corpus runs before
    * anything else: per row, count and replace emails, IPv4 addresses and
    * long digit runs (card/account shapes). Pure row-local projection
    * (scan-speed, zero shuffle); patterns apply in a fixed order
    * (email → ip → card) so counts are unambiguous. */
  def scrubPii(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      replacement: String = "[PII]"): DataFrame =
    // One native expression evaluates all counts + the sequential
    // replacement in a single pass (PiiScrub) — the declarative form paid
    // 6 independent full-text regex scans per row. Two-step select so the
    // struct is computed once (CollapseProject keeps multiply-referenced
    // non-trivial aliases in their own project).
    docs.select(col(idCol),
        scrubPiiStruct(col(textCol), EmailRe, Ipv4Re, CardRe, replacement).as("st"))
      .select(
        col(idCol),
        col("st").getField("n_emails").as("n_emails"),
        col("st").getField("n_ips").as("n_ips"),
        col("st").getField("n_cards").as("n_cards"),
        col("st").getField("scrubbed").as("scrubbed"))

  /** Top-`k` tokens by corpus frequency per group (term-frequency profile).
    * One explode + one (group, token) count + a top-k window over the
    * (small) distinct-term frame; ties break to the lexicographically first
    * token. The explode never materializes the corpus — partial counts
    * combine map-side. */
  /** Sliding token-window chunking: split each document into windows of
    * `chunkTokens` tokens advancing by `chunkTokens - overlap` (the standard
    * context-window preprocessing step for training corpora). Chunk starts
    * are `0, stride, 2·stride, …` while < n_tokens, so the final chunk may
    * be short but no token is unreachable; token-less documents emit no
    * chunks. Emits `(id, chunk_idx, chunk_text, n_chunk_tokens)`.
    *
    * Scale shape: pure row-local explode — no shuffle; output row count is
    * input token count ÷ stride. The `sequence` start/stop are both 0-based
    * with stop = n−1 so an empty array can't trigger sequence's descending
    * mode (it counts DOWN when start > stop — the filter guards n > 0). */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap ($overlap) < chunkTokens ($chunkTokens)")
    val stride = chunkTokens - overlap
    docs
      .select(col(idCol), tokens(col(textCol)).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .filter(col("n") > 0)
      .select(col(idCol), col("t"), col("n"),
        posexplode(sequence(lit(0L), col("n") - 1L, lit(stride.toLong)))
          .as(Seq("chunk_idx", "s")))
      .select(
        col(idCol),
        col("chunk_idx").cast("int").as("chunk_idx"),
        array_join(slice(col("t"), (col("s") + 1L).cast("int"), lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens.toLong), col("n") - col("s")).as("n_chunk_tokens"))
  }

  def topTermsPerGroup(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val counts = docs
      .select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(groupCol, "token")
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("n").desc, col("token"))
    counts.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-stratum ADAPTIVE quality filtering: keep the top `keepPpm`
    * fraction of every stratum ranked by quality (alpha ratio here — the
    * integer-exact t2 metric), instead of one global threshold. A fixed
    * cutoff over-prunes clean sources and under-prunes noisy ones; ranking
    * within the stratum keeps the best X% of EACH source — the per-domain
    * quantile-filter recipe of public curation pipelines. Deterministic:
    * ties broken by id; limit = floor(stratum_count · keepPpm / 10⁶) in
    * exact integer math. One shuffle on the stratum key; rank and count
    * share the partition, so the window exchange is reused. */
  def adaptiveQualityFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      strataCol: String,
      keepPpm: Long): DataFrame = {
    require(keepPpm >= 0 && keepPpm <= 1000000L, "keepPpm is parts-per-million")
    // single-sourced: the stratum filter ranks by the SAME alpha-ppm the
    // quality gate and keeper election report (alphaPpmCol)
    val score = alphaPpmCol(col(textCol))
    val part = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    docs.select(col(idCol), col(strataCol), score.as("alpha_ppm"))
      .withColumn("rank",
        row_number().over(part.orderBy(col("alpha_ppm").desc, col(idCol))))
      .withColumn("n_total", count(lit(1)).over(part))
      .filter(col("rank") <= ldiv(col("n_total") * keepPpm, lit(1000000L)))
      .drop("n_total")
  }

  /** Characteristic terms per stratum: the `k` terms most over-represented
    * in each stratum relative to the whole corpus — TF-IDF's job done in
    * exact integer arithmetic (no float log, so the result is bit-stable
    * and engine-portable). lift_ppm = floor(rate_s_ppm · 10⁶ / rate_c_ppm)
    * where rate_s/rate_c are the term's per-stratum/corpus token-rate ppms;
    * `minCount` kills one-off noise terms. The corpus-curation diagnostic:
    * a source whose top terms are "click", "subscribe" is ads; one whose
    * top terms are code identifiers is a code dump. Scale shape: two
    * chained partial-agg'd counts ((stratum, term), then (term)), a join
    * on the term key, and one window per stratum over the tiny surviving
    * term set. */
  def characteristicTerms(
      docs: DataFrame,
      strataCol: String,
      textCol: String,
      k: Int,
      minCount: Long = 2L): DataFrame = {
    val toks = docs.select(col(strataCol), explode(tokens(col(textCol))).as("term"))
    val bySrc = toks.groupBy(strataCol, "term").agg(count(lit(1)).as("cnt_s"))
    val srcTotals = bySrc.groupBy(strataCol).agg(sum(col("cnt_s")).as("n_s"))
    val byCorpus = bySrc.groupBy("term").agg(sum(col("cnt_s")).as("cnt_c"))
    val corpusTotal = byCorpus.agg(sum(col("cnt_c")).as("n_c"))
    // exact long floor-division twice (≡ DuckDB `//` at any magnitude);
    // two-step flooring is mirrored verbatim in the oracle
    val rateS = ldiv(col("cnt_s") * 1000000L, col("n_s"))
    // clamp to >= 1: at corpus scale a rare-but-concentrated term's corpus
    // rate can floor to 0 ppm — lift is then "at least cnt_s/n_s * 1e6"
    val rateC = greatest(ldiv(col("cnt_c") * 1000000L, col("n_c")), lit(1L))
    val scored = bySrc
      .filter(col("cnt_s") >= minCount)
      .join(srcTotals, strataCol)
      .join(byCorpus, "term")
      .crossJoin(broadcast(corpusTotal))
      .select(col(strataCol), col("term"), col("cnt_s"),
        ldiv(rateS * 1000000L, rateC).as("lift_ppm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("lift_ppm").desc, col("term"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Model-based quality scoring in the fastText/CCNet SHAPE: a linear
    * classifier over HASHED token features — each token hashes to one of
    * `dims` buckets, the document score is the sum of its tokens' bucket
    * weights, keep = score ≥ 0. This is how production pipelines run a
    * trained quality/toxicity/language classifier at corpus scale: hashing
    * trick, integer weights, one pass.
    *
    * `weights` (bucket → weight) is the trained model, broadcast-joined.
    * When omitted, deterministic pseudo-weights are derived from the
    * bucket's own md5 (w ∈ [−1000, 1000]) — that keeps the full scoring
    * path row-local (weight computed IN the projection, no join at all)
    * and exactly reproducible in the SQL oracle; swap in real weights for
    * a real model.
    *
    * Scale shape: explode + one partial-agg'd shuffle on the doc key; the
    * optional weight join broadcasts |dims| rows. Nothing else. */
  def hashedLinearScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int = 4096,
      weights: Option[DataFrame] = None): DataFrame = {
    require(dims > 0, "dims must be positive")
    val tokBuckets = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .select(col(idCol), (md5Hash60(col("tok")) % dims).as("b"))
    val scoredToks = weights match {
      case Some(w) => tokBuckets.join(broadcast(w), "b") // trained model path
      case None => // pseudo-weights from the bucket id: fully row-local
        tokBuckets.withColumn("w", (md5Hash60(col("b")) % 1000000L) % 2001L - 1000L)
    }
    val scores = scoredToks.groupBy(idCol).agg(sum(col("w")).as("score"))
    docs.select(col(idCol))
      .join(scores, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("score"), lit(0L)).as("score"),
        (coalesce(col("score"), lit(0L)) >= 0L).as("keep"))
  }

  /** Boilerplate-contamination scoring (the RefinedWeb/Gopher "frequent
    * n-gram" signal): an n-gram occurring in more than `dfMax` documents is
    * boilerplate (navigation chrome, license headers, template spam); each
    * document is scored by the ppm of its distinct grams that are
    * boilerplate. Output: (id, n_grams, n_boiler, boiler_ppm).
    *
    * Scale shape: gram hash-sets are computed natively at scan speed
    * (WordNgramHashSet, one pass, no shuffle), document frequencies by ONE
    * partial-agg'd shuffle on the 60-bit gram hash; the surviving
    * boilerplate set (df > dfMax) is then a `left` join marker back onto
    * the per-doc grams — left un-hinted so AQE broadcasts it when its
    * RUNTIME size fits (it is the high-df tail of the vocabulary, orders
    * of magnitude smaller than the gram space) and shuffle-joins when it
    * does not; the final score is one partial-agg'd count per doc key.
    * Nothing is ever all-pairs and no frame is re-read more than the two
    * native scans. */
  def boilerplateScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      dfMax: Long = 10L): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(wordNgramHashSet(col(textCol), n)).as("h"))
    val boiler = grams
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfMax)
      .select(col("h"), lit(1L).as("is_boiler"))
    val scored = grams
      .join(boiler, Seq("h"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_grams"),
        coalesce(sum(col("is_boiler")), lit(0L)).as("n_boiler"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          ldiv(coalesce(col("n_boiler"), lit(0L)) * 1000000L, col("n_grams")))
          .otherwise(0L).as("boiler_ppm"))
  }

  /** Intra-document repetition (the Gopher/MassiveText repetition-filter
    * family, Rae et al. 2021 §A1.1): per document, the fraction of tokens
    * covered by a word n-gram that occurs MORE THAN ONCE within the same
    * document — template spam, copy-paste stutter and decoding loops all
    * light up this signal while healthy prose stays near zero.
    *
    * `repetition_ppm = 10⁶ · |distinct covered token positions| / n_tokens`
    * (exact integer floor-division); `dup_occ` counts the duplicated gram
    * occurrences themselves. Docs shorter than n emit no grams → all-zero
    * registers (mirrored in the oracle).
    *
    * Scale shape: one row-local gram explode (native WordNgramList), one
    * count window over the HIGH-cardinality (doc, gram) key, one row-local
    * coverage explode (n rows per duplicated occurrence) into a doc-keyed
    * partial agg, one doc-keyed left merge — linear in corpus tokens, no
    * pair table, nothing corpus². */
  def intraDocRepetition(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    require(n > 0, "need n > 0")
    val byGram = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol), col("gram"))
    val dup = docs
      .select(col(idCol), posexplode(wordNgramList(col(textCol), n)).as(Seq("pos", "gram")))
      .withColumn("c", count(lit(1)).over(byGram))
      .filter(col("c") >= 2)
    val cov = dup
      .select(col(idCol), col("pos"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .groupBy(idCol)
      .agg(
        count_distinct(col("p")).as("covered_tokens"),
        count_distinct(col("pos")).as("dup_occ"))
    docs
      .select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(cov, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_occ"), lit(0L)).as("dup_occ"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        ldiv(coalesce(col("covered_tokens"), lit(0L)) * 1000000L,
          greatest(col("n_tokens"), lit(1L))).as("repetition_ppm"))
  }

  /** Corpus vocabulary statistics per stratum: token count, distinct types,
    * hapax legomena (types seen once), and the derived type-token / hapax
    * ratios (exact integer ppm). The drift signals corpus curation watches:
    * a crashing type-token ratio flags template spam, a hapax explosion
    * flags OCR noise / encoding corruption. Scale shape: explode + two
    * chained partial-agg'd shuffles, (stratum, token) then (stratum) —
    * never a distinct over the raw corpus. */
  def vocabStats(docs: DataFrame, textCol: String, strataCol: String): DataFrame =
    docs
      .select(col(strataCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(strataCol, "tok")
      .agg(count(lit(1)).as("cnt"))
      .groupBy(strataCol)
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col(strataCol), col("n_tokens"), col("n_types"), col("n_hapax"),
        // exact long floor-division ≡ DuckDB `//` at any magnitude
        when(col("n_tokens") > 0, ldiv(col("n_types") * 1000000L, col("n_tokens")))
          .otherwise(0L).as("type_token_ppm"),
        when(col("n_types") > 0, ldiv(col("n_hapax") * 1000000L, col("n_types")))
          .otherwise(0L).as("hapax_ppm"))

  /** Zipf rank-frequency fit per group: OLS slope of bitlength(freq) vs
    * bitlength(rank) over the vocabulary's rank-ordered type table — the
    * corpus-health check that the token distribution still follows a
    * power law (slope ≈ −(Zipf exponent); a truncated/templated corpus
    * flattens it). Log₂ buckets come from `length(bin(x))` — EXACT on
    * both engines (no float log; the q63 rho trick), and the regression
    * is [[Analytics.groupedOls]]'s exact integer moments with its
    * canonical one-double-division tree, so the doubles hash-match.
    *
    * Scale shape: one corpus-sized token explode partial-aggs into the
    * VOCABULARY-sized type table; the rank window and the OLS moments run
    * over vocabulary rows only. Ranks tie-break (freq desc, token asc) —
    * deterministic; the bitlength x/y are rank-stable under that order. */
  def zipfFit(docs: DataFrame, groupCols: Seq[String], textCol: String): DataFrame = {
    val g = groupCols.map(col)
    val types = docs.select(g :+ explode(tokens(col(textCol))).as("tok"): _*)
      .groupBy(g :+ col("tok"): _*).agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("freq").desc, col("tok"))
    val pts = types
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(g ++ Seq(
        length(bin(col("rank"))).cast("long").as("rb"),
        length(bin(col("freq"))).cast("long").as("fb")): _*)
    Analytics.groupedOls(pts, groupCols, "rb", "fb")
  }
}
