package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained scoring models for training-data pipelines: BM25
  * retrieval, n-gram language-model fluency, and DSIR-style importance
  * weighting. Each trains its statistics FROM the corpus (document
  * frequencies, bigram counts, feature distributions) and scores documents
  * against them — the "model-based filter" tier of a curation pipeline,
  * one level above the row-local heuristics in [[TextAnalysis]].
  *
  * All scoring is exact integer arithmetic (parts-per-million /
  * parts-per-billion with explicit floor divisions and saturation clamps)
  * — no float log, so results are bit-stable across partitionings and
  * engines, and every operator has an exact SQL oracle.
  */
object Retrieval {

  /** Exact long floor-division (Catalyst IntegralDivide, SQL `div`) —
    * matches DuckDB `//` for non-negative operands at ANY magnitude. */
  private def ldiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** Non-distinct word-bigram rows `(…, gram, w1, w2)` from a token-array
    * column: one row per adjacent token pair, multiplicity preserved
    * (unlike [[graft.functions.GraftFunctions.wordNgrams]], which is a
    * distinct set). The pair array is built by the native TokenNgramList
    * (one pass, codegen'd — the `transform`/`struct` HOF spelling is
    * interpreted per token); w1/w2 split back out via `substring_index`,
    * which is exact because tokens cannot contain spaces. Row-local
    * explode — no shuffle; sub-bigram docs emit no rows. */
  private def explodeBigrams(df: DataFrame, keep: Seq[Column], toks: Column): DataFrame = {
    val kept = df.select(keep :+ explode(tokenNgramList(toks, 2)).as("gram"): _*)
    val names = kept.columns.map(col(_))
    kept.select(names ++ Seq(
      substring_index(col("gram"), " ", 1).as("w1"),
      substring_index(col("gram"), " ", -1).as("w2")): _*)
  }

  /** BM25 top-`k` retrieval for a fixed bag of query terms — the lexical
    * search / relevance-ranking operator (used in curation for targeted
    * corpus slicing, e.g. "pull the k docs most about X").
    *
    * Integer-exact BM25 (k1 = 1.2, b = 0.75), derived so every step is a
    * ratio of BIGINTs:
    *  - `idf_ppm = least(⌊(2(N−df)+1)·10⁶ / (2df+1)⌋, 2·10⁷)` — exactly
    *    the argument of the Robertson idf `ln((N−df+0.5)/(df+0.5))` as a
    *    rational, with the log replaced by a 20× saturation clamp (the
    *    BM25+ "cap rare-term idf" move in integer space; keeps the
    *    idf·tf product inside int64 for corpora up to ~10¹⁸ docs).
    *  - `tfsat_ppm = ⌊44·tf·avgdl·10⁶ / (20·tf·avgdl + 6·avgdl + 18·dl)⌋`
    *    ≡ `tf(k1+1)/(tf + k1(1−b+b·dl/avgdl))` with num/den scaled by
    *    20·avgdl; `avgdl = ⌊Σdl/N⌋` (floored integer, mirrored in the
    *    oracle).
    *  - per-term contribution `⌊idf_ppm·tfsat_ppm/10⁶⌋`, doc score = Σ.
    *
    * Scale shape: the explode keeps ONLY query-term tokens (the filter is
    * inside the scan projection), so the shuffled tf frame is ∝ matching
    * tokens, never the corpus; term df and corpus stats are 1-to-|terms|
    * rows, broadcast; the final top-k is TakeOrdered (no global sort). */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty && k > 0, "need at least one query term and k > 0")
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("t"))
      .select(col(idCol), col("t"), size(col("t")).cast("long").as("dl"))
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("total_tokens"))
    val tf = base
      .select(col(idCol), col("dl"), explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = ldiv(col("total_tokens"), col("n_docs"))
    val idfPpm = least(
      ldiv((lit(2L) * (col("n_docs") - col("df")) + 1L) * 1000000L, lit(2L) * col("df") + 1L),
      lit(20000000L))
    val tfsatPpm = ldiv(
      lit(44L) * col("tf") * avgdl * 1000000L,
      lit(20L) * col("tf") * avgdl + lit(6L) * avgdl + lit(18L) * col("dl"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), ldiv(idfPpm * tfsatPpm, lit(1000000L)).as("contrib"))
      .groupBy(idCol)
      .agg(sum(col("contrib")).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Positional-index phrase search: documents containing `phrase` as
    * ADJACENT tokens, with the occurrence count — the exact-match
    * retrieval primitive a gram-set index (q38's AND-search) cannot
    * answer, because set membership loses adjacency.
    *
    * Shape: postings (id, pos, term) come from one `posexplode` whose
    * filter keeps ONLY the phrase's terms — the shuffled frame is ∝
    * matching tokens, never the corpus (the same query-term-only rule as
    * [[bm25TopK]]). Word i's postings shift to `pos − i`, so a full
    * phrase occurrence is an equi-join of all word frames on (id, pos):
    * n−1 co-keyed joins of query-term-sized inputs, no window, no
    * adjacency self-join of the whole corpus.
    *
    * Returns (idCol, n_hits) for documents with ≥1 occurrence. */
  def phraseSearch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two words")
    val postings = docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
      .filter(col("term").isin(phrase.distinct: _*))
    val frames = phrase.zipWithIndex.map { case (w, i) =>
      postings.filter(col("term") === w)
        .select(col(idCol), (col("pos") - i).as("p"))
    }
    frames.reduce((a, b) => a.join(b, Seq(idCol, "p")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of ranked retrieval
    * lists — the standard hybrid-search combiner (lexical BM25 + embedding
    * ANN, or any mix of rankers): each list contributes
    * `⌊10⁶ / (c + rank)⌋` per document, fused score = Σ over the lists
    * containing it. Integer-exact (`c` = 60, the canonical constant), so
    * fusion is deterministic and oracle-able; `n_lists` reports how many
    * rankers surfaced the document.
    *
    * Scale shape: the inputs are ALREADY top-k lists (a few hundred rows
    * each, whatever corpus they came from), so the union + groupBy is
    * driver-trivial; the heavy lifting stays inside the upstream rankers,
    * which keep their own bounded shapes. */
  def rrfFuse(
      lists: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k: Int,
      c: Int = 60): DataFrame = {
    require(lists.nonEmpty && k > 0, "need at least one ranked list and k > 0")
    val union = lists
      .map(_.select(col(idCol), col(rankCol).cast("long").as("_rank")))
      .reduce(_ unionByName _)
    union
      .select(col(idCol),
        ldiv(lit(1000000L), lit(c.toLong) + col("_rank")).as("contrib"))
      .groupBy(idCol)
      .agg(sum(col("contrib")).as("rrf_ppm"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_ppm").desc, col(idCol))
      .limit(k)
  }

  /** Bigram language-model fluency scoring — the KenLM-style "does this
    * read like language" quality filter, log-free: train add-one-smoothed
    * bigram probabilities on the corpus itself, then score each document
    * by its MEAN bigram probability in ppm
    * (`p_ppm(w1,w2) = ⌊(c(w1,w2)+1)·10⁶ / (c(w1·)+V)⌋`, where `c(w1·)` is
    * the bigram-prefix count and V the corpus vocabulary size). Template
    * spam and highly repetitive text score HIGH (their bigrams dominate
    * the corpus), word salad scores LOW — both tails are curation signals.
    * Documents with fewer than 2 tokens score 0 over 0 bigrams.
    *
    * Scale shape: the model is two chained partial-agg'd shuffles
    * ((w1,w2) counts, then w1 prefix sums); scoring pre-aggregates each
    * document's bigrams to `(id, w1, w2, cnt)` so the model join moves
    * distinct-bigrams-per-doc rows, not tokens. The prefix join on `w1`
    * is the one skew-prone edge (stopword prefixes) — AQE's runtime skew
    * split handles it, exactly like any hot-key fact join. */
  def bigramLmFluency(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramLmScore(docs, docs, idCol, textCol, "fluency_ppm")

  /** Score `docs` under a bigram LM trained on `trainDocs` (add-one
    * smoothed, integer ppm — same algebra as [[bigramLmFluency]], which is
    * the self-trained special case). Bigrams unseen in training score
    * `1·10⁶ ÷ (c1 + V)` via the LEFT joins (coalesce-to-0 counts) — for a
    * self-trained LM every scored bigram exists in training, so the left
    * joins degenerate to the old inner joins bit-for-bit.
    *
    * Scale shape: the LM is two chained partial-agg'd shuffles over the
    * TRAINING corpus only; scoring joins the scored docs' distinct-bigram
    * frame (pre-aggregated per doc) against it; V is a 1-row broadcast. */
  def bigramLmScore(
      docs: DataFrame,
      trainDocs: DataFrame,
      idCol: String,
      textCol: String,
      scoreName: String,
      partitionCols: Seq[String] = Nil): DataFrame = {
    // partitionCols scope the LM: counts, prefix sums and the vocabulary
    // are keyed per partition (e.g. per language — the CCNet shape), and a
    // doc whose partition has NO training rows scores 0 via the final left
    // join (its bigrams drop at the inner vocab join). Nil reproduces the
    // single-LM behavior byte-identically.
    val p = partitionCols.map(col)
    val docBi = explodeBigrams(docs, col(idCol) +: p, tokens(col(textCol)))
      .groupBy((col(idCol) +: p) ++ Seq(col("w1"), col("w2")): _*)
      .agg(count(lit(1)).as("cnt"))
    val c12 = explodeBigrams(trainDocs, p, tokens(col(textCol)))
      .groupBy(p ++ Seq(col("w1"), col("w2")): _*).agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(p :+ col("w1"): _*).agg(sum(col("c12")).as("c1"))
    val vocabToks = trainDocs
      .select(p :+ explode(tokens(col(textCol))).as("tok"): _*)
    val vocab =
      if (partitionCols.isEmpty) vocabToks.agg(count_distinct(col("tok")).as("v"))
      else vocabToks.groupBy(p: _*).agg(count_distinct(col("tok")).as("v"))
    val withVocab = {
      val base = docBi
        .join(c12, partitionCols ++ Seq("w1", "w2"), "left")
        .join(c1, partitionCols :+ "w1", "left")
      if (partitionCols.isEmpty) base.crossJoin(broadcast(vocab))
      else base.join(broadcast(vocab), partitionCols)
    }
    val scored = withVocab
      .select(col(idCol), col("cnt"),
        ldiv((coalesce(col("c12"), lit(0L)) + 1L) * 1000000L,
          coalesce(col("c1"), lit(0L)) + col("v")).as("p_ppm"))
      .groupBy(idCol)
      .agg(sum(col("cnt") * col("p_ppm")).as("sp"), sum(col("cnt")).as("n_bigrams"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0L, ldiv(col("sp"), col("n_bigrams")))
          .otherwise(0L).as(scoreName))
  }

  /** Kneser-Ney-smoothed bigram fluency — the published interpolated
    * absolute-discounting LM (Kneser & Ney 1995) in exact integer ppm,
    * one tier above [[bigramLmFluency]]'s add-one smoothing: instead of
    * flattening all mass uniformly, probability discounted from observed
    * bigrams is redistributed by CONTINUATION probability (how many
    * distinct contexts a word follows), which is what separates versatile
    * words from words frozen inside templates — a sharper template-spam
    * signal than add-one.
    *
    * Discount d = 3/4 carried as a rational (×4 numerators, never a
    * float):
    * `p_ppm(w1,w2) = ⌊(4·c12 − 3)·10⁶ / (4·c1)⌋
    *   + ⌊⌊3·n1pre(w1)·10⁶ / (4·c1)⌋ · ⌊n1suf(w2)·10⁶ / T⌋ / 10⁶⌋`
    * where `n1pre(w1)` = distinct continuations of w1, `n1suf(w2)` =
    * distinct contexts preceding w2, `T` = distinct bigram types. Each
    * division floors identically in both engines (staged-division
    * convention, q144); doc score is the count-weighted mean ppm, docs
    * with <2 tokens score 0. Self-trained, so every scored bigram exists
    * in the model (c12 ≥ 1 ⇒ the first numerator ≥ 10⁶ > 0).
    *
    * Scale shape: identical to [[bigramLmScore]] — the model is
    * vocabulary-sized partial-agg'd shuffles; the type table `c12` feeds
    * four readers (model join, prefix stats, suffix stats, T) so it is
    * checkpointed once; T is a 1-row broadcast. Bound: 4·c12·10⁶ must
    * stay under 2⁶³, i.e. any single bigram below ~2.3·10¹² occurrences. */
  def knBigramFluency(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // docBi feeds BOTH the model chain and the scoring join — checkpoint
    // it so the corpus explode+shuffle runs once, and checkpoint the
    // (vocabulary-sized) c12 since four readers derive from it
    val docBi = explodeBigrams(docs, Seq(col(idCol)), tokens(col(textCol)))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val c12 = docBi.groupBy("w1", "w2").agg(sum(col("cnt")).as("c12"))
      .localCheckpoint(true)
    val c1n1 = c12.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1pre"))
    val n1suf = c12.groupBy("w2").agg(count(lit(1)).as("n1suf"))
    val tTypes = c12.agg(count(lit(1)).as("t_types"))
    val scored = docBi
      .join(c12, Seq("w1", "w2"))
      .join(c1n1, Seq("w1"))
      .join(n1suf, Seq("w2"))
      .crossJoin(broadcast(tTypes))
      .select(col(idCol), col("cnt"),
        (ldiv((lit(4L) * col("c12") - 3L) * 1000000L, lit(4L) * col("c1")) +
          ldiv(
            ldiv(lit(3L) * col("n1pre") * 1000000L, lit(4L) * col("c1")) *
              ldiv(col("n1suf") * 1000000L, col("t_types")),
            lit(1000000L))).as("p_ppm"))
      .groupBy(idCol)
      .agg(sum(col("cnt") * col("p_ppm")).as("sp"),
        sum(col("cnt")).as("n_bigrams"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0L,
          ldiv(col("sp"), col("n_bigrams"))).otherwise(0L).as("kn_ppm"))
  }

  /** Moore-Lewis contrastive data selection (Moore & Lewis 2010, the
    * published cross-entropy-difference recipe, integer form): score every
    * document under a TARGET-domain LM and under the GENERAL-corpus LM;
    * `ml_ppm = target − general` ranks "reads like the target domain,
    * unlike the average" — the classic complement to hashed-feature DSIR
    * (s6). Both LMs share the scale shape of [[bigramLmScore]]; the target
    * LM trains on the (small) target slice only. */
  def mooreLewis(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: org.apache.spark.sql.Column): DataFrame = {
    val target = bigramLmScore(docs, docs.filter(isTarget), idCol, textCol, "target_ppm")
      .select(col(idCol), col("target_ppm"))
    val general = bigramLmScore(docs, docs, idCol, textCol, "general_ppm")
      .select(col(idCol), col("general_ppm"))
    target.join(general, Seq(idCol))
      .withColumn("ml_ppm", col("target_ppm") - col("general_ppm"))
  }

  /** DSIR-shaped importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling" — the public recipe):
    * hash every word bigram into `buckets` feature buckets, estimate the
    * feature distribution of the TARGET slice (`isTarget`) and of the raw
    * corpus, and score each document by the mean target/raw probability
    * ratio of its features — high scores read "distributionally like the
    * target". The log-sum of ratios becomes a mean of integer ratios:
    *  - per bucket, `p_ppb = ⌊(cnt+1)·10⁹ / (tot+B)⌋` (add-one smoothing;
    *    ppb keeps rare-bucket precision; int64-safe while a single bucket
    *    stays under ~9·10⁹ occurrences — at B=8192 that is a ~10¹⁴-token
    *    corpus),
    *  - `w_ppm = least(⌊p_t_ppb·10⁶ / max(p_r_ppb,1)⌋, 10⁹)` — the ratio,
    *    saturated at 1000× so one exotic bucket cannot dominate the mean,
    *  - doc `importance_ppm = ⌊Σ cnt·w_ppm / Σ cnt⌋` (count-weighted mean).
    *
    * Scale shape: features pre-aggregate per (doc, bucket); bucket stats
    * are ONE partial-agg'd shuffle on ≤ `buckets` keys; the weight table
    * is `buckets` rows, broadcast back — the corpus itself is never
    * joined fact-to-fact. */
  /** Balanced Rocchio (class-weighted centroid-difference) classifier
    * over hashed bigram features — a TRAINED linear model entirely
    * in-engine, exact and oracle-able (the trainable tier above t12's
    * fixed-weight hashed score). One-shot, order-free training:
    * `w(b) = Σ_d y_d·m_d·cnt(d,b)` with class balance `m_d = n_neg` for
    * positives and `n_pos` for negatives (both classes contribute equal
    * total mass, so a 5%-positive corpus cannot collapse to the majority
    * class); a doc's margin is the integer dot `Σ_b cnt·w`, prediction is
    * its sign. Chosen over the batch perceptron after measuring: the
    * all-misclassified batch update OSCILLATES (accuracy peaked then fell
    * across rounds on this corpus) while the balanced one-shot difference
    * is monotone in bucket count — probe, don't assume, per CLAUDE.md.
    *
    * All integers: counts and weights are longs, margins ride
    * DECIMAL(38,0) (mirrored as HUGEINT) and surface as BIGINT — loud
    * ANSI overflow rather than silent wrap. Ties (margin = 0) predict −1
    * in both engines.
    *
    * Scale shape: the feature frame is one (doc, bucket)-keyed partial
    * agg, checkpointed for its two readers; training is one bucket-keyed
    * partial agg to a ≤`buckets`-row weight table; scoring broadcasts it
    * — never an all-pairs, never a row sort. */
  def rocchioScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isPositive: Column,
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val y = when(isPositive, 1L).otherwise(-1L)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val fe = explodeBigrams(docs, Seq(col(idCol), y.as("y")), tokens(col(textCol)))
      .select(col(idCol), col("y"), (md5Hash60(col("gram")) % buckets).as("b"))
      .groupBy(col(idCol), col("y"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val classes = docs.agg(
      sum(when(isPositive, 1L).otherwise(0L)).as("n_pos"),
      sum(when(isPositive, 0L).otherwise(1L)).as("n_neg"))
    val w = fe.crossJoin(broadcast(classes))
      .select(col("b"),
        (col("y") * when(col("y") === 1L, col("n_neg")).otherwise(col("n_pos"))
          * col("cnt")).as("c"))
      .groupBy("b").agg(sum(col("c")).as("w"))
    val mf = fe.join(broadcast(w), "b")
      .groupBy(col(idCol), col("y"))
      .agg(sum(dec(col("cnt")) * col("w")).as("m"))
    docs.select(col(idCol), y.as("label"))
      .join(mf.select(col(idCol), col("m")), Seq(idCol), "left")
      .select(col(idCol), col("label"),
        coalesce(col("m"), lit(0L).cast("decimal(38,0)")).cast("long").as("margin"),
        when(coalesce(col("m"), lit(0L).cast("decimal(38,0)")) > 0L, 1L)
          .otherwise(-1L).as("pred"))
      .withColumn("correct", col("label") === col("pred"))
  }

  def dsirImportance(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 8192): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val bigrams = explodeBigrams(
      docs, Seq(col(idCol), isTarget.as("is_t")), tokens(col(textCol)))
    val feats = bigrams
      .select(col(idCol), col("is_t"),
        (md5Hash60(col("gram")) % buckets).as("b"))
      .groupBy(col(idCol), col("is_t"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val bucketStats = feats.groupBy("b").agg(
      sum(when(col("is_t"), col("cnt")).otherwise(0L)).as("cnt_t"),
      sum(col("cnt")).as("cnt_r"))
    val tots = bucketStats.agg(
      coalesce(sum(col("cnt_t")), lit(0L)).as("tot_t"),
      coalesce(sum(col("cnt_r")), lit(0L)).as("tot_r"))
    val pT = ldiv((col("cnt_t") + 1L) * 1000000000L, col("tot_t") + buckets.toLong)
    val pR = ldiv((col("cnt_r") + 1L) * 1000000000L, col("tot_r") + buckets.toLong)
    val weights = bucketStats
      .crossJoin(broadcast(tots))
      .select(col("b"),
        least(ldiv(pT * 1000000L, greatest(pR, lit(1L))), lit(1000000000L)).as("w_ppm"))
    val scored = feats
      .join(broadcast(weights), "b")
      .groupBy(idCol)
      .agg(sum(col("cnt") * col("w_ppm")).as("sw"), sum(col("cnt")).as("n_feats"))
    docs.select(col(idCol), isTarget.as("is_target"))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), col("is_target"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        when(coalesce(col("n_feats"), lit(0L)) > 0L, ldiv(col("sw"), col("n_feats")))
          .otherwise(0L).as("importance_ppm"))
  }
}
