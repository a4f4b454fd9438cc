package graft.operators

import scala.collection.mutable.ArrayBuffer

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding merge learning over a corpus — the tokenizer-training
  * primitive of an LLM data pipeline (Sennrich et al., ACL'16: BPE is
  * trained on the WORD-TYPE frequency table, not the running text).
  *
  * Exactness / oracle parity:
  *  - a word's symbol sequence is one delimited string `<s1><s2>…<sN>`;
  *    applying a merge (a,b) is the native string `replace(seq,
  *    '<a><b>', '<ab>')` — both engines scan left-to-right over
  *    non-overlapping occurrences, which IS greedy BPE merge application
  *    (`aaa` + merge (a,a) → `<aa><a>`), with zero HOFs in the loop;
  *  - the wrappers `<`/`>` cannot collide with symbol text because the
  *    type table keeps only purely-alphabetic words (`^[a-z]+$`, length
  *    ≤ maxWordLen) — a DEFINITION mirrored verbatim in the oracle;
  *  - pair weights count EVERY adjacent position (overlapping pairs
  *    included: `aaa` contributes (a,a) twice) — the standard BPE count,
  *    identical on both sides by construction;
  *  - the winning pair per round is the total order (weight DESC, left,
  *    right) — deterministic under ties.
  *
  * Scale shape: ONE corpus-sized token explode + groupBy builds the type
  * table; every round after that runs on the VOCABULARY-sized frame
  * (corpus-size-independent — the 100 TB corpus and the 100 GB corpus pay
  * the same per-round cost once types are aggregated). Per round: one
  * row-local pair explode + partial-agg'd count, one 1-row argmax collect
  * (bounded, the s15 greedy pattern), one row-local replace. The type
  * frame is checkpointed per round so round r+1 never replays round r.
  */
object Bpe {

  /** (seq, cnt) word-type table: `<c><h><a><r>`-delimited char symbols
    * weighted by corpus frequency. */
  // NO Par.fanOut on the corpus pass: measured 1.55→1.76 s at sf0.1 —
  // the tokenize+filter is cheap and the added exchange + 32-task
  // scheduling taxes the many small type-table round jobs that follow
  // (Par's "narrow or tiny frames lose" caveat)
  def wordTypes(docs: DataFrame, maxWordLen: Int): DataFrame =
    docs.select(explode(GraftFunctions.tokens(col("text"))).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("word"), "(.)", "<$1>").as("seq"), col("cnt"))

  private val mergeSchema = StructType(Seq(
    StructField("round", LongType, nullable = false),
    StructField("left_sym", StringType, nullable = false),
    StructField("right_sym", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("wt", LongType, nullable = false)))

  /** Run `rounds` merge rounds; returns (merge table, initial type table,
    * final type table). The merge table is driver-built from `rounds`
    * 1-row argmax collects (bounded); the type tables stay distributed
    * throughout (the initial one checkpointed — reading it costs no
    * second corpus pass). */
  def learn(
      spark: SparkSession,
      docs: DataFrame,
      rounds: Int,
      maxWordLen: Int = 16): (DataFrame, DataFrame, DataFrame) = {
    require(rounds >= 1 && rounds <= 64, "rounds must be in [1, 64]")
    val types0 = wordTypes(docs, maxWordLen).localCheckpoint(true)
    var types = types0
    val merges = ArrayBuffer.empty[Row]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val syms = types.select(
        split(expr("substring(seq, 2, length(seq) - 2)"), "><").as("sym"),
        col("cnt"))
      val best = syms
        .select(col("sym"), col("cnt"), posexplode(col("sym")).as(Seq("x", "a")))
        .filter(col("x") + lit(2) <= size(col("sym")))
        .select(col("a"), element_at(col("sym"), col("x") + lit(2)).as("b"), col("cnt"))
        .groupBy("a", "b").agg(sum(col("cnt")).as("wt"))
        .orderBy(col("wt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, w) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Row(r.toLong, a, b, a + b, w)
        types = types
          .withColumn("seq", call_function("replace", col("seq"),
            lit(s"<$a><$b>"), lit(s"<$a$b>")))
          .localCheckpoint(true)
        r += 1
      }
    }
    (spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), mergeSchema), types0, types)
  }

  /** Apply an ALREADY-LEARNED merge table (t36's output shape) to a fresh
    * type table, in round order — the tokenizer-drift path: no retrain,
    * the increment pays k row-local replaces. The merge table is k-row by
    * construction (one per round) so the collect is bounded. */
  def applyMerges(types: DataFrame, merges: DataFrame): DataFrame =
    merges.orderBy("round").collect().foldLeft(types) { (t, m) =>
      val (a, b) = (m.getString(1), m.getString(2))
      t.withColumn("seq", call_function("replace", col("seq"),
        lit(s"<$a><$b>"), lit(s"<$a$b>")))
    }

  /** Document-level BPE encoding — the artifact a training pipeline
    * actually ships: `(doc_id, n_words, n_tokens, token_ids)` per document
    * with token ids in reading order (the space-joined id string keeps the
    * result hash-comparable across engines; collect_list alone would be
    * order-nondeterministic — the d23 array_sort(struct) rule).
    *
    * Token-id assignment is part of the DEFINITION (mirrored in the
    * oracle): the vocabulary is the distinct symbol set of the LEARNED
    * final type table `typesFinal`, ids = 1-based rank in lexicographic
    * symbol order. Words outside the type-table definition
    * (non-`^[a-z]+$`, or longer than `maxWordLen`) are dropped, and docs
    * with zero qualifying words do not appear — encoding covers exactly
    * the universe the tokenizer was trained on. When docs ⊆ the training
    * corpus (same filter, same merges), every final symbol is in the
    * vocabulary by construction, so the inner vocab join is lossless.
    *
    * Scale shape: the corpus pays one tokenize-explode; merge replay runs
    * on the DISTINCT-WORD table (vocabulary-sized, k row-local replaces —
    * never per token), the word → id-array map is vocabulary-sized (AQE
    * broadcasts it into the word join at runtime), and the per-doc rollup
    * is one doc-keyed partial-agg'd shuffle. */
  def encodeDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: DataFrame,
      typesFinal: DataFrame,
      maxWordLen: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def symsOf(c: String) = split(expr(s"substring($c, 2, length($c) - 2)"), "><")
    val dw = docs
      .select(col(idCol), posexplode(GraftFunctions.tokens(col(textCol))).as(Seq("pos", "word")))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")) <= maxWordLen)
    val w0 = dw.select("word").distinct()
      .withColumn("seq", regexp_replace(col("word"), "(.)", "<$1>"))
    val wf = applyMerges(w0, merges)
    // vocab-sized global window: ids are dense ranks over the sorted
    // distinct symbol set of the trained vocabulary
    val vocab = typesFinal.select(explode(symsOf("seq")).as("sym")).distinct()
      .withColumn("tid", row_number().over(Window.orderBy("sym")))
    // per-word id string and token count are VOCABULARY-sized precomputes
    // (guide §2.3: the corpus-side rollup then never pays a per-token HOF —
    // the old shape ran flatten(transform) + a per-token cast-to-string
    // transform over every document's nested id arrays; r15)
    val wids = wf.select(col("word"), posexplode(symsOf("seq")).as(Seq("spos", "sym")))
      .join(vocab, "sym")
      .groupBy("word")
      .agg(array_sort(collect_list(struct(col("spos"), col("tid")))).as("st"))
      .select(col("word"),
        expr("array_join(transform(st, x -> cast(x.tid as string)), ' ')").as("tid_str"),
        size(col("st")).cast("long").as("n_syms"))
    dw.join(wids, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_tokens"),
        array_sort(collect_list(struct(col("pos"), col("tid_str")))).as("pt"))
      .select(col(idCol), col("n_words"), col("n_tokens"),
        array_join(expr("transform(pt, x -> x.tid_str)"), " ").as("token_ids"))
  }

  /** One-row corpus compression audit of the final type table vs the
    * character baseline: Σ cnt·|symbols| before and after the merges and
    * the ratio in ppm (floor-div rule). */
  def compressionAudit(types0: DataFrame, typesFinal: DataFrame): DataFrame = {
    def symLen(df: DataFrame) = df.select(
      col("cnt"),
      size(split(expr("substring(seq, 2, length(seq) - 2)"), "><"))
        .cast("long").as("ns"))
    val base = symLen(types0).agg(
      count(lit(1)).as("n_types"),
      sum(col("cnt")).as("n_tokens"),
      sum(col("cnt") * col("ns")).as("base_syms"))
    val fin = symLen(typesFinal).agg(sum(col("cnt") * col("ns")).as("merged_syms"))
    base.crossJoin(fin).select(
      col("n_types"), col("n_tokens"), col("base_syms"), col("merged_syms"),
      call_function("div", col("merged_syms") * lit(1000000L), col("base_syms"))
        .as("compression_ppm"))
  }
}
