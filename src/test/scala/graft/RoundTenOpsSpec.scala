package graft

import graft.operators.{Analytics, Bpe, Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Guards for the round-10 operator changes: document-level BPE encoding
  * (hand-computed streams + the symbol-mass identity), the weightedMedian
  * register rewrite's output contract, incrementalExact's re-ingested-id
  * handling, and the zero-variance spectral degenerate cases. */
class RoundTenOpsSpec extends SparkSpec {
  import spark.implicits._

  "Bpe.encodeDocs" should "emit token ids in reading order with lexicographic vocab ranks" in {
    // corpus: "aaa" x2, "ab" x3 (the BpeSpec training example) → merges
    // (a,a) then (a,b); final types <aa><a>, <ab>; vocab sorted:
    // a→1, aa→2, ab→3
    val docs = (Seq((1L, "aaa ab"), (2L, "ab aaa"), (3L, "ab")) ++
      Seq((4L, "aaa"), (5L, "ab"))).toDF("doc_id", "text")
    // word counts: aaa in docs 1,2,4 = 3; ab in 1,2,3,5 = 4 →
    // pair weights r1: (a,a)=6, (a,b)=4 → merge (a,a); r2: (aa,a)=3,
    // (a,b)=4 → merge (a,b)
    val (merges, _, fin) = Bpe.learn(spark, docs, rounds = 2)
    val enc = Bpe.encodeDocs(docs, "doc_id", "text", merges, fin)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    enc shouldBe Array(
      (1L, 2L, 3L, "2 1 3"), // aaa→[aa,a]=2 1, ab→[ab]=3
      (2L, 2L, 3L, "3 2 1"), // reading order, not id-sorted
      (3L, 1L, 1L, "3"),
      (4L, 1L, 2L, "2 1"),
      (5L, 1L, 1L, "3"))
  }

  it should "satisfy the symbol-mass identity: Σ n_tokens ≡ compressionAudit merged_syms" in {
    // every corpus word instance contributes its type's final symbol count,
    // so encoding the training corpus must total exactly the audit's
    // merged symbol mass
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta gamma gamma beta"),
      (3L, "alpha delta")).toDF("doc_id", "text")
    val (merges, t0, fin) = Bpe.learn(spark, docs, rounds = 4)
    val mass = Bpe.compressionAudit(t0, fin).collect()(0).getLong(3)
    val total = Bpe.encodeDocs(docs, "doc_id", "text", merges, fin)
      .agg(sum("n_tokens")).as[Long].head()
    total shouldBe mass
  }

  it should "drop non-qualifying words and docs with no qualifying word" in {
    // tokenization lowercases, so "ZZ" qualifies as "zz"; "123"/"???" never do
    val docs = Seq((1L, "ok 123 ZZ"), (2L, "???"), (3L, "ok ok")).toDF("doc_id", "text")
    val (merges, _, fin) = Bpe.learn(spark, docs, rounds = 1)
    val enc = Bpe.encodeDocs(docs, "doc_id", "text", merges, fin)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    enc.map(_._1) shouldBe Array(1L, 3L) // doc 2 has no qualifying word
    enc shouldBe Array((1L, 2L), (3L, 2L))
  }

  "Analytics.weightedMedian (register form)" should "still count RAW rows in n and keep total_weight" in {
    // duplicate values collapse into one register row — n must stay the
    // raw row count, total_weight the weight sum (the pre-rewrite contract)
    val df = Seq(("g", 5L, 2L), ("g", 5L, 3L), ("g", 7L, 1L), ("h", 1L, 4L))
      .toDF("k", "v", "wq")
    val got = Analytics.weightedMedian(df, Seq("k"), "v", "wq")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got shouldBe Array(("g", 5L, 3L, 6L), ("h", 1L, 1L, 4L))
  }

  "Dedup.incrementalExact" should "count a re-ingested identical (id, content) once" in {
    val history = Seq((1L, "same text"), (2L, "other")).toDF("id", "text")
    val hashes = history.select(col("id"),
      md5(graft.functions.GraftFunctions.normalizeText(col("text"))).as("content_hash"))
    // the re-crawl re-ships doc 1 unchanged and adds doc 3 with the same content
    val fresh = Seq((1L, "same text"), (3L, "same text")).toDF("id", "text")
    val inc = Dedup.incrementalExact(hashes, fresh, "id", "text").collect()
    inc should have size 1
    val r = inc(0)
    // members {1, 3}: the history copy of (1, hash) must not double-count
    (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((1L, 2L, 2L))
  }

  "prefixFilterJaccard maxGramDf" should "be a subset of lossless, and lossless when evidence is rare" in {
    // docs 1/2 are near-dups sharing rare grams (df 2); docs 3..8 share a
    // common boilerplate phrase (df 6) that makes them pairwise similar
    val boiler = "the same boiler plate phrase repeated"
    val docs = (Seq(
      1L -> "unique alpha beta gamma delta epsilon zeta",
      2L -> "unique alpha beta gamma delta epsilon eta") ++
      (3L to 8L).map(i => i -> s"$boiler tail$i")).toDF("doc_id", "text")
    def pairs(cap: Long) = Dedup.prefixFilterJaccard(docs, "doc_id", "text",
        tNum = 1L, tDen = 2L, maxGramDf = cap)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lossless = pairs(Long.MaxValue)
    lossless should contain ((1L, 2L))
    lossless.count { case (a, b) => a >= 3L && b >= 3L } should be > 0
    val capped = pairs(3L)
    capped shouldBe a[Set[_]]
    capped.subsetOf(lossless) shouldBe true
    capped should contain ((1L, 2L)) // rare-evidence pair survives any cap ≥ its df
    // the boilerplate-only pairs need df-6 evidence → dropped at cap 3
    capped.count { case (a, b) => a >= 3L && b >= 3L } shouldBe 0
  }

  "varianceConcentrationPpm" should "survive a zero-variance corpus (trace = 0 → 0 ppm)" in {
    val vecs = Seq((1L, Seq(0.5f, -0.25f, 1.0f)), (2L, Seq(0.5f, -0.25f, 1.0f)),
      (3L, Seq(0.5f, -0.25f, 1.0f))).toDF("vec_id", "embedding")
    val r = Similarity.varianceConcentrationPpm(vecs, "vec_id", "embedding").collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((3L, 0L, 0L))
  }

  "principalDirectionPpm" should "emit 0 loadings on a zero-covariance corpus" in {
    val vecs = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val loads = Similarity.principalDirectionPpm(vecs, "vec_id", "embedding")
      .collect().map(_.getLong(1))
    loads shouldBe Array(0L, 0L)
  }

  "TextAnalysis.intraDocRepetition" should "count covered positions, not occurrences" in {
    // doc 1: "a b c a b c d" — 3-gram "a b c" at pos 0 and 3 → dup_occ 2,
    // covered positions {0..5} = 6 of 7 tokens; overlapping duplicate
    // occurrences must NOT double-count positions.
    // doc 2: all-distinct grams → zero registers. doc 3: shorter than n.
    val docs = Seq((1L, "a b c a b c d"), (2L, "p q r s t"), (3L, "x y"))
      .toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .intraDocRepetition(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    r shouldBe Array(
      (1L, 7L, 2L, 6L, 6000000L / 7L),
      (2L, 5L, 0L, 0L, 0L),
      (3L, 2L, 0L, 0L, 0L))
  }

  it should "cover the whole doc when one token repeats throughout" in {
    val docs = Seq((1L, "z z z z")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .intraDocRepetition(docs, "doc_id", "text", n = 2)
      .collect()(0)
    // grams "z z" at 0,1,2 all duplicated → covered {0,1,2,3} = 4/4
    (r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe ((3L, 4L, 1000000L))
  }

  "Dedup.splitLeakage" should "orient pairs eval-side and ignore same-side pairs" in {
    import org.apache.spark.sql.Column
    val pairs = Seq(
      (1L, 2L),  // train-train → no leak
      (3L, 4L),  // train-val   → val doc 4 leaks
      (5L, 4L),  // train-val   → val doc 4 leaks again (n_train_dups 2)
      (6L, 7L),  // val-test    → NOT train leakage
      (8L, 9L))  // train-test  → test doc 9 leaks
      .toDF("id_a", "id_b")
    val split: Column => Column = id =>
      when(id.isin(1L, 2L, 3L, 5L, 8L), "train")
        .when(id.isin(4L, 6L), "val").otherwise("test")
    val r = Dedup.splitLeakage(pairs, "doc_id", split)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    r shouldBe Array((4L, "val", 2L), (9L, "test", 1L))
  }

  "Analytics.weightedMedian" should "match the brute-force median across bucket boundaries and negative values" in {
    // values straddle the 4096 bucket width and zero (shiftright must act
    // as FLOOR division; a truncating div folds buckets -0 and 0)
    val rows = Seq(
      ("a", -5000L, 3L), ("a", -1L, 2L), ("a", 4095L, 1L), ("a", 4096L, 5L),
      ("a", 9000L, 2L),
      ("b", 4095L, 1L), ("b", 4096L, 1L),
      ("c", 7L, 5L))
    val df = rows.toDF("k", "v", "w")
    def brute(k: String): Long = {
      val vs = rows.filter(_._1 == k).sortBy(_._2)
      val tot = vs.map(_._3).sum
      var cum = 0L
      vs.find { case (_, _, w) => cum += w; 2 * cum >= tot }.get._2
    }
    val r = Analytics.weightedMedian(df, Seq("k"), "v", "w")
      .orderBy("k").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    r shouldBe Array(
      ("a", brute("a"), 5L, 13L),
      ("b", brute("b"), 2L, 2L),
      ("c", brute("c"), 1L, 5L))
    brute("a") shouldBe 4096L // non-vacuous: elected in a LATER bucket than
    // the first passing value's neighborhood (cum crosses half inside b=1)
    brute("b") shouldBe 4095L // tie at half elects the SMALLER value
  }

  "Analytics.weightedQuantiles" should "match brute force for every rank in one pass" in {
    val rows = Seq(
      ("a", -5000L, 3L), ("a", -1L, 2L), ("a", 4095L, 1L), ("a", 4096L, 5L),
      ("a", 9000L, 2L), ("b", 10L, 1L), ("b", 20L, 1L), ("b", 30L, 1L))
    val qs = Seq(("p00", 0L, 1L), ("p25", 1L, 4L), ("p50", 1L, 2L),
      ("p75", 3L, 4L), ("p99", 99L, 100L))
    def brute(k: String, num: Long, den: Long): Long = {
      val vs = rows.filter(_._1 == k).sortBy(_._2)
      val tot = vs.map(_._3).sum
      var cum = 0L
      vs.find { case (_, _, w) => cum += w; cum * den >= tot * num }.get._2
    }
    val r = Analytics.weightedQuantiles(rows.toDF("k", "v", "w"),
        Seq("k"), "v", "w", qs)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    for (k <- Seq("a", "b"); (q, n, d) <- qs)
      withClue(s"$k/$q: ") { r((k, q)) shouldBe brute(k, n, d) }
    r(("a", "p50")) shouldBe 4096L // crosses into a later bucket
    r(("a", "p00")) shouldBe -5000L // rank 0 = group minimum
  }

  it should "match brute force on seeded-random frames (zero weights, negatives, boundary straddles)" in {
    // the repo's seeded Sampled idiom: 30 random groups in ONE frame (the
    // trial id is part of the group key), every rank checked against the
    // reference definition "smallest v with den·cumw(v) >= num·tot"
    val rnd = new java.util.Random(20260815L)
    val qs = Seq(("p00", 0L, 1L), ("p37", 37L, 100L), ("p50", 1L, 2L),
      ("p63", 5L, 8L), ("p100", 1L, 1L))
    val rows = (0 until 30).flatMap { trial =>
      val n = 5 + rnd.nextInt(36)
      (0 until n).map { _ =>
        (s"t$trial", rnd.nextInt(18001).toLong - 9000L, rnd.nextInt(6).toLong)
      }
    }
    def brute(k: String, num: Long, den: Long): Long = {
      // register form: weights summed per value first (duplicate values
      // collapse), then the cumulative test over sorted distinct values
      val byV = rows.filter(_._1 == k).groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      var cum = 0L
      byV.find { case (_, w) => cum += w; cum * den >= tot * num }.get._1
    }
    val r = Analytics.weightedQuantiles(rows.toDF("k", "v", "w"),
        Seq("k"), "v", "w", qs)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    for (trial <- 0 until 30; (q, num, den) <- qs)
      withClue(s"t$trial/$q: ") { r((s"t$trial", q)) shouldBe brute(s"t$trial", num, den) }
  }

  "Retrieval.bigramLmScore" should "reduce partitioned scoring to the single-LM score on one partition" in {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the rug"),
      (3L, "en", "a bird flew over the mat"))
      .toDF("doc_id", "lang", "text")
    val flat = graft.operators.Retrieval
      .bigramLmScore(docs, docs, "doc_id", "text", "s")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    val part = graft.operators.Retrieval
      .bigramLmScore(docs, docs, "doc_id", "text", "s", partitionCols = Seq("lang"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    part shouldBe flat
  }

  it should "score docs of a train-empty partition as 0" in {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "de", "der hund sitzt auf dem teppich"))
      .toDF("doc_id", "lang", "text")
    val r = graft.operators.Retrieval
      .bigramLmScore(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", "s", partitionCols = Seq("lang"))
      .orderBy("doc_id").collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    r(1) shouldBe ((2L, 0L, 0L)) // de has no reference rows → zero registers
    r(0)._3 should be > 0L
  }

  "Dedup.trimDuplicatedSpans" should "keep the globally-first occurrence and excise later copies" in {
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$shared tail1 tail2"),     // keeper (smallest doc) — untouched
      (2L, s"head1 head2 $shared"),     // non-keeper → span at pos 2..9 dropped
      (3L, "a b c d e"))                // no dup grams — untouched
      .toDF("doc_id", "text")
    val r = Dedup.trimDuplicatedSpans(docs, "doc_id", "text", n = 8, minDf = 2L)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    r shouldBe Array(
      (1L, 10L, 10L, s"$shared tail1 tail2"),
      (2L, 10L, 2L, "head1 head2"),
      (3L, 5L, 5L, "a b c d e"))
  }

  it should "emit an empty doc when every token is a later copy" in {
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq((1L, eight), (2L, eight)).toDF("doc_id", "text")
    val r = Dedup.trimDuplicatedSpans(docs, "doc_id", "text", n = 8, minDf = 2L)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getString(3)))
    r shouldBe Array((1L, 8L, eight), (2L, 0L, ""))
  }

  "Sampling.clusterAwareSplit" should "produce zero split leakage by construction" in {
    // three near-dup "clusters" via trivially similar texts; whatever the
    // LSH finds, splitting by the cluster representative must leave NO
    // pair crossing the train boundary
    val docs = (1L to 40L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta common${i % 7} tail"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text",
      numHashes = 8, shingleSize = 3, rowsPerBand = 2, minEstimate = 0.5,
      materializeCandidates = true)
    pairs.count() should be > 0L // the guard is vacuous on an empty pair set
    val clustered = graft.operators.Dedup
      .nearDupClusters(spark, docs, "doc_id", "text")
    val byCluster = graft.operators.Sampling.clusterAwareSplit(clustered)
      .select(col("doc_id"), col("split"))
    val splitOf = byCluster.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val leaks = pairs.select("id_a", "id_b").collect()
      .count(r => (splitOf(r.getLong(0)) == "train") != (splitOf(r.getLong(1)) == "train"))
    leaks shouldBe 0
  }

  "Dedup.duplicatedSpanCoverage" should "flag only windows shared across distinct docs" in {
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$shared tail1 tail2"),         // 10 tokens, shared 8-gram at pos 0
      (2L, s"head1 head2 $shared"),         // 10 tokens, shared 8-gram at pos 2
      (3L, "a b c d e f g h i j"),          // no cross-doc gram
      // intra-doc duplicate gram only in one doc must NOT fire (df counts
      // DISTINCT docs)
      (4L, "m1 m2 m3 m4 m5 m6 m7 m8 m1 m2 m3 m4 m5 m6 m7 m8"))
      .toDF("doc_id", "text")
    val r = Dedup.duplicatedSpanCoverage(docs, "doc_id", "text", n = 8, minDf = 2L)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    r shouldBe Array(
      (1L, 10L, 1L, 8L, 800000L),
      (2L, 10L, 1L, 8L, 800000L),
      (3L, 10L, 0L, 0L, 0L),
      (4L, 16L, 0L, 0L, 0L))
  }

  "Retrieval.knBigramFluency" should "match the hand-computed Kneser-Ney ppm" in {
    // model: c12 = {(a,b)→3, (b,a)→1, (b,c)→1}; c1 = {a→3 (n1pre 1),
    //   b→2 (n1pre 2)}; n1suf = {b→1, a→1, c→1}; T = 3
    // p(a,b) = (12−3)e6//12 + ((3e6//12)·(1e6//3))//1e6 = 750000+83333
    // p(b,a) = p(b,c) = (4−3)e6//8 + ((6e6//8)·(1e6//3))//1e6 = 125000+249999
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val r = graft.operators.Retrieval.knBigramFluency(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    r shouldBe Array(
      (1L, 3L, (2L * 833333L + 374999L) / 3L), // 680555
      (2L, 2L, (833333L + 374999L) / 2L),      // 604166
      (3L, 0L, 0L))
  }

  "Analytics.holtLinearForecast" should "run the hand-computed integer Holt recursion" in {
    // x = [100, 50, 120, 40]; α = β = 1/4; TRUNCATING division pins the
    // convention: b₂ = (−13)/4 = −3 (floor would give −4), b₃ = (−3)/4 = 0
    val regs = Seq((1L, 100L), (2L, 50L), (3L, 120L), (4L, 40L)).toDF("t", "x")
    val r = Analytics.holtLinearForecast(regs, "t", "x")
      .orderBy("t")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5)))
    r shouldBe Array(
      (1L, 100L, 100L, 0L, 100L, 0L),
      (2L, 50L, 87L, -3L, 100L, -50L),
      (3L, 120L, 93L, 0L, 84L, 36L),
      (4L, 40L, 79L, -3L, 93L, -53L))
  }

  "Retrieval.rocchioScore" should "separate disjoint-vocabulary classes with balanced mass" in {
    // 1 positive vs 3 negatives: the class weights (m_pos = 3, m_neg = 1)
    // balance total mass, so the lone positive is not drowned out
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "gamma delta gamma", false),
      (3L, "delta gamma delta", false),
      (4L, "gamma gamma delta", false)).toDF("doc_id", "text", "is_en")
    val r = graft.operators.Retrieval.rocchioScore(docs, "doc_id", "text",
        isPositive = col("is_en"))
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(3), x.getBoolean(4)))
    r shouldBe Array(
      (1L, 1L, 1L, true), (2L, -1L, -1L, true),
      (3L, -1L, -1L, true), (4L, -1L, -1L, true))
  }

  "GraphAlgorithms.pageRankPpm(seeds)" should "restart only at the seed set" in {
    // 2-cycle a<->b, seed {a}, d = 1/2, 2 iterations, by hand:
    // init a=1e6 b=0; it1 a=500000 b=500000; it2 a=750000 b=250000
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = graft.operators.GraphAlgorithms.pageRankPpm(spark, edges,
        iterations = 2, dampingPpm = 500000L,
        seeds = Some(Seq("a").toDF("vertex")))
      .orderBy("vertex")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    r shouldBe Array(("a", 750000L), ("b", 250000L))
  }

  "Similarity.centroidScoreAuc" should "compute the tie-corrected Mann-Whitney AUC" in {
    // label-0 centroid = trunc((1000+500)/2, 0) = (750, 0); scores are
    // 750·x: pos {750000, 375000}, neg {−750000, 375000 (tie), −375000}
    // → R1 = 5 + 3.5 = 8.5, AUC = 5.5/6 → ⌊11e6/12⌋ = 916666
    val vecs = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(0.5f, 0.0f)),
      (1, Array(-1.0f, 0.0f)), (1, Array(0.5f, 0.0f)), (1, Array(-0.5f, 0.0f)))
      .toDF("label", "embedding")
    val r = Similarity.centroidScoreAuc(vecs, "embedding", "label", posLabel = 0)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    r shouldBe Array((2L, 3L, 916666L))
  }
}
