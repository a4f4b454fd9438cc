package graft

import graft.operators.{Histogram, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

class SamplingHistogramSpec extends SparkSpec {
  import spark.implicits._

  "md5Bucket256" should "be deterministic and within [0, 256)" in {
    val df = spark.range(1000).select(Sampling.md5Bucket256(col("id")).as("b"))
    val buckets = df.as[Long].collect()
    all(buckets) should (be >= 0L and be < 256L)
    // re-evaluation (different partitioning) yields identical assignment
    val again = spark.range(1000).repartition(7)
      .select(col("id"), Sampling.md5Bucket256(col("id")).as("b"))
      .orderBy("id").select("b").as[Long].collect()
    again shouldBe buckets
  }

  "deterministicSample" should "keep exactly the rows whose bucket is under the threshold" in {
    val df = spark.range(2000).toDF("id")
    val kept = Sampling.deterministicSample(df, "id", 64)
    kept.filter(Sampling.md5Bucket256(col("id")) >= 64).count() shouldBe 0L
    // ~64/256 = 25%, md5 is uniform: allow a wide tolerance
    kept.count().toDouble shouldBe (500.0 +- 150.0)
  }

  "stratifiedCap" should "cap each stratum deterministically by hash rank" in {
    val df = spark.range(300)
      .select(col("id"), (col("id") % 3).cast("string").as("lang"))
    val capped = Sampling.stratifiedCap(df, Seq("lang"), "id", cap = 10)
    capped.groupBy("lang").count().as[(String, Long)].collect().toMap shouldBe
      Map("0" -> 10L, "1" -> 10L, "2" -> 10L)
    // stable under re-partitioning: same kept ids
    val again = Sampling.stratifiedCap(df.repartition(7), Seq("lang"), "id", cap = 10)
    again.select("id").as[Long].collect().sorted shouldBe
      capped.select("id").as[Long].collect().sorted
    // strata smaller than the cap survive whole
    val tiny = Sampling.stratifiedCap(df.limit(5), Seq("lang"), "id", cap = 10)
    tiny.count() shouldBe 5L
  }

  "equiDepth" should "fill buckets row_number-style with exact ranges" in {
    // 10 rows, 4 buckets → sizes 3,3,2,2 over the sorted values
    val df = (1L to 10L).map(i => (i, i * 10L)).toDF("id", "v").withColumn("g", lit("a"))
    val out = Histogram.equiDepth(df, Seq("g"), "v", Seq("id"), 4)
      .orderBy("bucket")
      .select("bucket", "n", "lo", "hi")
      .as[(Int, Long, Long, Long)].collect()
    out shouldBe Array(
      (1, 3L, 10L, 30L), (2, 3L, 40L, 60L), (3, 2L, 70L, 80L), (4, 2L, 90L, 100L))
  }

  "scrubPii" should "redact and count emails, IPs, and card numbers" in {
    val docs = Seq(
      (1L, "contact Bob.Smith+x@Example.COM or 192.168.1.1 now"),
      (2L, "card 4111222233334444 expires soon"),
      (3L, "nothing sensitive here"),
      (4L, "short digits 123456789012 stay")) // 12 digits: below card range
      .toDF("doc_id", "text")
    val out = TextAnalysis.scrubPii(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    out(0).getAs[Long]("n_emails") shouldBe 1L
    out(0).getAs[Long]("n_ips") shouldBe 1L
    out(0).getAs[String]("scrubbed") shouldBe "contact [PII] or [PII] now"
    out(1).getAs[Long]("n_cards") shouldBe 1L
    out(1).getAs[String]("scrubbed") shouldBe "card [PII] expires soon"
    out(2).getAs[String]("scrubbed") shouldBe "nothing sensitive here"
    out(3).getAs[Long]("n_cards") shouldBe 0L
  }

  "repetition" should "score duplicate trigram ratio in exact ppm" in {
    val docs = Seq(
      (1L, "a b c d e"),       // 3 grams, all distinct → 0 ppm
      (2L, "x y x y x y x y"), // 6 grams, 2 distinct → floor(4e6/6)
      (3L, "q")                // too short → 0 grams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .select("n_grams", "n_distinct", "dup_ppm")
      .as[(Long, Long, Long)].collect()
    out(0) shouldBe ((3L, 3L, 0L))
    out(1) shouldBe ((6L, 2L, 666666L))
    out(2) shouldBe ((0L, 0L, 0L))
  }

  "epochUpsample" should "emit exact whole-epoch copies and a deterministic fractional coin" in {
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b"),
      (7L, "c")).toDF("id", "src")
    // a: exactly 2 epochs; b: 1 epoch; c: unmapped -> dropped
    val up = Sampling.epochUpsample(df, "src", "id",
      Map("a" -> 2000000L, "b" -> 1000000L))
    val byId = up.groupBy("id").count().as[(Long, Long)].collect().toMap
    byId(1L) shouldBe 2L; byId(2L) shouldBe 2L; byId(3L) shouldBe 2L; byId(4L) shouldBe 2L
    byId(5L) shouldBe 1L; byId(6L) shouldBe 1L
    byId.contains(7L) shouldBe false
    up.select("copy_idx").as[Long].collect().min shouldBe 1L
    // fractional epochs: copies per doc is 0 or 1 at 0.5, stable on re-run
    val frac = Sampling.epochUpsample(df.filter(col("src") === "a"), "src", "id",
      Map("a" -> 500000L))
    val counts = frac.groupBy("id").count().as[(Long, Long)].collect().toMap
    all(counts.values) shouldBe 1L // present docs have exactly one copy
    val again = Sampling.epochUpsample(df.filter(col("src") === "a"), "src", "id",
      Map("a" -> 500000L)).groupBy("id").count().as[(Long, Long)].collect().toMap
    again shouldBe counts
  }

  "weightedPrioritySample" should "bias selection toward heavy rows, deterministically" in {
    // 200 light rows (w=1) + 200 heavy rows (w=1000) in one stratum: a
    // k=50 sample should be dominated by heavy rows (priority ∝ 1/w)
    val df = spark.range(400).select(
      col("id"), lit("s").as("src"),
      when(col("id") < 200, 1L).otherwise(1000L).as("w"))
    val picked = Sampling.weightedPrioritySample(df, "src", "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    picked.size shouldBe 50
    picked.count(_ >= 200) should be > 40 // heavy rows dominate
    // determinism across partitionings
    val again = Sampling.weightedPrioritySample(df.repartition(7), "src", "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    again shouldBe picked
  }

  "contextPack" should "bin by exclusive prefix tokens within each stratum" in {
    val df = Seq(
      (1L, "a", 300L), (2L, "a", 300L), (3L, "a", 300L), (4L, "a", 50L),
      (5L, "b", 600L), (6L, "b", 10L)).toDF("id", "src", "n_tok")
    val packed = Sampling.contextPack(df, "src", "id", "n_tok", budgetTokens = 512L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    // a: prefixes 0,300,600,900 -> bins 0,0,1,1
    packed(1L) shouldBe 0L; packed(2L) shouldBe 0L
    packed(3L) shouldBe 1L; packed(4L) shouldBe 1L
    // b: stratum-local bins restart at 0; 600-token doc overflows bin 0
    // (prefix rule: straddlers stay in their prefix bin)
    packed(5L) shouldBe 0L; packed(6L) shouldBe 1L
  }

  "boilerplateScore" should "flag grams shared by more than dfMax docs, zero for short docs" in {
    val boiler = "click here to subscribe"
    val docs = (1L to 5L).map(i => (i, s"$boiler unique$i tail$i words$i here$i"))
      .toDF("doc_id", "text")
      .unionAll(Seq((6L, "one two")).toDF("doc_id", "text")) // < 3 tokens: 0 grams
    val scored = TextAnalysis.boilerplateScore(docs, "doc_id", "text", n = 3, dfMax = 4L)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    // "click here to"/"here to subscribe" appear in 5 > 4 docs -> boiler
    scored.take(5).foreach { case (_, nGrams, nBoiler, ppm) =>
      nBoiler shouldBe 2L
      ppm shouldBe (2L * 1000000L) / nGrams
    }
    scored.last shouldBe ((6L, 0L, 0L, 0L))
  }

  "trainValTestSplit" should "partition every row into exactly one stable split" in {
    val df = spark.range(500).toDF("id")
    val s = Sampling.trainValTestSplit(df, "id")
    s.count() shouldBe 500L
    s.filter(col("split") === "train" && col("bucket") >= 200).count() shouldBe 0L
    s.filter(col("split") === "val" && (col("bucket") < 200 || col("bucket") >= 228))
      .count() shouldBe 0L
    s.filter(col("split") === "test" && col("bucket") < 228).count() shouldBe 0L
    s.select("split").distinct().count() shouldBe 3L
  }

  "Histogram.fixedWidth" should "bin values half-open and drop nulls" in {
    val df = Seq(
      ("a", Some(0.0)), ("a", Some(9.999)), ("a", Some(10.0)), ("a", Some(-0.001)),
      ("b", Some(25.0)), ("b", None)).toDF("g", "v")
    val h = Histogram.fixedWidth(df, Seq("g"), "v", width = 10.0)
      .orderBy("g", "bin").as[(String, Long, Long)].collect()
    h shouldBe Array(("a", -1L, 1L), ("a", 0L, 2L), ("a", 1L, 1L), ("b", 2L, 1L))
  }

  "topTermsPerGroup" should "rank by count desc then token asc within each group" in {
    val docs = Seq(
      (1L, "en", "alpha alpha beta"),
      (2L, "en", "alpha beta gamma"),
      (3L, "de", "zeta zeta eta")).toDF("doc_id", "lang", "text")
    val top = TextAnalysis.topTermsPerGroup(docs, "lang", "text", k = 2)
      .orderBy("lang", "rank")
      .select("lang", "token", "n", "rank")
      .as[(String, String, Long, Int)].collect()
    top shouldBe Array(
      ("de", "zeta", 2L, 1), ("de", "eta", 1L, 2),
      ("en", "alpha", 3L, 1), ("en", "beta", 2L, 2))
  }

  "TokenizeText (native)" should "equal the declarative split/filter formulation" in {
    val nasty = Seq(
      "Hello World", "  leading and trailing  ", "tabs\tand\nnewlines",
      "", "   ", "UPPER lower MiXeD", "unicode ÉÀÖ ß 中文 分词",
      "multi   spaces", "\t\n\f\r", "a", "ein Straßenfest in MÜNCHEN")
    val df = nasty.toDF("text")
    val native = df.select(graft.functions.GraftFunctions.tokens(col("text")).as("t"))
      .as[Seq[String]].collect()
    val declarative = df.select(
      filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= lit("")).as("t"))
      .as[Seq[String]].collect()
    native shouldBe declarative
  }

  "Sampling.largestRemainderAlloc" should "hit the budget exactly with proportional quotas" in {
    import spark.implicits._
    // strata 5/3/2 of 10 rows, budget 7: quotas 3/2/1 (floor of 3.5/2.1/1.4),
    // leftover 1 goes to the largest remainder (stratum a, rem .5)
    val rows = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val got = Sampling.largestRemainderAlloc(rows.toDF("s"), Seq("s"), budget = 7L)
      .orderBy("s")
      .select("s", "n_rows", "quota", "extra", "alloc")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(("a", 5L, 3L, 1L, 4L), ("b", 3L, 2L, 0L, 2L), ("c", 2L, 1L, 0L, 1L))
    got.map(_._5).sum shouldBe 7L
  }

  "Sampling.temperatureMixtureAlloc" should "flatten toward sqrt weights and hit the budget" in {
    import spark.implicits._
    // strata 1/4/16: weights ⌊√(n·10⁶)⌋ = 1000/2000/4000, W = 7000;
    // quotas of budget 10: 1 (rem 3000) / 2 (rem 6000) / 5 (rem 5000);
    // leftover 2 → b and c. Linear alloc would be ~0/2/8: a is upweighted.
    val rows = Seq.fill(1)("a") ++ Seq.fill(4)("b") ++ Seq.fill(16)("c")
    val got = Sampling.temperatureMixtureAlloc(rows.toDF("s"), Seq("s"), budget = 10L)
      .orderBy("s")
      .select("s", "n_rows", "w", "quota", "extra", "alloc")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      ("a", 1L, 1000L, 1L, 0L, 1L),
      ("b", 4L, 2000L, 2L, 1L, 3L),
      ("c", 16L, 4000L, 5L, 1L, 6L))
    got.map(_._6).sum shouldBe 10L
  }

  it should "sum to the budget for adversarial remainders" in {
    import spark.implicits._
    // 7 equal strata, budget 10: quotas 1 each, 3 extras by tie-broken key order
    val rows = (0 until 7).flatMap(i => Seq.fill(3)(s"s$i"))
    val got = Sampling.largestRemainderAlloc(rows.toDF("s"), Seq("s"), budget = 10L)
      .select("alloc").as[Long].collect()
    got.sum shouldBe 10L
    got.max shouldBe 2L
    got.min shouldBe 1L
  }
}
