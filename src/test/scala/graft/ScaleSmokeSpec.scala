package graft

import graft.core.Changelog
import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Multi-million-row smoke of the core reduction paths — not a benchmark,
  * a "does the shape hold when rows ≫ keys" check: compaction and salted
  * aggregation must produce exactly keyed-cardinality outputs from a 5M-row
  * changelog without collecting or exploding anything. */
class ScaleSmokeSpec extends SparkSpec {

  "compact" should "reduce a 5M-row changelog to exactly one row per key" in {
    val n = 5000000L
    val keys = 10000L
    // synthetic changelog: key = id % keys, ts = id (later ids win)
    val log = spark.range(n).select(
      (col("id") % keys).as("key"),
      col("id").as("ts"),
      (col("id") * 7).as("payload"))
    val latest = Changelog.compact(log, Seq("key"), "ts")
    latest.count() shouldBe keys
    // winner per key is the max ts ≡ key + keys*(n/keys - 1)
    val r = latest.filter(col("key") === 123L).select("ts").collect()(0).getLong(0)
    r shouldBe (123L + keys * (n / keys - 1))
  }

  "saltedCountSum" should "survive one key owning 90% of 2M rows" in {
    val df = spark.range(2000000L).select(
      when(col("id") % 10 =!= 0, lit(777L)).otherwise(col("id")).as("k"),
      lit(1.0).as("v"))
    val out = Skew.saltedCountSum(df, Seq("k"), "v", saltBuckets = 32)
    out.filter(col("k") === 777L).select("n").collect()(0).getLong(0) shouldBe 1800000L
  }

  it should "salt deterministically: same inputs, same partials, any partitioning" in {
    val df = spark.range(100000L).select((col("id") % 100).as("k"), lit(2.0).as("v"))
    val a = Skew.saltedCountSum(df, Seq("k"), "v", saltBuckets = 16)
      .orderBy("k").collect().toSeq
    val b = Skew.saltedCountSum(df.repartition(13), Seq("k"), "v", saltBuckets = 16)
      .orderBy("k").collect().toSeq
    a shouldBe b
  }

  "native text expressions" should "stream 1M documents at scan speed (row-local, no shuffle)" in {
    // 1M synthetic docs of ~8 tokens: simhash + langid + token stats in ONE
    // projection pass. This pins the 100 TB shape: per-row work only, so
    // the plan must contain zero exchanges before the final aggregation.
    val docs = spark.range(1000000L).select(
      col("id"),
      concat_ws(" ",
        lit("the"), lit("quick"), col("id").cast("string"),
        lit("und"), (col("id") % 97).cast("string"),
        lit("fox"), (col("id") % 13).cast("string"), lit("a")).as("text"))
    val toks = graft.functions.GraftFunctions.tokens(col("text"))
    val scored = docs.select(
      graft.functions.GraftFunctions.simhashBits(toks, 16).as("sh"),
      graft.functions.GraftFunctions.sumTokenChars(toks).as("len"))
    val plan = scored.queryExecution.executedPlan.toString
    plan should not include "Exchange" // row-local: nothing shuffles
    val agg = scored.agg(bit_xor(col("sh")), sum(col("len"))).collect()(0)
    agg.getLong(1) should be > 0L // forced full evaluation of both columns
  }

  "epochUpsample" should "upsample 1M rows with zero exchanges (pure projection + explode)" in {
    val df = spark.range(1000000L).select(
      col("id"), (col("id") % 3).cast("string").as("src"))
    val up = graft.operators.Sampling.epochUpsample(df, "src", "id",
      Map("0" -> 2000000L, "1" -> 1000000L)) // stratum 2 unmapped -> dropped
    up.queryExecution.executedPlan.toString should not include "Exchange"
    // exact whole-epoch arithmetic: 2x the ~333334 "0" rows + 1x the "1" rows
    up.count() shouldBe (2L * 333334L + 333333L)
  }

  "signCol" should "sign 1M rows at scan speed (zero exchanges, codegen'd)" in {
    val df = spark.range(1000000L).select(
      concat(lit("/api/"), col("id").cast("string")).as("path"),
      (col("id") % 100000L * 60L).as("minute"))
    val signed = df.select(graft.functions.TimeCryptoProof.signCol(
      col("path"), "000102030405060708090A0B0C0D0E0F", col("minute")).as("sig"))
    val plan = signed.queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should include("*(1)") // the whole-stage-codegen stage marker
    signed.agg(count(lit(1))).collect()(0).getLong(0) shouldBe 1000000L
  }

  "capBuckets" should "stop a degenerate LSH bucket from going quadratic" in {
    // 10k identical docs = every band bucket holds all 10k rows; uncapped
    // the self-join would enumerate ~10^8 pairs per band. The cap drops the
    // degenerate bucket entirely — zero pairs, not 10^8 — while distinct
    // docs (tiny buckets) still pair normally.
    val dup = spark.range(10000L).select(col("id"), lit("the same boilerplate page text repeated").as("text"))
    val capped = graft.operators.Dedup.minhashLsh(
      dup, "id", "text", numHashes = 4, rowsPerBand = 2, minEstimate = 0.1,
      maxBucketSize = 100L)
    capped.count() shouldBe 0L
    // cap off (default) on a small group still yields all pairs
    val tiny = spark.range(3L).select(col("id"), lit("identical text for all three docs").as("text"))
    graft.operators.Dedup.minhashLsh(tiny, "id", "text",
      numHashes = 4, rowsPerBand = 2, minEstimate = 0.1).count() shouldBe 3L
  }

  it should "cap a degenerate co-purchase basket before the pair join" in {
    // one 10k-item basket: uncapped, the basket self-join would emit
    // ~5*10^7 pair rows before the support filter sees any of them. The
    // cap drops the oversized basket whole; the small baskets still pair.
    val big = spark.range(10000L).select(lit(1L).as("o"), col("id").as("p"))
    val small = spark.range(4L).selectExpr("2 + id % 2 AS o", "id % 3 AS p")
    val items = big.unionAll(small)
    val edges = graft.operators.GraphAlgorithms.cooccurrenceEdges(
      items, "o", "p", minSupport = 1L, maxBasketSize = 100L)
    // only the two small baskets survive: {0,2} and {0,1} -> edges (0,2),(0,1)
    edges.count() shouldBe 2L
    // cap off on tiny data is unchanged (and includes the big basket)
    graft.operators.GraphAlgorithms.cooccurrenceEdges(
      small, "o", "p", minSupport = 1L).count() shouldBe 2L
  }

  "heavyHitters" should "prune a 2M-row long tail row-locally before the shuffle" in {
    // 5 heavy keys own half the rows (200k each); 1M tail keys the rest.
    // CMS estimates for tail rows sit near N/width ≈ 500 ≪ threshold, so
    // the row-local gate drops the tail before any shuffle; result exact.
    val df = spark.range(2000000L).select(
      when(col("id") % 2 === 0, concat(lit("h"), col("id") % 5))
        .otherwise(concat(lit("t"), col("id"))).as("k"))
    val hh = graft.operators.Sketches.heavyHitters(df, "k",
      threshold = 100000L, depth = 3, width = 4096)
      .orderBy("k").collect()
    hh.map(_.getString(0)) shouldBe Array("h0", "h1", "h2", "h3", "h4")
    all(hh.map(_.getLong(1))) shouldBe 200000L
  }

  "winnowedPairs" should "df-cap a boilerplate fingerprint shared by 20k docs" in {
    // 20k identical docs: every fingerprint's posting list holds all 20k
    // — uncapped the inverted-index join would emit ~2*10^8 pairs. The df
    // cap drops those posting lists whole; distinct docs still pair.
    val dup = spark.range(20000L).select(col("id").as("doc_id"),
      lit("alpha beta gamma delta epsilon zeta eta theta iota kappa").as("text"))
    graft.operators.Dedup.winnowedPairs(dup, "doc_id", "text",
      n = 4, window = 4, minShared = 1L, maxFpDf = 100L).count() shouldBe 0L
  }

  "triangleCount" should "reject vertex ids outside the rank-packing domain" in {
    val bad = spark.range(2L).select(col("id").as("src"), (col("id") + 1000000000L).as("dst"))
    an[IllegalArgumentException] should be thrownBy
      graft.operators.GraphAlgorithms.triangleCount(bad)
  }

  it should "cap embedding near-dup blocks the same way" in {
    val vecs = spark.range(5000L).select(
      col("id"), lit("hot").as("blk"),
      array(lit(1.0), lit(2.0), lit(3.0)).as("v"))
    val capped = graft.operators.Dedup.embeddingNearDup(
      vecs, "id", "v", "blk", minCosine = 0.9, maxBlockSize = 100L)
    capped.count() shouldBe 0L
    val small = spark.range(4L).select(
      col("id"), lit("b").as("blk"), array(lit(1.0), lit(0.0)).as("v"))
    graft.operators.Dedup.embeddingNearDup(small, "id", "v", "blk", minCosine = 0.9)
      .count() shouldBe 6L // 4 choose 2 identical vectors
  }

  it should "cap degenerate interval-overlap buckets the same way" in {
    // 10k long intervals all covering bucket 0: uncapped the bucket
    // equi-join enumerates ~10^8 candidate pairs; the cap drops the
    // oversized bucket group on each side before the join.
    val many = spark.range(10000L).select(
      col("id").as("a_id"), lit(0L).as("a_start"), lit(50L).as("a_end"))
    val manyB = many.select(
      col("a_id").as("b_id"), col("a_start").as("b_start"), col("a_end").as("b_end"))
    val capped = graft.operators.RangeJoin.intervalOverlap(
      many, manyB, "a_start", "a_end", "b_start", "b_end",
      bucketWidth = 100L, maxBucketSize = 100L)
    capped.count() shouldBe 0L
    // cap off (default): small overlapping sets still pair exactly
    val a3 = spark.range(3L).select(
      col("id").as("a_id"), lit(0L).as("a_start"), lit(50L).as("a_end"))
    val b3 = a3.select(
      col("a_id").as("b_id"), col("a_start").as("b_start"), col("a_end").as("b_end"))
    graft.operators.RangeJoin.intervalOverlap(
      a3, b3, "a_start", "a_end", "b_start", "b_end", bucketWidth = 100L)
      .count() shouldBe 9L // all 3x3 pairs overlap
  }

  it should "score repetition over 1M documents row-locally (zero exchanges)" in {
    val docs = spark.range(1000000L).select(
      concat_ws(" ",
        lit("a"), lit("b"), (col("id") % 7).cast("string"),
        lit("a"), lit("b"), (col("id") % 7).cast("string")).as("text"))
    val scored = docs.select(
      graft.functions.GraftFunctions.wordNgramStats(col("text"), 3).as("st"))
    val plan = scored.queryExecution.executedPlan.toString
    plan should not include "Exchange"
    val agg = scored
      .select(col("st").getItem(0).as("t"), col("st").getItem(1).as("u"))
      .agg(sum(col("t")), sum(col("u"))).collect()(0)
    agg.getLong(0) shouldBe 4000000L // 4 grams per 6-token doc
    agg.getLong(1) shouldBe 3000000L // "a b k" repeats once per doc
  }
}
