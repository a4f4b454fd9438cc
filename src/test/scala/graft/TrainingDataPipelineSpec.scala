package graft

import graft.operators.TrainingDataPipeline

class TrainingDataPipelineSpec extends SparkSpec {
  import spark.implicits._

  "curate" should "apply quality gate, exact dedup, near-dup removal, and annotate survivors" in {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base), // survivor (keeper of the exact group)
      (2L, base), // exact dup of 1 → dropped
      (3L, base.replace("dog", "cat")), // near-dup of 1 → dropped by LSH
      (4L, "tiny"), // fails quality gate (< 10 tokens)
      (5L, "an entirely different long document about stream processing engines and state"))
      .toDF("doc_id", "text")
    val out = TrainingDataPipeline.curate(docs, "doc_id", "text", minEstimate = 0.4)
      .orderBy("doc_id").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L, 5L)
    val r1 = out(0)
    r1.getAs[String]("predicted_lang") shouldBe "en" // 'the' hits
    r1.getAs[Long]("n_tokens") shouldBe 13L
    r1.getAs[String]("content_fp") should have length 32
  }

  it should "survive a degenerate corpus with the production bucket cap (over-keep, never quadratic)" in {
    import org.apache.spark.sql.functions.{col, concat, lit}
    // 2k near-identical-but-distinct docs (unique trailing token defeats
    // exact dedup, shared shingles flood the LSH band buckets) + 2 normal
    // near-dups + 1 unique doc. Uncapped this is ~4M candidate pairs from
    // one bucket; with the cap the degenerate bucket is dropped and its
    // docs SURVIVE (the safe over-keep failure mode) while the small
    // bucket still deduplicates.
    val boiler = spark.range(2000L).select(
      col("id").as("doc_id"),
      concat(lit("identical boilerplate navigation header and footer text repeated across every single page "),
        col("id").cast("string")).as("text"))
    val rest = Seq(
      (5001L, "a perfectly ordinary training document with enough words to shingle"),
      (5002L, "a perfectly ordinary training document with enough words to shingle today"),
      (5003L, "an entirely different long document about stream processing engines and state"))
      .toDF("doc_id", "text")
    val out = TrainingDataPipeline.curate(boiler.union(rest), "doc_id", "text",
      minEstimate = 0.4, maxBucketSize = 100L)
      .select("doc_id").as[Long].collect().sorted
    // all 2000 degenerate docs kept; 5002 dropped as near-dup of 5001
    out.length shouldBe 2002
    out should contain(5001L)
    out should not contain 5002L
    out should contain(5003L)
  }

  "curateV2" should "chain repetition gate, decontamination, cluster dedup, and lang cap" in {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // eval corpus (source=eval)
      (100L, "benchmark question about spark window functions and state stores", "en", "eval"),
      // train: contaminated (shares the 8-gram run with the eval doc)
      (1L, "benchmark question about spark window functions and state stores copied", "en", "web"),
      // train: heavy repetition → dropped by the gate
      (2L, "x y z x y z x y z x y z x y z x y z", "en", "web"),
      // train: near-dup pair → only the min id survives
      (3L, "a perfectly ordinary training document with enough words to shingle", "en", "web"),
      (4L, "a perfectly ordinary training document with enough words to shingle", "en", "web"),
      // train: clean singleton in another language
      (5L, "ein ganz anderes deutsches dokument mit vielen verschiedenen worten hier", "de", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TrainingDataPipeline.curateV2(spark, docs, "doc_id", "text",
      evalFilter = col("source") === "eval", maxDupPpm = 500000L, capPerLang = 10)
      .select("doc_id").as[Long].collect().sorted
    out shouldBe Array(3L, 5L)
  }

  "curateTargeted" should "ban repeated-span docs then keep per-source top halves by fluency and importance" in {
    import org.apache.spark.sql.functions.col
    val span = "alpha beta gamma delta epsilon"
    val docs = Seq(
      // target slice (wiki): typical phrasing
      (1L, "the quick fox runs fast today and the quick fox rests", "wiki"),
      (2L, "the quick fox sleeps now and the quick fox wakes up", "wiki"),
      // web: contains the cross-doc repeated span → banned outright
      (10L, s"some page $span footer text here", "web"),
      (11L, s"other page $span footer text too", "web"),
      // web: fluent AND target-like — remixes of target BIGRAMS with no
      // 5-token run shared with any other doc (else the ban list fires)
      (12L, "quick fox wakes today and so the quick fox rests", "web"),
      (13L, "now the quick fox wakes and fast the quick fox runs", "web"),
      // web: word salad — same words, permuted (low fluency, low importance)
      (14L, "fox the runs quick fast and today rests fox quick the", "web"),
      (15L, "now sleeps wakes fox quick the up and fox the quick", "web"))
      .toDF("doc_id", "text", "source")
    val out = TrainingDataPipeline.curateTargeted(docs, "doc_id", "text",
        "source", isTarget = col("source") === "wiki",
        spanN = 5, spanDf = 2L, spanK = 10, keepPpm = 500000L)
      .select("doc_id").as[Long].collect().sorted
    // banned: 10, 11. web survivors ranked: {12,13} beat {14,15} on fluency
    // (top half of 4), then top half of {12,13} by importance → one doc.
    out should not contain 10L
    out should not contain 11L
    out.intersect(Seq(14L, 15L)) shouldBe empty
    out.count(Seq(12L, 13L).contains) shouldBe 1
    // wiki: chained floor halving 2 -> 1 -> 0 (tiny strata starve; at
    // corpus scale keepPpm gates compound as documented)
    out.count(Seq(1L, 2L).contains) shouldBe 0
  }
}
