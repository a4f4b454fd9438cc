package graft

import graft.operators.{Bpe, Dedup, Similarity}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Empty/degenerate-input behavior of the round-9 operators: a 100 TB
  * pipeline WILL hand these an empty partition, a filtered-to-nothing
  * increment, or a corpus with no eligible rows — none of them may
  * throw. */
class DegenerateInputsSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  "Bpe.learn" should "return zero merges when no word is eligible" in {
    val df = Seq(("1", "123 456 ??? ZZ99")).toDF("doc_id", "text")
    val (m, t0, fin) = Bpe.learn(spark, df, rounds = 3)
    m.count() shouldBe 0L
    t0.count() shouldBe 0L
    fin.count() shouldBe 0L
  }

  "Bpe.applyMerges" should "be the identity for an empty merge table" in {
    val docs = Seq(("1", "alpha beta")).toDF("doc_id", "text")
    val (empty, _, _) = Bpe.learn(spark,
      Seq(("1", "42")).toDF("doc_id", "text"), rounds = 2)
    val types = Bpe.wordTypes(docs, 16)
    Bpe.applyMerges(types, empty).orderBy("seq").collect() shouldBe
      types.orderBy("seq").collect()
  }

  "sortedNeighborhoodJaccard" should "return no pairs when no doc has grams" in {
    val df = Seq((1L, "en", "ab"), (2L, "en", "cd")).toDF("doc_id", "lang", "text")
    Dedup.sortedNeighborhoodJaccard(df, "doc_id", "text",
      partitionCols = Seq("lang")).count() shouldBe 0L
  }

  "mutualOneNn" should "return empty on an empty pair table" in {
    val pairs = Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "cosine")
    Similarity.mutualOneNn(pairs).count() shouldBe 0L
  }

  "knBigramFluency" should "score 0 over 0 bigrams when no doc has two tokens" in {
    // the model tables are all empty; the per-bigram divisions (incl. the
    // ÷ t_types) never evaluate because the scored frame is empty
    val docs = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val r = graft.operators.Retrieval.knBigramFluency(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    r shouldBe Array((1L, 0L, 0L), (2L, 0L, 0L))
  }

  "centroidScoreAuc" should "return 0 ppm (not divide by zero) with no positives" in {
    // centroid of an absent label is the empty aggregate (cv = []) — the
    // dot is 0 for every row, n_pos = 0, and the greatest(..,1) guard
    // keeps the final division alive
    val vecs = Seq((1, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("label", "embedding")
    val r = Similarity.centroidScoreAuc(vecs, "embedding", "label", posLabel = 0)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    r shouldBe Array((0L, 2L, 0L))
  }

  "holtLinearForecast" should "refuse an empty register frame with a clear message" in {
    val empty = Seq.empty[(Long, Long)].toDF("t", "x")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Analytics.holtLinearForecast(empty, "t", "x")
    }
    e.getMessage should include("non-empty")
  }

  // round-11 division sweep (VERDICT #5): the three sites whose
  // denominators are not a per-group count — pinned non-throwing here

  "Bpe.compressionAudit" should "not throw on an empty vocabulary (NULL ratio, no ANSI divide)" in {
    val (_, t0, fin) = Bpe.learn(spark,
      Seq(("1", "123 ???")).toDF("doc_id", "text"), rounds = 2)
    val r = Bpe.compressionAudit(t0, fin).collect()
    r.length shouldBe 1
    r(0).getLong(0) shouldBe 0L // n_types
    r(0).isNullAt(4) shouldBe true // compression_ppm NULL, not a throw
  }

  "bm25TopK" should "survive avgdl flooring to 0 (the 18·dl term keeps the denominator > 0)" in {
    // 3 docs, 2 tokens total → avgdl = 2 div 3 = 0; a matching term still
    // scores because tfsat's denominator has the 18·dl ≥ 18 term
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "")).toDF("doc_id", "text")
    val r = graft.operators.Retrieval.bm25TopK(docs, "doc_id", "text",
      terms = Seq("alpha"), k = 2).collect()
    r.length shouldBe 1
    r(0).getLong(0) shouldBe 1L
  }

  "temperatureMixtureAlloc" should "emit no rows (and no mod-by-zero) on an empty frame" in {
    val empty = Seq.empty[(String, Long)].toDF("source", "x")
    graft.operators.Sampling.temperatureMixtureAlloc(empty, Seq("source"), 100L)
      .count() shouldBe 0L
  }
}
