package graft

import graft.operators._
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join shuffle spark join spark"), // dense in all query terms
    (2L, "spark runs a join over the table"), // two terms, once each
    (3L, "the cat sat on the mat quietly today"), // no query terms
    (4L, "join"), // one term, tiny doc
    (5L, "spark spark spark spark spark spark spark spark")) // one hot term
    .toDF("doc_id", "text")

  "Retrieval.bm25TopK" should "rank multi-term dense docs first and skip non-matching docs" in {
    val r = Retrieval.bm25TopK(docs, "doc_id", "text",
        terms = Seq("spark", "join", "shuffle"), k = 10)
      .as[(Long, Long, Long)].collect()
    r.map(_._1) should not contain 3L // no query terms → absent
    r.head._1 shouldBe 1L // all three terms, high tf → top
    val byId = r.map(t => t._1 -> t).toMap
    byId(1L)._3 shouldBe 3L // n_terms matched
    byId(2L)._3 shouldBe 2L
    byId(4L)._3 shouldBe 1L
    // doc 2 matches two terms, docs 4/5 only one → doc 2 outranks both
    byId(2L)._2 should be > byId(4L)._2
    byId(2L)._2 should be > byId(5L)._2
  }

  it should "respect k with the deterministic (score desc, id) order" in {
    val r = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 2)
      .as[(Long, Long, Long)].collect()
    r should have length 2
    r.map(_._2) shouldBe r.map(_._2).sorted.reverse
  }

  "Retrieval.phraseSearch" should "count only adjacent in-order occurrences" in {
    val docs = Seq(
      (1L, "big data big data systems"),     // "big data" twice
      (2L, "data big"),                      // reversed — no hit
      (3L, "big x data"),                    // gap — no hit
      (4L, "BIG\tDATA"),                     // case/whitespace-normalized hit
      (5L, "nothing here")).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("big", "data"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    got shouldBe Seq((1L, 2L), (4L, 1L))
  }

  it should "handle phrases with repeated words" in {
    val docs = Seq((1L, "go go go stop"), (2L, "go stop go")).toDF("doc_id", "text")
    // "go go" occurs at pos 0 and 1 in doc 1, never in doc 2
    Retrieval.phraseSearch(docs, "doc_id", "text", Seq("go", "go"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq shouldBe Seq((1L, 2L))
  }

  "Retrieval.bigramLmFluency" should "score corpus-typical bigrams above word salad" in {
    val corpus = Seq(
      (1L, "the quick fox runs"),
      (2L, "the quick fox sleeps"),
      (3L, "the quick fox runs"),
      (4L, "runs sleeps the fox quick"), // same words, permuted → rare bigrams
      (5L, "x")) // one token → no bigrams
      .toDF("doc_id", "text")
    val r = Retrieval.bigramLmFluency(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    r(1L)._1 shouldBe 3L // n_bigrams = n_tokens - 1
    r(5L) shouldBe ((0L, 0L)) // sub-bigram doc scores 0 over 0
    r(1L)._2 should be > r(4L)._2 // typical order beats permuted
    r(1L)._2 shouldBe r(3L)._2 // identical docs score identically
  }

  "Retrieval.dsirImportance" should "weight target-like docs above off-target docs" in {
    val corpus = Seq(
      (1L, "alpha beta gamma alpha beta", "wiki"),
      (2L, "alpha beta gamma delta beta", "wiki"),
      (3L, "alpha beta gamma alpha beta", "web"), // looks like target
      (4L, "zeta eta theta iota kappa", "web"), // looks nothing like target
      (5L, "x", "web")) // no bigrams
      .toDF("doc_id", "text", "source")
    val r = Retrieval.dsirImportance(corpus, "doc_id", "text",
        isTarget = col("source") === "wiki", buckets = 1024)
      .as[(Long, Boolean, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    r(1L)._2 shouldBe true
    r(3L)._2 shouldBe false
    r(3L)._4 should be > r(4L)._4 // target-like web doc outranks off-target
    r(3L)._4 shouldBe r(1L)._4 // identical text → identical weight
    r(5L)._3 shouldBe 0L // no features
    r(5L)._4 shouldBe 0L
  }

  "Dedup.repeatedSpans" should "surface cross-document spans with exact df and occurrence counts" in {
    val corpus = Seq(
      (1L, "one two three four five tail a"),
      (2L, "head one two three four five"),
      (3L, "one two three four five one two three four five"), // span twice
      (4L, "nothing shared here at all today"))
      .toDF("doc_id", "text")
    val r = Dedup.repeatedSpans(corpus, "doc_id", "text", n = 5, minDf = 2L, k = 10)
      .as[(String, Long, Long, Long)].collect()
    val top = r.find(_._1 == "one two three four five").get
    top._2 shouldBe 3L // df: docs 1, 2, 3
    top._3 shouldBe 4L // occurrences: 1 + 1 + 2
    top._4 shouldBe 1L // first containing doc
    r.head._1 shouldBe "one two three four five" // highest df sorts first
    all(r.map(_._2)) should be >= 2L // minDf respected
  }

  it should "keep surface form (no lowercasing) and drop sub-n docs" in {
    val corpus = Seq(
      (1L, "A B C D E"),
      (2L, "a b c d e"),
      (3L, "short doc"))
      .toDF("doc_id", "text")
    val r = Dedup.repeatedSpans(corpus, "doc_id", "text", n = 5, minDf = 1L, k = 10)
      .as[(String, Long, Long, Long)].collect()
    r.map(_._1).toSet shouldBe Set("A B C D E", "a b c d e") // case preserved
  }

  "Retrieval.rrfFuse" should "rank docs in both lists above single-list docs" in {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val sem = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("id", "rank")
    val r = Retrieval.rrfFuse(Seq(lex, sem), "id", "rank", k = 10)
      .as[(Long, Long, Long)].collect()
    val byId = r.map(t => t._1 -> t).toMap
    byId(10L)._3 shouldBe 2L // in both lists
    byId(20L)._3 shouldBe 2L
    byId(30L)._3 shouldBe 1L
    // exact integer contributions: 1e6//61, 1e6//62, 1e6//63
    byId(10L)._2 shouldBe (1000000L / 61 + 1000000L / 63)
    byId(30L)._2 shouldBe 1000000L / 63
    // two-list docs outrank every one-list doc here
    r.take(2).map(_._1).toSet shouldBe Set(10L, 20L)
  }

  it should "respect k with the (score desc, id) total order" in {
    val lex = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)).toDF("id", "rank")
    val r = Retrieval.rrfFuse(Seq(lex), "id", "rank", k = 2)
      .as[(Long, Long, Long)].collect()
    r.map(_._1) shouldBe Array(1L, 2L)
  }
}
