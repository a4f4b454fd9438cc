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
}
