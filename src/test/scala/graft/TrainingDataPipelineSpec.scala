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
}
