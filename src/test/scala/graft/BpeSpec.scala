package graft

import graft.operators.Bpe
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** BPE merge learning: greedy left-to-right merge application (the
  * overlapping-run case), deterministic tie-breaks, the word-type filter,
  * and the compression audit identity. */
class BpeSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  "Bpe.learn" should "pick the heaviest pair and apply it greedily left-to-right" in {
    // corpus: "aaa" x2, "ab" x3 → pair weights: (a,a)=4 (two positions in
    // each "aaa"), (a,b)=3 → round 1 merges (a,a); "aaa" → <aa><a> (greedy,
    // NOT <a><aa>), so round 2 sees (aa,a)=2 and (a,b)=3 → merges (a,b)
    val docs = Seq.fill(2)("aaa").map(t => (t, t)) ++ Seq.fill(3)("ab").map(t => (t, t))
    val df = docs.toDF("doc_id", "text")
    val (merges, t0, fin) = Bpe.learn(spark, df, rounds = 2)
    val m = merges.orderBy("round").collect()
    (m(0).getString(1), m(0).getString(2), m(0).getLong(4)) shouldBe ("a", "a", 4L)
    (m(1).getString(1), m(1).getString(2), m(1).getLong(4)) shouldBe ("a", "b", 3L)
    val seqs = fin.orderBy("seq").collect().map(r => (r.getString(0), r.getLong(1)))
    seqs should contain allOf (("<aa><a>", 2L), ("<ab>", 3L))
    t0.count() shouldBe 2L
  }

  it should "break weight ties on the lexicographically smallest pair" in {
    // "xy" and "ab" once each: (a,b)=1, (x,y)=1 → (a,b) wins round 1
    val df = Seq(("1", "xy ab")).toDF("doc_id", "text")
    val (merges, _, _) = Bpe.learn(spark, df, rounds = 1)
    val m = merges.collect()(0)
    (m.getString(1), m.getString(2), m.getString(3)) shouldBe ("a", "b", "ab")
  }

  it should "drop non-alphabetic and over-long words by definition" in {
    val df = Seq(("1", "ok a1b " + ("z" * 20))).toDF("doc_id", "text")
    Bpe.wordTypes(df, maxWordLen = 16).collect().map(_.getString(0)) shouldBe
      Array("<o><k>")
  }

  "Bpe.compressionAudit" should "report the exact symbol-mass ratio" in {
    val df = Seq(("1", "aaa aaa ab ab ab")).toDF("doc_id", "text")
    val (_, t0, fin) = Bpe.learn(spark, df, rounds = 2)
    val a = Bpe.compressionAudit(t0, fin).collect()(0)
    // base: 2*3 + 3*2 = 12 symbols; after (a,a),(a,b): 2*2 + 3*1 = 7
    (a.getLong(0), a.getLong(2), a.getLong(3)) shouldBe (2L, 12L, 7L)
    a.getLong(4) shouldBe (7L * 1000000L) / 12L
  }
}
