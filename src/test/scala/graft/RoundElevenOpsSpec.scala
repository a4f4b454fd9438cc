package graft

import graft.multimodal.Multimodal
import graft.operators.GraphAlgorithms
import org.apache.spark.sql.functions._

/** Guards for the round-11 session-4 operators: the resource-allocation
  * link-prediction index (hand graph, hub-cap rule) and shot-boundary
  * segmentation (hand frame sequence, first-frame/cut-free conventions). */
class RoundElevenOpsSpec extends SparkSpec {
  import spark.implicits._

  "resourceAllocationIndex" should "score non-adjacent pairs by sum of 1/deg over common neighbors" in {
    // path 1-2-3 plus square 1-4, 3-4: common neighbors of (1,3) are 2
    // (deg 2) and 4 (deg 2) → ra = 500000+500000; (2,4) share 1 and 3
    // (deg 2 each) → 1000000; adjacent pairs never appear
    val und = Seq((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L)).toDF("a", "b")
    val r = GraphAlgorithms.resourceAllocationIndex(und)
      .orderBy("a", "b")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    r shouldBe Array((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L))
  }

  it should "drop pairs reachable only through a hub above maxHubDegree" in {
    // star center 9 connects 1,2,3 (deg 3); with maxHubDegree = 2 the
    // leaves lose their only common neighbor → no predictions at all
    val und = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("a", "b")
    GraphAlgorithms.resourceAllocationIndex(und, maxHubDegree = 2L)
      .count() shouldBe 0L
    // and with the default cap the 3 leaf pairs score 1e6 div 3
    val full = GraphAlgorithms.resourceAllocationIndex(und)
      .orderBy("a", "b").collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(3)))
    full shouldBe Array((1L, 2L, 333333L), (1L, 3L, 333333L), (2L, 3L, 333333L))
  }

  "shotBoundaries" should "segment frames at level jumps > threshold, counting the first frame cut-free" in {
    // frameChars = 1 → every char is a frame; levels are the code points.
    // "aab" with threshold 0: cuts at frame 2 (a→b) only → 2 shots,
    // longest = 2; "az" threshold 13: |a−z| = 25 > 13 → 2 shots of 1
    val docs = Seq((1L, "aab"), (2L, "az"), (3L, "aa")).toDF("doc_id", "text")
    val r0 = Multimodal.shotBoundaries(docs, "doc_id", "text",
      frameChars = 1, cutThreshold = 0)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    r0 shouldBe Array((1L, 3L, 2L, 2L), (2L, 2L, 2L, 1L), (3L, 2L, 1L, 2L))
    val r13 = Multimodal.shotBoundaries(docs, "doc_id", "text",
      frameChars = 1, cutThreshold = 13)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(2)))
    r13 shouldBe Array((1L, 1L), (2L, 2L), (3L, 1L))
  }

  "alignMedia" should "recover the frame offset of a shifted copy" in {
    // doc 2 = a 1-frame intro + doc 1's footage: every shared fingerprint
    // votes shift +1; n_aligned = the 4 shared frames
    val a = "abcdefghijklmnop" + "qrstuvwxyzabcdef" +
      "ghijklmnopqrstuv" + "wxyzabcdefghijkl"
    val docs = Seq((1L, a), (2L, "zzzzzzzzzzzzzzzz" + a)).toDF("doc_id", "text")
    val r = Multimodal.alignMedia(docs, "doc_id", "text",
      frameChars = 16, candStride = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    r shouldBe Array((1L, 2L, 4L, 1L))
  }

  it should "drop media shorter than one frame and floor the frame count" in {
    // 16-char frames: a 15-char doc has no frame; a 33-char doc has 2
    val docs = Seq((1L, "a" * 15), (2L, "a" * 33)).toDF("doc_id", "text")
    val r = Multimodal.shotBoundaries(docs, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    r shouldBe Array((2L, 2L))
  }
}
