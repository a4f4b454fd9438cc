package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, md5}

/** Streaming near-dup detection: LSH band buckets as flatMapGroupsWithState
  * state, scored against prior members across micro-batches. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and keeps running"

  it should "flag near-dups across micro-batches and never a first arrival" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val flags = StreamingDedup.nearDupFlags(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", minEstimate = 0.5)
    val q = flags.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    def dups() = spark.sql(
      """SELECT doc_id, max(est) AS est,
        |  min(CASE WHEN match_id IS NOT NULL THEN match_id END) AS m
        |FROM sdedup GROUP BY doc_id HAVING max(est) >= 0.5""".stripMargin)
      .as[(Long, Double, Long)].collect().map(r => (r._1, r._3)).sorted.toSeq
    try {
      // batch 1: 1 and an unrelated doc — nothing to match against
      input.addData((1L, base), (4L, "completely different words entirely unrelated content here"))
      q.processAllAvailable()
      dups() shouldBe empty
      // batch 2: 2 = exact dup of 1 (est 1.0); still nothing for 4
      input.addData((2L, base))
      q.processAllAvailable()
      dups() shouldBe Seq((2L, 1L))
      // batch 3: 3 matches the earliest-inserted bucket member on ties
      input.addData((3L, base))
      q.processAllAvailable()
      dups() shouldBe Seq((2L, 1L), (3L, 1L))
    } finally q.stop()
  }

  it should "agree with batch minhashLsh on the flagged-duplicate set (same corpus, same cap)" in {
    // Parity contract: a doc is a flagged duplicate iff it shares a band
    // bucket (est >= min) with a LOWER-id doc. Batch expresses that as the
    // id_a < id_b pair list; streaming (fed in ascending id order) as
    // match_id != null. With the same cap, and buckets below the cap, the
    // two modes must flag exactly the same documents.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus: Seq[(Long, String)] = Seq(
      1L -> base,
      2L -> "an entirely different document about spark physical plans",
      3L -> base, // dup of 1
      4L -> (base + " with a small suffix appended"), // near-dup of 1
      5L -> "another unrelated text mentioning watermarks and state stores",
      6L -> base, // dup of 1/3
      7L -> "an entirely different document about spark physical plans", // dup of 2
      8L -> "completely unique third subject with no shared shingles at all")
    val cap = 16L // larger than any bucket: cap semantics never diverge

    val batchFlagged = graft.operators.Dedup.minhashLsh(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      numHashes = 8, shingleSize = 3, rowsPerBand = 2, minEstimate = 0.5,
      maxBucketSize = cap)
      .select("id_b").distinct().as[Long].collect().sorted.toSeq

    val input = MemoryStream[(Long, String)]
    val flags = StreamingDedup.nearDupFlags(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text",
      numHashes = 8, shingleSize = 3, rowsPerBand = 2, minEstimate = 0.5,
      maxBucketSize = cap.toInt)
    val q = flags.writeStream.format("memory").queryName("sdedup_parity")
      .outputMode("append").start()
    try {
      // three micro-batches, ascending ids: insertion order == id order
      corpus.grouped(3).foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
      }
      val streamFlagged = spark.sql(
        "SELECT DISTINCT doc_id FROM sdedup_parity WHERE match_id IS NOT NULL")
        .as[Long].collect().sorted.toSeq
      streamFlagged shouldBe batchFlagged
      batchFlagged should not be empty // the corpus must actually exercise dups
    } finally q.stop()
  }

  it should "still flag arrivals against a saturated bucket (cap keeps state bounded)" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val flags = StreamingDedup.nearDupFlags(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text",
      minEstimate = 0.5, maxBucketSize = 2)
    val q = flags.writeStream.format("memory").queryName("sdedup_cap")
      .outputMode("append").start()
    try {
      input.addData((1L to 10L).map(i => (i, base)): _*)
      q.processAllAvailable()
      // doc 1 is first (no match); 2..10 all flag against the bucket even
      // though only 2 signatures are retained
      val dup = spark.sql(
        "SELECT DISTINCT doc_id FROM sdedup_cap WHERE match_id IS NOT NULL")
        .as[Long].collect().sorted.toSeq
      dup shouldBe (2L to 10L)
    } finally q.stop()
  }

  it should "pin d31's consensus semantics in streaming mode (per-signal doc flags ≡ batch)" in {
    // The consensus shape: each signal flags docs independently, the merge
    // attributes per-signal agreement. Streaming replay (ascending id
    // order) of the two streamable signals — LSH band state + exact
    // content-hash state — must flag exactly the docs batch flags, signal
    // by signal, so per-doc n_signals matches too.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus: Seq[(Long, String)] = Seq(
      1L -> base,
      2L -> "an entirely different document about spark physical plans",
      3L -> base, // exact dup of 1 → both signals
      4L -> (base + " with a small suffix appended"), // near-dup only
      5L -> "an entirely different document about spark physical plans", // exact dup of 2
      6L -> "completely unique third subject with no shared shingles at all")
    val docs = corpus.toDF("doc_id", "text")

    // batch reference flags
    val batchMh = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text",
        numHashes = 8, shingleSize = 3, rowsPerBand = 2, minEstimate = 0.5,
        maxBucketSize = 16L)
      .select("id_b").distinct().as[Long].collect().toSet
    val hashes = docs.select(col("doc_id"),
      md5(graft.functions.GraftFunctions.normalizeText(col("text"))).as("content_hash"))
    val batchEx = graft.operators.Dedup.exact(docs, "doc_id", "text")
      .join(hashes, "content_hash")
      .filter(col("doc_id") =!= col("keep_id"))
      .select("doc_id").as[Long].collect().toSet

    val in1 = MemoryStream[(Long, String)]
    val in2 = MemoryStream[(Long, String)]
    val q1 = StreamingDedup.nearDupFlags(in1.toDS().toDF("doc_id", "text"),
        "doc_id", "text", minEstimate = 0.5)
      .writeStream.format("memory").queryName("cons_mh").outputMode("append").start()
    val q2 = StreamingDedup.exactDupFlags(in2.toDS().toDF("doc_id", "text"),
        "doc_id", "text")
      .writeStream.format("memory").queryName("cons_ex").outputMode("append").start()
    try {
      corpus.grouped(2).foreach { b =>
        in1.addData(b: _*); in2.addData(b: _*)
        q1.processAllAvailable(); q2.processAllAvailable()
      }
      val streamMh = spark.sql(
        "SELECT DISTINCT doc_id FROM cons_mh WHERE match_id IS NOT NULL")
        .as[Long].collect().toSet
      val streamEx = spark.sql(
        "SELECT DISTINCT doc_id FROM cons_ex WHERE match_id IS NOT NULL")
        .as[Long].collect().toSet
      streamMh shouldBe batchMh
      streamEx shouldBe batchEx
      // per-doc signal counts (the consensus merge) agree by implication,
      // but assert it explicitly on the merged frame
      val consensus = corpus.map(_._1).map { id =>
        id -> ((if (streamMh(id)) 1 else 0) + (if (streamEx(id)) 1 else 0))
      }.toMap
      consensus(3L) shouldBe 2 // both signals
      consensus(4L) shouldBe 1 // near-dup only
      consensus(5L) shouldBe 2 // exact dup (and LSH catches exact dups too)
      consensus(1L) shouldBe 0 // keepers are never flagged
      batchEx should not be empty
    } finally { q1.stop(); q2.stop() }
  }

  it should "flag span occurrences prefix-causally and never the first-doc occurrence" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val shared = "one two three four five six seven eight"
    val input = MemoryStream[(Long, String)]
    val hits = StreamingDedup.spanDupFlags(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", n = 8)
    val q = hits.writeStream.format("memory").queryName("spans")
      .outputMode("append").start()
    def dupPositions() = spark.sql(
      "SELECT doc_id, pos FROM spans WHERE dup ORDER BY doc_id, pos")
      .as[(Long, Long)].collect().toSeq
    try {
      // batch 1: doc 1 carries the span (first ever), doc 1 repeats it
      // INTRA-doc later — same doc, must not fire
      input.addData((1L, s"$shared tail $shared"))
      q.processAllAvailable()
      dupPositions() shouldBe empty
      // batch 2: doc 2 repeats the span → its occurrence (pos 2) fires;
      // doc 1's earlier emissions are history and stay unflagged (the
      // prefix-causal difference from batch trim, documented)
      input.addData((2L, s"p q $shared"))
      q.processAllAvailable()
      dupPositions() shouldBe Seq((2L, 2L))
      // batch 3: doc 3 = doc 2's full text → every complete window fires
      // (all its grams now have a prior occurrence from another doc)
      input.addData((3L, s"p q $shared"))
      q.processAllAvailable()
      dupPositions() shouldBe Seq((2L, 2L), (3L, 0L), (3L, 1L), (3L, 2L))
      // coverage rollup outside the stateful stage ≡ batch coverage math
      val covered = spark.sql(
        """SELECT doc_id, count(DISTINCT p) AS c FROM (
          |  SELECT doc_id, explode(sequence(pos, pos + 7)) AS p
          |  FROM spans WHERE dup) GROUP BY doc_id ORDER BY doc_id""".stripMargin)
        .as[(Long, Long)].collect().toSeq
      covered shouldBe Seq((2L, 8L), (3L, 10L))
    } finally q.stop()
  }
}
