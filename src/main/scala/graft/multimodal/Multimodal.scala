package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `BinaryType` payloads + a typed metadata struct; decode /
  * feature-extraction runs distributed via `mapPartitions` over Rows in
  * batches (the Scala analogue of `mapInPandas`: per-partition batch
  * iteration, explicit output schema, no driver collect). The actual codec
  * call is STUBBED — media libraries are not in this container — behind
  * `decodeStub`, which derives deterministic pseudo-features from the raw
  * bytes so the Spark-side plumbing (schema, batching, partitioning) is real
  * and testable end-to-end.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("content_md5", StringType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("size_bytes", LongType, nullable = false),
    StructField("first_byte", IntegerType, nullable = false),
    StructField("byte_sum_mod", LongType, nullable = false)))

  /** Attach a binary payload column + metadata struct derived from a text
    * column (deterministic fake media: the UTF-8 bytes stand in for an
    * encoded image). Plumbing is identical to real media ingestion. */
  def withPayload(df: DataFrame, textCol: String, kind: String = "image/fake"): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit(kind).as("kind"),
        octet_length(col("payload")).cast("long").as("size_bytes"),
        md5(col("payload")).as("content_md5")))

  /** STUB decode: where a real pipeline would decode the image and extract
    * features (resize, embed, frame-sample), we emit deterministic
    * byte-level features. Runs as distributed mapPartitions in row batches
    * — swap `stubFeatures` for a real codec without touching the plumbing. */
  def decodeFeatures(df: DataFrame, idCol: String, batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(
      StructField("id", LongType, nullable = false) +: featureSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long"), col("payload"))
      .mapPartitions { iter =>
        // batch the partition like an arrow-batched UDF would
        iter.grouped(batchSize).flatMap { batch =>
          batch.map { row =>
            val bytes = row.getAs[Array[Byte]](1)
            val (fb, sum) = stubFeatures(bytes)
            Row(row.getLong(0), bytes.length.toLong, fb, sum)
          }
        }
      }(enc)
  }

  /** Frame sampling — the video-shaped multimodal op: slice the decoded
    * buffer into fixed-size frames and keep every `stride`-th one, emitting
    * (id, frame_idx, frame fingerprint). The stub "decoded buffer" is the
    * document text (characters stand in for frame bytes so the SQL oracle
    * slices identically); a real build swaps in the decoder's byte buffer
    * and an embedder in place of md5. Scale shape: explode of a per-row
    * index sequence + codegen'd substring/md5 — row-local, no shuffle, and
    * the sampled-frame row count is input/stride, never the full frame
    * count. */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      bufCol: String,
      frameChars: Int = 16,
      stride: Int = 4): DataFrame = {
    require(frameChars > 0 && stride > 0, "frameChars and stride must be positive")
    // exact: length < 2^26 chars, so the double quotient floors exactly
    val nFrames = floor(length(col(bufCol)) / frameChars.toDouble).cast("long")
    df.filter(nFrames > 0)
      .select(col(idCol), col(bufCol).as("_buf"),
        explode(sequence(lit(0L), nFrames - 1L, lit(stride.toLong))).as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        md5(col("_buf").substr(
          (col("frame_idx") * frameChars + 1L).cast("int"), lit(frameChars))).as("frame_md5"))
  }

  /** Cross-media duplicate frames — the multimodal analogue of exact text
    * dedup (`Dedup.exact`): sampled-frame fingerprints grouped corpus-wide;
    * fingerprints seen in at least `minDocs` distinct media are reported
    * with their canonical first occurrence (lexicographically smallest
    * (media id, frame index), carried as the single long
    * `id·2²⁰ + frameIdx` so the min is one comparable value on any engine —
    * frame indices stay under 2²⁰ for any sub-16M-char buffer).
    *
    * Scale shape: the only shuffle is the partial-agg'd groupBy on the
    * 128-bit fingerprint; sampled frames are input/stride rows, and the
    * output is only the (rare) duplicated fingerprints. */
  def duplicateFrames(
      df: DataFrame,
      idCol: String,
      bufCol: String,
      frameChars: Int = 16,
      stride: Int = 4,
      minDocs: Long = 2L): DataFrame = {
    val packed = col(idCol) * lit(1L << 20) + col("frame_idx")
    sampleFrames(df, idCol, bufCol, frameChars, stride)
      .groupBy("frame_md5")
      .agg(
        countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_frames"),
        min(packed).as("first_packed"))
      .filter(col("n_docs") >= minDocs)
      .select(col("frame_md5"), col("n_docs"), col("n_frames"),
        expr(s"first_packed div ${1L << 20}").as("first_doc"),
        (col("first_packed") % (1L << 20)).as("first_idx"))
  }

  /** Near-duplicate MEDIA via sampled-frame fingerprint overlap — the
    * video/audio analogue of document near-dup: two media are candidates
    * when they share ≥1 sampled frame fingerprint, scored by the overlap
    * coefficient |A∩B| / min(|A|,|B|) in exact ppm (containment-style, so
    * a clip embedded in a longer reel still scores high — the d10 rule).
    *
    * Scale shape: the pair space is generated ONLY through shared
    * fingerprints whose document frequency is in [2, maxFrameDf] — unique
    * frames pair nothing and boilerplate frames (intros/color bars) are
    * excluded BY DEFINITION (df > maxFrameDf, the d13/capBuckets rule,
    * mirrored in the oracle), so candidate volume is bounded by
    * Σ_capped df² — never media². One fingerprint-keyed shuffle plus two
    * size joins. */
  def mediaNearDup(
      df: DataFrame,
      idCol: String,
      bufCol: String,
      frameChars: Int = 16,
      stride: Int = 4,
      maxFrameDf: Long = 64L,
      minOverlapPpm: Long = 0L): DataFrame = {
    require(maxFrameDf >= 2, "maxFrameDf must be >= 2")
    val frames = sampleFrames(df, idCol, bufCol, frameChars, stride)
      .select(col(idCol).as("id"), col("frame_md5").as("h"))
      .distinct().localCheckpoint(true)
    val sizes = frames.groupBy("id").agg(count(lit(1)).as("nf"))
    val fdf = frames.groupBy("h").agg(count(lit(1)).as("df"))
    val shared = frames.join(fdf, "h")
      .filter(col("df") >= 2L && col("df") <= maxFrameDf)
      .select("id", "h")
    val pairs = shared.select(col("id").as("id_a"), col("h"))
      .join(shared.select(col("id").as("id_b"), col("h")), "h")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("id").as("id_a"), col("nf").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("nf").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("inter"), col("na"), col("nb"),
        // div class (c): a pair row implies both media have >= 1 distinct
        // frame, so least(na, nb) >= 1 structurally
        expr("(inter * 1000000) div least(na, nb)").as("overlap_ppm"))
      .filter(col("overlap_ppm") >= minOverlapPpm)
  }

  /** TEMPORAL ALIGNMENT of near-duplicate media — the clip-offset
    * detector: for every [[mediaNearDup]] candidate pair, the frame shift
    * that aligns the most shared fingerprints (is B the same footage as A
    * offset by k frames — a re-posted clip with an added intro?).
    *
    * Each fingerprint votes with its FIRST occurrence per media (min
    * frame index — the canonical-occurrence rule: a within-media repeated
    * frame would otherwise vote with its full multiplicity PRODUCT across
    * the pair), shift = first(B) − first(A), and the winning shift is the
    * winnowing packed-max `n·2²¹ + (2²⁰ − shift)` — most aligned frames,
    * smallest signed shift on ties, one comparable BIGINT (frame indices
    * stay under 2²⁰ for any sub-16M-char buffer, the duplicateFrames
    * bound). Returns (id_a, id_b, n_aligned, best_shift).
    *
    * Scale shape: alignment frames (stride 1) are computed ONLY for media
    * that appear in a candidate pair (semi-join); per-pair work is its
    * shared-fingerprint count — the pair set itself is df-cap-bounded by
    * [[mediaNearDup]]. */
  def alignMedia(
      df: DataFrame,
      idCol: String,
      textCol: String,
      frameChars: Int = 16,
      candStride: Int = 4,
      maxFrameDf: Long = 64L,
      minOverlapPpm: Long = 100000L): DataFrame = {
    val cand = mediaNearDup(df, idCol, textCol, frameChars, candStride,
        maxFrameDf, minOverlapPpm)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    val ids = cand.select(col("id_a").as("__aid"))
      .unionAll(cand.select(col("id_b").as("__aid"))).distinct()
    val docs = df.join(ids, col(idCol) === col("__aid"), "left_semi")
    // checkpoint: BOTH join sides of `matches` read this frame (it was
    // recomputed twice before — r12 review), and the packing guard below
    // aggregates it a third time; the frame is candidate-bounded
    val fo = sampleFrames(docs, idCol, textCol, frameChars, stride = 1)
      .groupBy(col(idCol).as("fid"), col("frame_md5").as("h"))
      .agg(min(col("frame_idx")).as("fi"))
      .localCheckpoint(true)
    // sweep class (b): the packed-max n·2²¹ + (2²⁰ − shift) needs every
    // frame index (hence |shift|) under 2²⁰ — enforced on the aggregated
    // first-occurrence frame (one tiny agg over the checkpoint, not a
    // second corpus scan) instead of silently mis-electing on a
    // ≥ ~16.8M-char buffer
    val maxFi = fo.agg(max(col("fi"))).head()
    if (!maxFi.isNullAt(0)) require(
      maxFi.getLong(0) < (1L << 20),
      s"alignMedia: media must stay under 2^20 frames " +
        s"(${(1L << 20) * frameChars} chars at frameChars=$frameChars); " +
        s"saw frame index ${maxFi.getLong(0)}")
    val matches = cand
      .join(fo.select(col("fid").as("id_a"), col("h"), col("fi").as("fa")),
        Seq("id_a"))
      .join(fo.select(col("fid").as("id_b"), col("h"), col("fi").as("fb")),
        Seq("id_b", "h"))
      .select(col("id_a"), col("id_b"), (col("fb") - col("fa")).as("shift"))
    matches.groupBy("id_a", "id_b", "shift")
      .agg(count(lit(1)).as("n"))
      .groupBy("id_a", "id_b")
      .agg(max(col("n") * lit(1L << 21) +
        (lit(1L << 20) - col("shift"))).as("pk"))
      // pk div/mod by the 2^21 constant: sweep class (b)
      .select(col("id_a"), col("id_b"),
        expr(s"pk div ${1L << 21}").as("n_aligned"),
        (lit(1L << 20) - (col("pk") % lit(1L << 21))).as("best_shift"))
  }

  /** SHOT-BOUNDARY segmentation — the video analogue of session islands:
    * a per-frame scalar "scene level" (STUB: the code point of the frame
    * window's first character — a real build plugs a decoded frame
    * histogram distance here), a CUT wherever the level jumps by more
    * than `cutThreshold` between consecutive frames, shots = maximal
    * cut-free runs (gaps-and-islands over the frame sequence). One row
    * per media: n_frames, n_shots, longest_shot.
    *
    * Scale shape: frames explode row-locally (length/frameChars rows per
    * media); the only exchange is the media-keyed window — millions of
    * media parallelize perfectly, and one media's frame sequence on one
    * task is the semantics' minimum. */
  def shotBoundaries(
      df: DataFrame,
      idCol: String,
      textCol: String,
      frameChars: Int = 16,
      cutThreshold: Int = 13): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(frameChars > 0 && cutThreshold >= 0,
      "frameChars must be positive, cutThreshold non-negative")
    // exact: length < 2^26 chars, so the double quotient floors exactly
    val nFrames = floor(length(col(textCol)) / frameChars.toDouble).cast("long")
    val w = Window.partitionBy(idCol).orderBy("fi")
    df.filter(nFrames > 0)
      .select(col(idCol), col(textCol).as("_t"),
        explode(sequence(lit(0L), nFrames - 1L)).as("fi"))
      .select(col(idCol), col("fi"),
        ascii(col("_t").substr((col("fi") * frameChars + 1L).cast("int"),
          lit(1))).as("lvl"))
      .withColumn("cut",
        when(abs(col("lvl") - lag(col("lvl"), 1).over(w)) > cutThreshold, 1L)
          .otherwise(0L))
      .withColumn("run",
        sum(col("cut")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("run")).agg(count(lit(1)).as("len"))
      .groupBy(col(idCol))
      .agg(sum(col("len")).as("n_frames"),
        (max(col("run")) + 1L).as("n_shots"),
        max(col("len")).as("longest_shot"))
  }

  /** The stub "codec": first code point + code-point sum mod 1e9+7, decoded
    * from the UTF-8 payload. Code points (not raw bytes) so the DuckDB
    * oracle — which can only iterate characters via `ascii(substr(...))` —
    * computes the identical value for non-ASCII text. A real build links an
    * image/audio decoder here instead. */
  private def stubFeatures(bytes: Array[Byte]): (Int, Long) = {
    if (bytes.isEmpty) (0, 0L)
    else {
      val s = new String(bytes, "UTF-8")
      var sum = 0L
      val it = s.codePoints().iterator()
      var first = -1
      while (it.hasNext) {
        val cp = it.nextInt()
        if (first < 0) first = cp
        sum = (sum + cp) % 1000000007L
      }
      (first, sum)
    }
  }
}
