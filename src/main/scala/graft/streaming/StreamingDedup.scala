package graft.streaming

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One emission per (document, band): the best prior match in that band's
  * bucket, or none. A document is near-dup iff ANY of its bands matched —
  * consumers take `max(est) group by doc_id` (kept outside the stateful
  * operator so the query stays a single stateful stage). */
case class BandMatch(doc_id: Long, match_id: Option[Long], est: Double)

/** Streaming near-duplicate detection — the streaming face of
  * `operators.Dedup.minhashLsh`.
  *
  * Batch LSH self-joins the banded corpus; unbounded streams can't
  * self-join without unbounded state. Instead the band buckets BECOME the
  * state: each (band, band-hash) group holds up to `maxBucketSize`
  * (docId, signature) entries via `flatMapGroupsWithState` (the same
  * per-key serialization the reference's getAndUpdate relies on,
  * KVStoreLocal.scala:413-464), and every arriving document is scored
  * against its bucket's prior members — O(bucket) work per (doc, band),
  * state bounded by cap × live buckets, no shuffle beyond the band key.
  *
  * The cap doubles as the degenerate-bucket guard (`Dedup.capBuckets`'s
  * streaming analogue): a boilerplate bucket saturates at `maxBucketSize`
  * members and further arrivals still get flagged against it (unlike the
  * batch cap, which drops the bucket entirely — streaming wants the
  * FLAG, batch wants the pair list pruned).
  *
  * Determinism: within a micro-batch each bucket processes its documents
  * in ascending id order; ties on estimate keep the earliest-inserted
  * member. */
object StreamingDedup {

  def nearDupFlags(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      shingleSize: Int = 3,
      rowsPerBand: Int = 2,
      minEstimate: Double = 0.5,
      maxBucketSize: Int = 64): Dataset[BandMatch] = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be divisible by rowsPerBand ($rowsPerBand)")
    val spark = docs.sparkSession
    import spark.implicits._
    val numBands = numHashes / rowsPerBand
    val banded = docs
      .select(col(idCol).cast("long").as("doc"),
        minhashSig(tokens(col(textCol)), numHashes, shingleSize).as("signature"))
      .filter(size(col("signature")) > 0)
      .select(col("doc"), col("signature"),
        posexplode(
          transform(
            sequence(lit(0), lit(numBands - 1)),
            b => md5(concat_ws("|",
              transform(slice(col("signature"), b * rowsPerBand + lit(1), lit(rowsPerBand)),
                x => x.cast("string"))))
          )).as(Seq("band", "band_hash")))
      .select(col("doc"), col("signature"),
        concat_ws(":", col("band"), col("band_hash")).as("bucket"))
      .as[(Long, Seq[Long], String)]

    banded
      .groupByKey(_._3)
      .flatMapGroupsWithState[Seq[Seq[Long]], BandMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) { (_, rows, state) =>
        // bucket state rows are (docId +: signature); insertion-ordered
        var bucket = state.getOption.getOrElse(Seq.empty)
        val out = Seq.newBuilder[BandMatch]
        rows.toSeq.sortBy(_._1).foreach { case (doc, sig, _) =>
          var bestId = Option.empty[Long]
          var bestEst = -1.0
          bucket.foreach { entry =>
            val pid = entry.head
            if (pid != doc) {
              val est = entry.tail.zip(sig).count(p => p._1 == p._2).toDouble / sig.size
              if (est > bestEst) { bestEst = est; bestId = Some(pid) }
            }
          }
          out += (bestId match {
            case Some(pid) if bestEst >= minEstimate => BandMatch(doc, Some(pid), bestEst)
            case _ => BandMatch(doc, None, 0.0)
          })
          if (bucket.size < maxBucketSize && !bucket.exists(_.head == doc))
            bucket = bucket :+ (doc +: sig)
        }
        state.update(bucket)
        out.result().iterator
      }
  }

  /** Streaming exact-dup detection — the streaming face of
    * `operators.Dedup.exact` and the second consensus signal (d31's
    * update-mode shape): each content-hash group keeps only the FIRST
    * (lowest-id) arrival as state, every later arrival is flagged against
    * it. State is one (hash → keeper id) entry per distinct content — the
    * compacted view, not the stream.
    *
    * Doc-level parity with batch (asserted by StreamingDedupSpec): the
    * flagged set ≡ `Dedup.exact(corpus).members − keepers` when arrival
    * order is id order (within a micro-batch the group processes ascending
    * ids, so replaying a changelog in id order reproduces batch exactly). */
  def exactDupFlags(
      docs: DataFrame,
      idCol: String,
      textCol: String): Dataset[ExactMatch] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc"),
        md5(normalizeText(col(textCol))).as("h"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, ExactMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) { (_, rows, state) =>
        var keeper = state.getOption.getOrElse(Long.MaxValue)
        val out = Seq.newBuilder[ExactMatch]
        rows.toSeq.sortBy(_._1).foreach { case (doc, _) =>
          if (keeper != Long.MaxValue && doc != keeper)
            out += ExactMatch(doc, Some(keeper))
          else out += ExactMatch(doc, None)
          if (doc < keeper) keeper = doc
        }
        state.update(keeper)
        out.result().iterator
      }
  }

  /** Streaming duplicated-span detection — the streaming face of
    * `operators.Dedup.duplicatedSpanCoverage`/`trimDuplicatedSpans`: an
    * n-gram occurrence is flagged iff a PRIOR occurrence of the same gram
    * from a DIFFERENT document has been seen (you can only trim against
    * history — the prefix-causal reading of the batch df ≥ 2 rule; batch
    * additionally drops EARLIER non-keeper occurrences once a later doc
    * repeats the gram, which no causal stream can know).
    *
    * State per gram is CONSTANT-size regardless of occurrence count:
    * (first doc seen, another-doc-seen flag) — "∃ prior occurrence from a
    * different doc" ⟺ another-doc-seen ∨ (first ≠ current). One shuffle on
    * the gram-hash key; consumers roll covered positions up per doc
    * outside the stateful stage (distinct `sequence(pos, pos+n-1)` —
    * exactly the batch coverage math).
    *
    * Determinism: within a micro-batch each gram group processes its
    * occurrences in ascending (doc, pos) order. */
  def spanDupFlags(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): Dataset[SpanHit] = {
    require(n > 0, "need n > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc"),
        posexplode(wordNgramList(col(textCol), n)).as(Seq("pos", "gram")))
      .select(col("doc"), col("pos").cast("long").as("pos"),
        md5Hash60(col("gram")).as("g"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[(Long, Boolean), SpanHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) { (_, rows, state) =>
        var (first, other) = state.getOption.getOrElse((Long.MinValue, false))
        val out = Seq.newBuilder[SpanHit]
        rows.toSeq.sortBy(r => (r._1, r._2)).foreach { case (doc, pos, _) =>
          val dup = other || (first != Long.MinValue && first != doc)
          out += SpanHit(doc, pos, dup)
          if (first == Long.MinValue) first = doc
          else if (first != doc) other = true
        }
        state.update((first, other))
        out.result().iterator
      }
  }
}

/** One emission per document from [[StreamingDedup.exactDupFlags]]: the
  * content group's keeper if this arrival is a duplicate, else none. */
case class ExactMatch(doc_id: Long, match_id: Option[Long])

/** One emission per n-gram occurrence from [[StreamingDedup.spanDupFlags]]:
  * `dup` = a prior occurrence of this gram from another doc exists. */
case class SpanHit(doc_id: Long, pos: Long, dup: Boolean)
