package graft

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Stage decomposition for d19_prefix_join (r13 verdict #2): times the
  * candidate stage (prefix postings self-join + distinct) separately from
  * the full operator (fetch joins + merge-intersect verify), warm
  * best-of-2 each, so the "would a suffix filter pay?" question is
  * answered with data — the PPJoin+ suffix filter can only cut VERIFY
  * work (it needs both gram arrays, i.e. runs post-fetch), so its ceiling
  * is the verify-minus-candidate gap.
  *
  *   sbt "runMain graft.D19Probe /root/testdata/sf0.1"
  */
object D19Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args) {
      def time[A](f: => A): (Double, A) = {
        val t0 = System.nanoTime(); val a = f
        ((System.nanoTime() - t0) / 1e9, a)
      }
      def best2[A](f: => A): (Double, A) = {
        val (t1, _) = time(f); val (t2, a) = time(f)
        (math.min(t1, t2), a)
      }
      val docs = Tables.documents(spark, d)
      val (tCand, nCand) = best2 {
        val (_, cand) = Dedup.prefixFilterCandidates(docs, "doc_id", "text",
          tNum = 1L, tDen = 2L, blockCols = Seq("lang"))
        cand.count()
      }
      val (tRaw, nRaw) = best2 {
        val (_, cand) = Dedup.prefixFilterCandidates(docs, "doc_id", "text",
          tNum = 1L, tDen = 2L, blockCols = Seq("lang"),
          dedupeCandidates = false)
        cand.count()
      }
      println(f"$d raw=$nRaw t_raw=$tRaw%.2fs (distinct shuffle cost = " +
        f"${tCand - tRaw}%.2fs over ${nCand.toDouble}%.0f rows)")
      val (tFull, nVer) = best2 {
        Dedup.prefixFilterJaccard(docs, "doc_id", "text",
          tNum = 1L, tDen = 2L, blockCols = Seq("lang")).count()
      }
      println(f"$d cand=$nCand verified=$nVer t_cand=$tCand%.2fs " +
        f"t_full=$tFull%.2fs verify_share=${(tFull - tCand) / tFull}%.2f")
    }
    spark.stop()
  }
}
