package graft

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Empirical candidate-growth probe for d19_prefix_join (the suite's most
  * expensive query): counts the EXACT candidate set the operator verifies
  * (via Dedup.prefixFilterCandidates — same code path, never a
  * re-implementation) at each given sf dir, plus the surviving verified
  * pairs. The committed curve lives in PLANS.md's d19 entry; re-run with
  *
  *   sbt "runMain graft.CandidateProbe /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1"
  */
object CandidateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args) {
      val docs = Tables.documents(spark, d)
      val nDocs = docs.count()
      val (_, cand) = Dedup.prefixFilterCandidates(docs, "doc_id", "text",
        tNum = 1L, tDen = 2L, blockCols = Seq("lang"))
      val nCand = cand.count()
      val nVerified = Dedup.prefixFilterJaccard(docs, "doc_id", "text",
        tNum = 1L, tDen = 2L, blockCols = Seq("lang")).count()
      println(s"$d docs=$nDocs candidates=$nCand verified=$nVerified " +
        f"cand_per_doc=${nCand.toDouble / nDocs}%.2f")
    }
    spark.stop()
  }
}
