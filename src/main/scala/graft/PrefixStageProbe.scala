package graft

import graft.core.{Par, Tables}

import graft.functions.GraftFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r15 probe: sub-stage timing inside d19's candidate stage (sets build vs
  * prefix build vs self-join), mirroring Dedup.prefixFilterCandidates
  * stage by stage as of the r15 baseline. Decomposition that motivated the
  * native wordNgramHashSet sets build: sets 2.5 s / prefix 1.4 s /
  * join+distinct 1.3 s warm at sf0.1 — the interpreted HOF sets build was
  * the dominant stage. Kept as evidence (the D19Probe pattern). */
object PrefixStageProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val tNum = 1L; val tDen = 2L
    for (round <- 1 to 2) {
      println(s"--- pass $round")
      val docs = Tables.documents(spark, d)
      val sets = time("sets checkpoint") {
        Par.fanOut(docs)
          .select(col("doc_id").as("doc"), col("lang"),
            hashedSet(wordNgrams(tokens(col("text")), 2)).as("ts"))
          .withColumn("sz", size(col("ts")).cast("long"))
          .filter(col("sz") > 0L)
          .localCheckpoint(true)
      }
      val exploded = sets.select(col("doc"), col("sz"), col("lang"),
        explode(col("ts")).as("h"))
      val dfreq = exploded.groupBy("h").agg(count(lit(1)).as("df"))
      val prefix = time("prefix checkpoint") {
        exploded.join(dfreq, "h")
          .withColumn("rn",
            row_number().over(Window.partitionBy("doc").orderBy(col("df"), col("h")))
              .cast("long"))
          .filter(col("rn") <= col("sz") - expr(s"(sz * $tNum + ${tDen - 1}) div $tDen") + 1L)
          .select(col("h"), col("lang"), col("doc"), col("sz"), col("rn"))
          .localCheckpoint(true)
      }
      val alpha = (lit(tNum) * (col("na") + col("nb")) + lit(tNum + tDen - 1L))
      val cand = prefix.select(col("h"), col("lang"),
          col("doc").as("id_a"), col("sz").as("na"), col("rn").as("ra"))
        .join(prefix.select(col("h"), col("lang"),
          col("doc").as("id_b"), col("sz").as("nb"), col("rn").as("rb")),
          Seq("h", "lang"))
        .filter(col("id_a") < col("id_b") &&
          col("na") * tNum <= col("nb") * tDen &&
          col("nb") * tNum <= col("na") * tDen &&
          least(col("na") - col("ra"), col("nb") - col("rb")) + 1L >=
            call_function("div", alpha, lit(tNum + tDen)))
        .select("id_a", "id_b")
      time("self-join raw count")(println("raw=" + cand.count()))
      time("self-join distinct count")(println("cand=" + cand.distinct().count()))
    }
    spark.stop()
  }
}
