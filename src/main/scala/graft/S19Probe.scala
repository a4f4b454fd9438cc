package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition of s19_item_cosine's one-decade cost (VERDICT r11
  * #5 — the sf1 probe's heaviest row): times the rating/array build, the
  * item-norm aggregate, the in-array upper-triangle pair explode + dot
  * aggregate, and the final norm-join + TakeOrdered separately, at sf0.1
  * and the inflated sf1 dir — so PLANS.md can state which stage carries
  * the growth with numbers. Stage frames mirror Similarity.itemCosine's
  * internals verbatim (cap 40, k 20 — the s19 parameters).
  *
  *   sbt "runMain graft.S19Probe /root/testdata/sf0.1 /tmp/graft_sf1"
  */
object S19Probe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def best2(f: => Long): (Long, Double) = {
      val (r1, t1) = time(f); val (_, t2) = time(f)
      (r1, math.min(t1, t2))
    }

    for (d <- dirs) {
      // stage frames = itemCosine's internals with s19's inputs
      def ratings = graft.core.Tables.lineitem(spark, d)
        .join(graft.core.Tables.orders(spark, d),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("__u"), col("l_partkey").as("__i"))
        .agg(sum(round(col("l_quantity") * 100).cast("long")).as("__q"))
      def byUserF = ratings
        .groupBy("__u")
        .agg(sort_array(collect_list(struct(col("__i").as("i"),
          col("__q").as("q")))).as("iv"))
        .filter(size(col("iv")) <= 40L)

      val (nRatings, tRat) = best2(ratings.count())
      // second timed pass doubles as the checkpoint materialization (the
      // old shape ran the uncached build chain a THIRD time — r12 review)
      val (nUsers1, tb1) = time(byUserF.count())
      val tck = System.nanoTime()
      val byUser = byUserF.localCheckpoint(true)
      val nUsers = byUser.count()
      require(nUsers == nUsers1, s"build count drifted: $nUsers1 vs $nUsers")
      val tBuild = math.min(tb1, (System.nanoTime() - tck) / 1e9)
      val (nItems, tNorm) = best2(byUser.select(explode(col("iv")).as("e"))
        .groupBy(col("e.i")).agg(sum(col("e.q") * col("e.q"))).count())
      val (nPairs, tDots) = best2(byUser
        .select(col("iv"), posexplode(col("iv")).as(Seq("x", "a")))
        .select(col("a"), explode(expr("slice(iv, x + 2, size(iv) - x - 1)")).as("b"))
        .groupBy(col("a.i"), col("b.i"))
        .agg(sum(col("a.q") * col("b.q"))).count())
      val (_, tFull) = best2(
        SparkEntry.queries("s19_item_cosine")(spark, d).count())
      println(f"$d: ratings=$nRatings users_capped=$nUsers items=$nItems " +
        f"pair_groups=$nPairs ratings_agg=$tRat%.2f s build=$tBuild%.2f s " +
        f"norms=$tNorm%.2f s pair_dots=$tDots%.2f s full_query=$tFull%.2f s")
    }
    spark.stop()
  }
}
