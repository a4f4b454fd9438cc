package graft

import graft.operators.GraphAlgorithms
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of q107_incremental_cc's scaling slope (VERDICT r10
  * #3): times the BASE connectedComponents, the delta/contraction tail,
  * and the full query separately, and reports the base edge count against
  * [[GraphAlgorithms.LocalEdgeThreshold]] — the hypothesis under test is
  * that the sf1 slope is the local-union-find → distributed large/small-
  * star PATH SWITCH (a step cost at the 1M-edge threshold), not
  * super-linear data work.
  *
  *   sbt "runMain graft.Q107Probe /root/testdata/sf0.1 /tmp/graft_sf1"
  */
object Q107Probe {
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
    spark.sparkContext.setLogLevel("WARN")
    val Jan1_00 = graft.queries.Support.Jan1_00
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (d <- dirs) {
      // the SAME edge builder the gated query uses — the probe cannot
      // drift from q107's definition
      val e = graft.queries.Support.q107EdgeLog(spark, d)
      val base = e.filter(col("odate_us") < lit(Jan1_00)).select("src", "dst")
      val delta = e.filter(col("odate_us") >= lit(Jan1_00)).select("src", "dst")
      val baseDistinct = base.filter(col("src") =!= col("dst")).distinct().count()
      // warm then best-of-2, mirroring ScaleProbe discipline
      def best2(f: => Long): (Long, Double) = {
        val (r1, t1) = time(f); val (_, t2) = time(f)
        (r1, math.min(t1, t2))
      }
      val (nBase, tBase) = best2(
        GraphAlgorithms.connectedComponents(spark, base).count())
      val (nFull, tFull) = best2(
        GraphAlgorithms.incrementalComponents(spark, base, delta).count())
      println(f"$d: base_edges_distinct=$baseDistinct " +
        f"(local_threshold=${GraphAlgorithms.LocalEdgeThreshold}, " +
        f"path=${if (baseDistinct <= GraphAlgorithms.LocalEdgeThreshold) "LOCAL" else "DISTRIBUTED"}) " +
        f"base_cc=$tBase%.2f s ($nBase vertices) " +
        f"full_incremental=$tFull%.2f s ($nFull vertices) " +
        f"delta_tail=${tFull - tBase}%.2f s")
    }
    spark.stop()
  }
}
