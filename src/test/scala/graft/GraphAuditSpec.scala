package graft

import graft.operators.GraphAlgorithms
import org.apache.spark.sql.functions._

/** Guards for the partition-audit operators (modularity + conductance,
  * rich club) and the native ASCII-letter counter added this round. */
class GraphAuditSpec extends SparkSpec {
  import spark.implicits._

  /** Two triangles {1,2,3} and {4,5,6} joined by the bridge 3—4. */
  private def twoTriangles = {
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("src", "dst")
    und.union(und.select(col("dst").as("src"), col("src").as("dst")))
  }

  "GraphAlgorithms.modularityPpm" should "match the hand computation on two bridged triangles" in {
    // m = 7, m2 = 14; per triangle: intra2 = 6, d_c = 7, cut = 1
    // contrib = (6e6 div 14) - (49e6 div 196) = 428571 - 250000 = 178571
    // conductance = 1e6 div min(7, 14-7) = 142857
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("vertex", "label")
    val out = GraphAlgorithms.modularityPpm(twoTriangles, labels)
      .orderBy("label")
      .select("label", "n_vertices", "intra_edges", "degree_sum",
        "contrib_ppm", "cut_edges", "conductance_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    out shouldBe Array(
      (0L, 3L, 3L, 7L, 178571L, 1L, 142857L),
      (1L, 3L, 3L, 7L, 178571L, 1L, 142857L))
  }

  it should "report Q = 0 and zero conductance for the single-community partition" in {
    val labels = (1L to 6L).map((_, 0L)).toDF("vertex", "label")
    val out = GraphAlgorithms.modularityPpm(twoTriangles, labels)
      .select("contrib_ppm", "cut_edges", "conductance_ppm")
      .as[(Long, Long, Long)].collect()
    // intra2 = m2 = 14, d_c = 14: contrib = 1e6 - 1e6 = 0; no boundary;
    // the min(d, m2-d) = 0 denominator is clamped, not divided by
    out shouldBe Array((0L, 0L, 0L))
  }

  "GraphAlgorithms.richClubPpm" should "match the hand computation on K4 plus a pendant" in {
    // K4 on {1,2,3,4} + pendant edge 1—5: degrees 1→4, 2/3/4→3, 5→1
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L)).toDF("src", "dst")
    val out = GraphAlgorithms.richClubPpm(e, Seq(2L, 3L, 4L, 5L))
      .orderBy("k")
      .as[(Long, Long, Long, Long)].collect()
    out shouldBe Array(
      (2L, 4L, 6L, 1000000L), // the K4 is a perfect club
      (3L, 4L, 6L, 1000000L),
      (4L, 1L, 0L, 0L),       // one vertex: clamped denominator, 0 density
      (5L, 0L, 0L, 0L))       // empty club still emits its row
  }

  "AsciiAlphaCount" should "equal the regexp_replace spelling on seeded-random strings" in {
    // the repo's seeded Sampled idiom (no scalacheck-scalatest bridge in
    // the offline cache): letters, digits, whitespace, punctuation and
    // multi-byte unicode — continuation bytes must never count
    val rnd = new scala.util.Random(42)
    val alphabet = "azAZ09 \t._-éßλ文🎈"
    val samples = (Seq("", "abc", "ABC123", "no letters: 123 456!") ++
      (1 to 200).map { _ =>
        (0 until rnd.nextInt(40)).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString
      }).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val out = samples.toDF("id", "t")
      .select(
        call_function("graft_alpha_count", col("t")).as("native"),
        expr("CAST(length(regexp_replace(t, '[^a-zA-Z]', '')) AS BIGINT)")
          .as("regex"))
      .as[(Long, Long)].collect()
    out.foreach { case (native, regex) => native shouldBe regex }
  }
}
