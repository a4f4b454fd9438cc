package graft

import graft.operators._
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  "RangeJoin.pointInInterval" should "match the theta-join result exactly" in {
    val points = Seq(5L, 10L, 25L, 99L, 100L, 101L, 250L).toDF("p")
    val intervals = Seq(
      (1L, 0L, 10L),    // includes 5, 10 (both bounds inclusive)
      (2L, 10L, 100L),  // includes 10, 25, 99, 100
      (3L, 150L, 140L), // empty (end < start) — must vanish, not crash
      (4L, 200L, 300L)) // includes 250
      .toDF("iv", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", bucketWidth = 7L)
      .select("iv", "p").as[(Long, Long)].collect().sorted.toSeq
    val expected = Seq((1L, 5L), (1L, 10L), (2L, 10L), (2L, 25L), (2L, 99L), (2L, 100L), (4L, 250L))
    got shouldBe expected
  }

  it should "produce exactly one row per (point, interval) even when an interval spans many buckets" in {
    val points = Seq(50L).toDF("p")
    val intervals = Seq((1L, 0L, 1000L)).toDF("iv", "s", "e") // spans 101 buckets at width 10
    RangeJoin.pointInInterval(points, intervals, "p", "s", "e", bucketWidth = 10L)
      .count() shouldBe 1L
  }

  "RangeJoin.intervalOverlap" should "match the theta-join result exactly (brute-force sweep)" in {
    // deterministic pseudo-random interval sets; compare against the plain
    // quadratic join at several bucket widths, including widths far off the
    // typical interval length (correctness must not depend on tuning)
    def mk(seed: Long, n: Int) = (0 until n).map { i =>
      val s = (seed * (i + 1) * 2654435761L % 500L + 500L) % 500L
      (seed * 100 + i, s, s + (seed + i * 7) % 60L)
    }
    val a = mk(3, 40).toDF("a_key", "a_start", "a_end")
    val b = mk(5, 50).toDF("b_key", "b_start", "b_end")
    val brute = a.join(b, col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select("a_key", "b_key").as[(Long, Long)].collect().sorted.toSeq
    for (w <- Seq(7L, 64L, 1000L)) {
      RangeJoin.intervalOverlap(a, b, "a_start", "a_end", "b_start", "b_end", w)
        .select("a_key", "b_key").as[(Long, Long)].collect().sorted.toSeq shouldBe brute
    }
  }

  it should "join only within keys when keys are given, and drop reversed intervals" in {
    val a = Seq(("u1", 1L, 0L, 10L), ("u2", 2L, 0L, 10L), ("u1", 3L, 50L, 40L))
      .toDF("u", "a_key", "a_start", "a_end")
    val b = Seq(("u1", 9L, 5L, 15L), ("u2", 8L, 100L, 110L))
      .toDF("u", "b_key", "b_start", "b_end")
    RangeJoin.intervalOverlap(a, b, "a_start", "a_end", "b_start", "b_end",
        bucketWidth = 10L, keys = Seq("u"))
      .select("a_key", "b_key").as[(Long, Long)].collect().toSeq shouldBe Seq((1L, 9L))
  }
}

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "red bolt"), (2L, "red bolts"), (3L, "blue bolt"),
    (4L, "green gear"), (5L, "green gears"))
    .toDF("id", "name")

  "FuzzyJoin.editDistancePairs" should "find pairs within the distance that share a token" in {
    val pairs = FuzzyJoin.editDistancePairs(rows, "id", "name", maxDistance = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().sorted.toSeq
    pairs shouldBe Seq((1L, 2L, 1), (4L, 5L, 1)) // "blue"/"red" differ by 3+ edits? 1-3: dist 4
  }

  it should "generate no candidates through tokens above maxTokenDf" in {
    // every name shares the token "x"; capping df at 2 kills that block
    val all = Seq((1L, "x aa"), (2L, "x ab"), (3L, "x ac")).toDF("id", "name")
    FuzzyJoin.editDistancePairs(all, "id", "name", maxDistance = 3, maxTokenDf = 2)
      .count() shouldBe 0L
    FuzzyJoin.editDistancePairs(all, "id", "name", maxDistance = 3)
      .count() shouldBe 3L
  }
}

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  "GraphAlgorithms.pageRankPpm" should "give symmetric vertices equal ranks and sinks the teleport floor" in {
    // a <-> b (symmetric pair), c -> a (c is a source, dangling-in only).
    // 30 iterations: the a↔b 2-cycle oscillates with period 2 (damped by
    // 0.7225 per round trip), so enough rounds must pass for the steady
    // state (a ≈ 1.462e6 > b ≈ 1.393e6) to dominate the oscillation.
    val edges = Seq(("a", "b"), ("b", "a"), ("c", "a")).toDF("src", "dst")
    val r = GraphAlgorithms.pageRankPpm(spark, edges, iterations = 30)
      .as[(String, Long)].collect().toMap
    r("c") shouldBe 150000L // no in-edges: pure teleport term
    r("a") should be > r("b") // a additionally receives c's contribution
    r("b") should be > r("c")
  }

  it should "be invariant to input partitioning (deterministic integer algebra)" in {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")).toDF("src", "dst")
    val r1 = GraphAlgorithms.pageRankPpm(spark, edges, iterations = 8)
      .as[(String, Long)].collect().toMap
    val r2 = GraphAlgorithms.pageRankPpm(spark, edges.repartition(7), iterations = 8)
      .as[(String, Long)].collect().toMap
    r1 shouldBe r2
  }

  it should "compute identical ranks from the local and distributed paths" in {
    val edges = (Seq(("a", "b"), ("b", "a"), ("c", "a"), ("c", "b"), ("d", "c")) ++
      (1 to 20).map(i => (s"x$i", s"x${i % 20 + 1}"))).toDF("src", "dst")
    def ranks(localThreshold: Long) =
      GraphAlgorithms.pageRankPpm(spark, edges, iterations = 12,
        localThreshold = localThreshold)
        .as[(String, Long)].collect().toMap
    ranks(Long.MaxValue) shouldBe ranks(0L) // union of exact integer paths
  }

  it should "compute identical SEEDED ranks from the local and distributed paths" in {
    val edges = (Seq(("a", "b"), ("b", "a"), ("c", "a"), ("c", "b"), ("d", "c")) ++
      (1 to 20).map(i => (s"x$i", s"x${i % 20 + 1}"))).toDF("src", "dst")
    def ranks(localThreshold: Long) =
      GraphAlgorithms.pageRankPpm(spark, edges, iterations = 12,
        localThreshold = localThreshold,
        seeds = Some(Seq("a", "d").toDF("vertex")))
        .as[(String, Long)].collect().toMap
    val local = ranks(Long.MaxValue)
    local shouldBe ranks(0L) // the seeded vInd arithmetic, both paths
    // restart mass reaches only the seeds; x-ring vertices are unreachable
    // from them and must decay to 0
    local("x5") shouldBe 0L
    local("a") should be > 0L
  }

  it should "converge ring graphs to uniform rank" in {
    val ring = (0 until 6).map(i => (s"v$i", s"v${(i + 1) % 6}")).toDF("src", "dst")
    val r = GraphAlgorithms.pageRankPpm(spark, ring, iterations = 20)
      .as[(String, Long)].collect().toMap
    r.values.toSet.size shouldBe 1 // perfectly symmetric → identical ranks
  }
}
