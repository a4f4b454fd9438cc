package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  "Layout.zValue" should "interleave bits exactly (x even, y odd)" in {
    val df = Seq((3L, 5L), (0L, 0L), (7L, 0L), (0L, 7L), (1023L, 1023L))
      .toDF("x", "y")
    val r = df.select(col("x"), col("y"),
        Layout.zValue(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    r((0L, 0L)) shouldBe 0L
    r((3L, 5L)) shouldBe 39L // x=011,y=101 → 100111
    r((7L, 0L)) shouldBe 21L // 010101
    r((0L, 7L)) shouldBe 42L // 101010
    r((1023L, 1023L)) shouldBe (1L << 20) - 1
  }

  it should "agree with its SQL rendering" in {
    val df = (0 until 200).map(i => (i.toLong * 37 % 1024, i.toLong * 91 % 1024))
      .toDF("x", "y")
    df.createOrReplaceTempView("zv")
    val scala = df.select(Layout.zValue(col("x"), col("y"), 10).as("z"))
      .as[Long].collect().sorted
    val sql = spark.sql(s"SELECT ${Layout.zValueSql("x", "y", 10)} AS z FROM zv")
      .as[Long].collect().sorted
    scala shouldBe sql
  }

  "Layout.zOrderStats" should "bound both dimensions within each partition" in {
    // full 32×32 grid, 5-bit coords, 16 partitions: pid = top 4 z-bits
    // (y4 x4 y3 x3) → every partition is an 8×8 tile — BOTH dims tight,
    // unlike a single-column sort (one dim tight, other full-width)
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val stats = Layout.zOrderStats(grid, col("x"), col("y"), bits = 5, partitions = 16)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    stats should have length 16
    stats.map(_._2).sum shouldBe 1024L // every row lands somewhere
    stats.foreach { case (_, n, xmin, xmax, ymin, ymax) =>
      n shouldBe 64L
      (xmax - xmin) shouldBe 7L // exact 8×8 tile on BOTH dims
      (ymax - ymin) shouldBe 7L
    }
  }

  "Layout.sketchRangeStats" should "produce ordered non-overlapping near-equal ranges" in {
    // skewed domain (quadratic growth) — exactly where naive equal-width
    // ranges fail and quantile bounds shine
    val df = spark.range(10000L)
      .select(call_function("div", col("id") * col("id"), lit(1000L)).as("v"))
    val stats = Layout.sketchRangeStats(df, col("v"), numPartitions = 8, s = 3)
      .orderBy("pid").as[(Long, Long, Long, Long)].collect()
    stats.map(_._2).sum shouldBe 10000L
    // ordered, non-overlapping: each partition's max < next partition's min
    stats.sliding(2).foreach { case Array((_, _, _, maxA), (_, _, minB, _)) =>
      maxA should be < minB
    }
    // near-equal counts within the 2^-3 bucket-width tolerance (generous 2x)
    all(stats.map(_._2)) should (be >= 600L and be <= 2500L)
    // bounds are deterministic and bounded in size
    val sketch = graft.operators.Sketches.logHistSketch(
      df.select(col("v")), Seq.empty, "v", s = 3)
    val b1 = Layout.sketchRangeBounds(sketch, 8)
    val b2 = Layout.sketchRangeBounds(sketch, 8)
    b1 shouldBe b2
    b1.length shouldBe 7
    b1.sorted shouldBe b1
  }
}
