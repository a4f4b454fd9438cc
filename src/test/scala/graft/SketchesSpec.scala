package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 400 values across two groups with known distinct counts: g1 has 300
  // distinct values (> k: estimation path), g2 has 10 (< k: exact path).
  private lazy val vals = ((1 to 300).map(i => ("g1", s"v$i")) ++
    (1 to 100).map(i => ("g2", s"w${i % 10}"))).toDF("g", "v")

  "Sketches.kmv" should "be exact below k and within KMV error above k" in {
    val regs = Sketches.kmvRegisters(vals, Seq("g"), "v", k = 64)
    val est = Sketches.kmvEstimate(regs, Seq("g"), k = 64)
      .as[(String, Long)].collect().toMap
    est("g2") shouldBe 10L // below k → exact
    // k=64 → σ ≈ n/√k ≈ 37; assert a generous 3σ band
    est("g1") should be(300L +- 115L)
  }

  it should "merge registers to exactly the sketch of the union" in {
    val a = vals.filter(col("v") < "v2") // lexicographic split, overlapping hashes
    val b = vals.filter(col("v") >= "v1")
    val merged = Sketches.kmvMerge(
      Sketches.kmvRegisters(a, Seq("g"), "v", 64)
        .unionByName(Sketches.kmvRegisters(b, Seq("g"), "v", 64)),
      Seq("g"), 64)
    val direct = Sketches.kmvRegisters(vals, Seq("g"), "v", 64)
    merged.select("g", "rank", "hv").except(direct.select("g", "rank", "hv"))
      .count() shouldBe 0L
    direct.select("g", "rank", "hv").except(merged.select("g", "rank", "hv"))
      .count() shouldBe 0L
  }

  "Sketches.kmvPairwiseOps" should "estimate union/intersection from registers alone" in {
    // g1 = 1..200, g2 = 101..300 → |∩| = 100, |∪| = 300, J = 1/3
    val two = ((1 to 200).map(i => ("a", s"v$i")) ++
      (101 to 300).map(i => ("b", s"v$i"))).toDF("g", "v")
    val regs = Sketches.kmvRegisters(two, Seq("g"), "v", k = 64)
    val r = Sketches.kmvPairwiseOps(regs, "g", k = 64)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    r should have length 1
    val (ga, gb, aEst, bEst, unionEst, interEst, jac) = r.head
    (ga, gb) shouldBe (("a", "b"))
    aEst should be(200L +- 80L)
    bEst should be(200L +- 80L)
    unionEst should be(300L +- 110L) // ~3σ at k=64
    interEst should be(100L +- 100L) // inclusion-exclusion compounds error
    jac should be(333333L +- 300000L)
  }

  it should "report disjoint groups as near-zero intersection" in {
    val two = ((1 to 150).map(i => ("a", s"x$i")) ++
      (1 to 150).map(i => ("b", s"y$i"))).toDF("g", "v")
    val regs = Sketches.kmvRegisters(two, Seq("g"), "v", k = 64)
    val r = Sketches.kmvPairwiseOps(regs, "g", k = 64)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().head
    r._6 should be <= 60L // inter_est ≈ 0 (clamped, small-error band)
    r._5 should be(300L +- 110L)
  }

  "Sketches.cms" should "never underestimate and be exact without collisions" in {
    val rows = Seq.tabulate(100)(i => (s"k${i % 5}", 1L)).toDF("k", "w")
    val cms = Sketches.cmsBuild(rows, col("k"), col("w"), depth = 4, width = 1024)
    val probes = Seq("k0", "k1", "k4", "missing").toDF("k")
    val est = Sketches.cmsLookup(cms, probes, "k", depth = 4, width = 1024)
      .as[(String, Long)].collect().toMap
    est("k0") shouldBe 20L // wide sketch, 5 keys → collision-free
    est("k4") shouldBe 20L
    est("missing") shouldBe 0L
    // narrow sketch: estimates only ever grow past the truth
    val tight = Sketches.cmsBuild(rows, col("k"), col("w"), depth = 2, width = 2)
    Sketches.cmsLookup(tight, probes.filter(col("k") =!= "missing"), "k", 2, 2)
      .as[(String, Long)].collect().foreach { case (_, e) => e should be >= 20L }
  }

  it should "merge by summing counters per cell" in {
    val rows = Seq.tabulate(60)(i => (s"k$i", 1L)).toDF("k", "w")
    val (a, b) = (rows.filter(col("k") < "k3"), rows.filter(col("k") >= "k3"))
    val merged = Sketches.cmsBuild(a, col("k"), col("w"), 4, 64)
      .unionByName(Sketches.cmsBuild(b, col("k"), col("w"), 4, 64))
      .groupBy("r", "b").agg(sum(col("c")).as("c"))
    val direct = Sketches.cmsBuild(rows, col("k"), col("w"), 4, 64)
    merged.except(direct).count() shouldBe 0L
    direct.except(merged).count() shouldBe 0L
  }

  "Sketches.bloom" should "have no false negatives and bounded geometry" in {
    val keys = (1 to 200).map(i => s"k$i").toDF("k")
    val bloom = Sketches.bloomBuild(keys, col("k"), words = 64, hashes = 3)
    bloom.count() should be <= 64L // at most one row per word
    val probes = ((1 to 200).map(i => s"k$i") ++ (1 to 200).map(i => s"x$i")).toDF("k")
    val r = Sketches.bloomProbe(bloom, probes, "k", 64, 3)
      .as[(String, Boolean)].collect().toMap
    (1 to 200).foreach(i => r(s"k$i") shouldBe true) // members always hit
    // ~200 keys in 3840 bits → FP rate ≈ 2%: most non-members miss
    (1 to 200).count(i => r(s"x$i")) should be < 40
  }

  it should "merge by bit_or per word" in {
    val keys = (1 to 100).map(i => s"k$i").toDF("k")
    val (a, b) = (keys.filter(col("k") < "k5"), keys.filter(col("k") >= "k5"))
    val merged = Sketches.bloomBuild(a, col("k"), 64, 3)
      .unionByName(Sketches.bloomBuild(b, col("k"), 64, 3))
      .groupBy("word").agg(bit_or(col("bits")).as("bits"))
    val direct = Sketches.bloomBuild(keys, col("k"), 64, 3)
    merged.except(direct).count() shouldBe 0L
    direct.except(merged).count() shouldBe 0L
  }

  "Sketches.bloomPrunedJoin" should "equal the plain join while pruning the probe" in {
    val build = (1 to 50).map(i => (i.toLong * 7, s"b$i")).toDF("bk", "bv")
    val probe = (1 to 2000).map(i => (i.toLong, s"p$i")).toDF("pk", "pv")
    val pruned = Sketches.bloomPrunedJoin(build, probe, "bk", "pk", words = 64, hashes = 3)
      .select("pk", "pv", "bk", "bv")
    val plain = probe.join(build, col("pk") === col("bk")).select("pk", "pv", "bk", "bv")
    pruned.except(plain).count() shouldBe 0L
    plain.except(pruned).count() shouldBe 0L
    pruned.count() shouldBe 50L
    // the row-local filter actually prunes: far fewer probe rows survive
    val kept = probe.filter(Sketches.bloomFilterColumn(
      Sketches.bloomBuildFast(build, col("bk"), 64, 3).collect()
        .foldLeft(new Array[Long](64)) { (a, r) => a(r.getLong(0).toInt) = r.getLong(1); a },
      col("pk"), 3)).count()
    kept should be < 400L // 50 members + ~5% FP of 2000
    // and pruning is pure expression work — no exchange before the join
    val probePlan = probe.filter(Sketches.bloomFilterColumn(
      new Array[Long](64), col("pk"), 3)).queryExecution.executedPlan.toString
    probePlan should not include "Exchange"
  }

  "Sketches.logHist" should "bucket order-preservingly within 2^-s relative error" in {
    val vs = (Seq(0L, 1L, 7L, 8L, 9L, 100L, 1023L, 1024L) ++
      (1 to 50).map(i => i.toLong * 997)).toDF("v")
    val r = vs.select(col("v"), Sketches.logBucket(col("v"), 3).as("id"))
      .withColumn("lb", Sketches.logBucketLow(col("id"), 3))
      .as[(Long, Long, Long)].collect()
    r.foreach { case (v, _, lb) =>
      lb should be <= v
      if (v >= 8) (v - lb).toDouble / v should be <= 0.125 // 2^-3
      else lb shouldBe v // sub-2^s values exact
    }
    // order-preserving: sorting by id never inverts value order across buckets
    val sorted = r.sortBy(_._1)
    sorted.map(_._2) shouldBe sorted.map(_._2).sorted
  }

  it should "estimate quantiles within bucket error and merge by per-cell sum" in {
    val data = (1 to 10000).map(i => ("g", i.toLong)).toDF("g", "v")
    val sk = Sketches.logHistSketch(data, Seq("g"), "v", s = 3)
    val est = Sketches.logHistQuantiles(sk, Seq("g"), Seq(500000L, 990000L), s = 3)
      .as[(String, Long, Long)].collect().map(t => t._2 -> t._3).toMap
    est(500000L).toDouble should be(5000.0 +- 650.0) // ≤12.5% low-side
    est(990000L).toDouble should be(9900.0 +- 1250.0)
    // merge = sum per (group, id)
    val (a, b) = (data.filter(col("v") <= 4000), data.filter(col("v") > 4000))
    val merged = Sketches.logHistSketch(a, Seq("g"), "v", 3)
      .unionByName(Sketches.logHistSketch(b, Seq("g"), "v", 3))
      .groupBy("g", "id").agg(sum(col("cnt")).as("cnt"))
    merged.except(sk).count() shouldBe 0L
    sk.except(merged).count() shouldBe 0L
  }

  "Sketches.hll" should "estimate within HLL error and merge by max register" in {
    val many = (1 to 2000).map(i => ("g", s"v$i")).toDF("g", "v")
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(many, Seq("g"), "v", m = 64), Seq("g"), m = 64)
      .as[(String, Long)].collect().toMap
    // m=64 → σ ≈ 1.04/√64 ≈ 13%; allow 3σ
    est("g") should be(2000L +- 800L)

    val (a, b) = (many.filter(col("v") < "v2"), many.filter(col("v") >= "v2"))
    val merged = Sketches.hllRegisters(a, Seq("g"), "v", 64)
      .unionByName(Sketches.hllRegisters(b, Seq("g"), "v", 64))
      .groupBy("g", "idx").agg(max(col("mreg")).as("mreg"))
    val direct = Sketches.hllRegisters(many, Seq("g"), "v", 64)
    merged.except(direct).count() shouldBe 0L
    direct.except(merged).count() shouldBe 0L
  }

  "Sketches.slidingRegisterMerge" should "equal registers built directly over each window's units" in {
    // hours 10, 11, 13 (gap at 12): values overlap across hours
    val ev = Seq((10L, "a"), (10L, "b"), (11L, "b"), (11L, "c"),
      (13L, "a"), (13L, "d")).toDF("hour", "v")
    val hourly = Sketches.hllRegisters(ev, Seq("hour"), "v", m = 64)
    val merged = Sketches.slidingRegisterMerge(hourly, "hour", width = 3)
    // direct: for each EXISTING hour h, registers over rows with hour in
    // [h-2, h] — must match the explode+max merge register-for-register
    val direct = ev.select(col("v"),
        explode(sequence(col("hour"), col("hour") + 2)).as("win_end"))
      .join(ev.select(col("hour").as("win_end")).distinct(), "win_end")
    val directRegs = Sketches.hllRegisters(direct, Seq("win_end"), "v", m = 64)
    merged.except(directRegs).count() shouldBe 0L
    directRegs.except(merged).count() shouldBe 0L
    // window ends only at existing units: 10, 11, 13 — never the gap 12
    merged.select("win_end").distinct().as[Long].collect().sorted shouldBe Seq(10L, 11L, 13L)
  }

  "Sketches.cmsInnerProduct" should "upper-bound the join size, exactly at low collision" in {
    // A: key i occurs i times (1..20); B: even keys occur 3 times
    // → true join size Σ_{even i} 3·i = 330
    val a = (1 to 20).flatMap(i => Seq.fill(i)(s"k$i")).toDF("k")
    val b = (1 to 20).filter(_ % 2 == 0).flatMap(i => Seq.fill(3)(s"k$i")).toDF("k")
    def est(w: Int) = Sketches.cmsInnerProduct(
      Sketches.cmsBuild(a, col("k"), lit(1L), 4, w),
      Sketches.cmsBuild(b, col("k"), lit(1L), 4, w), depth = 4)
      .as[Long].head()
    est(4096) shouldBe 330L // 20 keys in 4096 buckets: collision-free rows exist
    est(8) should be >= 330L // heavy collisions still never underestimate
    // disjoint sides at generous width → exactly zero
    val c = (1 to 20).map(i => s"z$i").toDF("k")
    Sketches.cmsInnerProduct(
      Sketches.cmsBuild(a, col("k"), lit(1L), 4, 4096),
      Sketches.cmsBuild(c, col("k"), lit(1L), 4, 4096), depth = 4)
      .as[Long].head() shouldBe 0L
  }

  // skewed key frequencies: h1=50, h2=30, mid=10, 100 singletons
  private lazy val skewed = (
    (1 to 50).map(_ => "h1") ++ (1 to 30).map(_ => "h2") ++
      (1 to 10).map(_ => "mid") ++ (1 to 100).map(i => s"tail$i")
    ).toDF("k")

  "Sketches.heavyHitters" should "equal the exact groupBy at any threshold and width" in {
    def exact(t: Long) = skewed.groupBy("k").agg(count(lit(1)).as("n"))
      .filter(col("n") >= t).as[(String, Long)].collect().toMap
    // width 4 forces heavy collisions — light keys pass the CMS gate but
    // must die on the exact HAVING; the result stays EXACT regardless
    for (t <- Seq(5L, 25L, 40L, 60L); w <- Seq(4, 1024)) {
      Sketches.heavyHitters(skewed, "k", threshold = t, depth = 3, width = w)
        .as[(String, Long)].collect().toMap shouldBe exact(t)
    }
  }

  it should "prune light rows before the shuffle via the row-local CMS gate" in {
    val counters = Sketches.cmsMaterializeFast(skewed, col("k"), depth = 3, width = 1024)
    val passed = skewed
      .filter(Sketches.cmsThresholdColumn(counters, 1024, col("k"), 25L))
      .as[String].collect()
    // every h1/h2 row passes (no false negatives), and with width 1024 the
    // 100 singletons essentially never collide into heaviness
    passed.count(_ == "h1") shouldBe 50
    passed.count(_ == "h2") shouldBe 30
    passed.length should be < 100 // most of the 190 rows pruned row-locally
  }
}
