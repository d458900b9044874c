package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 5000L).map(i =>
    (i, s"g${i % 4}", s"v${i % 997}")).toDF("id", "grp", "value")

  test("estimates land within the documented error band of exact distincts") {
    val est = Sketches.estimate(
        Sketches.distinctSketches(corpus, Seq("grp"), "value"), Seq("grp"))
      .as[(String, Double)].collect().toMap
    val exact = corpus.groupBy("grp").agg(countDistinct(col("value")))
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    for ((g, e) <- exact) {
      val rel = math.abs(est(g) - e) / e
      assert(rel < 0.05, s"group $g: est ${est(g)} vs exact $e (rel $rel)")
    }
  }

  test("incremental contract: merged drop sketches agree with the direct sketch") {
    val drop1 = corpus.filter(col("id") <= 2500)
    val drop2 = corpus.filter(col("id") > 2500)
    val merged = Sketches.merge(Seq(
        Sketches.distinctSketches(drop1, Seq("grp"), "value"),
        Sketches.distinctSketches(drop2, Seq("grp"), "value")), Seq("grp"))
    val whole = Sketches.distinctSketches(corpus, Seq("grp"), "value")
    val a = Sketches.estimate(merged, Seq("grp"))
      .as[(String, Double)].collect().toMap
    val b = Sketches.estimate(whole, Seq("grp"))
      .as[(String, Double)].collect().toMap
    val exact = corpus.groupBy("grp").agg(countDistinct(col("value")))
      .as[(String, Long)].collect().toMap
    // NOT bit-equal (a drop sketch can still be sparse where the direct
    // one went dense); both must sit inside the error band of exact, and
    // within the band of each other
    for (g <- exact.keys) {
      assert(math.abs(a(g) - exact(g)) / exact(g) < 0.05, s"merged $g")
      assert(math.abs(b(g) - exact(g)) / exact(g) < 0.05, s"direct $g")
      assert(math.abs(a(g) - b(g)) / exact(g) < 0.05, s"merged-vs-direct $g")
    }
    // determinism across runs
    val again = Sketches.estimate(
        Sketches.distinctSketches(corpus, Seq("grp"), "value"), Seq("grp"))
      .as[(String, Double)].collect().toMap
    assert(again === b)
  }

  test("sketch artifact survives a parquet round-trip (the index shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sketch").toString
    Sketches.distinctSketches(corpus, Seq("grp"), "value")
      .write.mode("overwrite").parquet(s"$dir/sketches")
    val loaded = spark.read.parquet(s"$dir/sketches")
    val est = Sketches.estimate(
        Sketches.merge(Seq(loaded,
          Sketches.distinctSketches(corpus.filter(col("id") <= 10), Seq("grp"), "value")),
          Seq("grp")),
        Seq("grp"))
      .as[(String, Double)].collect().toMap
    val base = Sketches.estimate(
        Sketches.distinctSketches(corpus, Seq("grp"), "value"), Seq("grp"))
      .as[(String, Double)].collect().toMap
    // folding in a subset of already-seen values changes nothing
    assert(est === base)
  }

  test("CMS: never undercounts, tight at small scale, drops merge by union") {
    val exact = corpus.groupBy("grp", "value").count()
      .as[(String, String, Long)].collect()
      .map { case (g, v, c) => (g, v) -> c }.toMap
    val terms = Seq("v0", "v1", "v500")
    val sk = Sketches.cmsSketches(corpus, Seq("grp"), "value")
    val est = Sketches.estimateCounts(sk, Seq("grp"), terms)
      .as[(String, String, Long)].collect()
    assert(est.length === 4 * terms.size)
    for ((g, t, e) <- est) {
      val truth = exact.getOrElse((g, t), 0L)
      assert(e >= truth, s"CMS undercounted ($g,$t): $e < $truth")
      assert(e <= truth + (0.0001 * 5000).ceil.toLong + 1, s"($g,$t): $e vs $truth")
    }
    // drop-merge contract: union of drop sketches == direct sketch,
    // estimate-for-estimate (CMS counters are exact sums, unlike HLL)
    val merged = Sketches.mergeCms(Seq(
      Sketches.cmsSketches(corpus.filter(col("id") <= 2500), Seq("grp"), "value"),
      Sketches.cmsSketches(corpus.filter(col("id") > 2500), Seq("grp"), "value")),
      Seq("grp"))
    val a = Sketches.estimateCounts(merged, Seq("grp"), terms)
      .as[(String, String, Long)].collect().toSet
    assert(a === est.toSet)
  }

  test("KLL quantiles: exact under capacity, rank-band above it") {
    // 100 values per group at k=200: no compaction — the estimate IS an
    // exact order statistic
    val small = (1L to 400L).map(i => (i, s"g${i % 4}", (i / 4).toDouble))
      .toDF("id", "grp", "v")
    val smallEst = Sketches.estimateQuantiles(
        Sketches.quantileSketches(small, Seq("grp"), "v"),
        Seq("grp"), Seq(0.5))
      .as[(String, Double, Option[Double])].collect()
    assert(smallEst.length === 4)
    for ((g, _, e) <- smallEst) {
      // values per group are ~uniform 0..100; exact median within the set
      assert(e.isDefined && e.get >= 40 && e.get <= 60, s"$g median ${e}")
    }
    // 50k values in one group: compaction has kicked in — verify the
    // normalized-rank band (ε ≈ 1.65% at k=200; assert 3ε)
    val big = (1L to 50000L).map(i => (i, "g", i.toDouble)).toDF("id", "grp", "v")
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val est = Sketches.estimateQuantiles(
        Sketches.quantileSketches(big, Seq("grp"), "v"), Seq("grp"), qs)
      .as[(String, Double, Option[Double])].collect()
    for ((_, q, e) <- est) {
      val empiricalRank = e.get / 50000.0 // values are 1..n so rank(v) = v/n
      assert(math.abs(empiricalRank - q) <= 0.05,
        s"q=$q est=${e.get} rank=$empiricalRank")
    }
  }

  test("KLL incremental contract: merged drop sketches stay in the band") {
    val all = (1L to 30000L).map(i => (i, s"g${i % 2}", i.toDouble)).toDF("id", "grp", "v")
    val merged = Sketches.mergeKll(Seq(
        Sketches.quantileSketches(all.filter(col("id") <= 15000), Seq("grp"), "v"),
        Sketches.quantileSketches(all.filter(col("id") > 15000), Seq("grp"), "v")),
      Seq("grp"))
    val est = Sketches.estimateQuantiles(merged, Seq("grp"), Seq(0.25, 0.75))
      .as[(String, Double, Option[Double])].collect()
    assert(est.length === 4)
    for ((g, q, e) <- est) {
      // per-group values are an arithmetic sequence over ~1..30000
      val empiricalRank = e.get / 30000.0
      assert(math.abs(empiricalRank - q) <= 0.05, s"$g q=$q rank=$empiricalRank")
    }
  }

  test("theta set ops: exact below capacity, deterministic, drop-merge") {
    import spark.implicits._
    // per-group sets with known overlap: g0 A={v0..v99} B={v50..v149}
    val a = (0 until 100).map(i => ("g0", s"v$i")).toDF("grp", "value")
    val b = (50 until 150).map(i => ("g0", s"v$i")).toDF("grp", "value")
    val ops = Sketches.thetaSetOps(
        Sketches.thetaSketches(a, Seq("grp"), "value"),
        Sketches.thetaSketches(b, Seq("grp"), "value"), Seq("grp"))
      .as[(String, Double, Double, Double, Double)].collect().head
    assert(ops === (("g0", 150.0, 50.0, 50.0, 50.0)))
    // a group present on one side only estimates against the empty set
    val c = (0 until 10).map(i => ("solo", s"x$i")).toDF("grp", "value")
    val ops2 = Sketches.thetaSetOps(
        Sketches.thetaSketches(c, Seq("grp"), "value"),
        Sketches.thetaSketches(b, Seq("grp"), "value"), Seq("grp"))
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(ops2("solo") === ((10.0, 0.0, 10.0, 0.0)))
    // merged drop sketches == direct sketch (KMV is deterministic)
    val whole = (0 until 150).map(i => ("g0", s"v$i")).toDF("grp", "value")
    val merged = Sketches.mergeTheta(Seq(
        Sketches.thetaSketches(a, Seq("grp"), "value"),
        Sketches.thetaSketches(b, Seq("grp"), "value")), Seq("grp"))
    val viaMerge = Sketches.thetaSetOps(merged,
        Sketches.thetaSketches(whole, Seq("grp"), "value"), Seq("grp"))
      .as[(String, Double, Double, Double, Double)].collect().head
    assert(viaMerge === (("g0", 150.0, 150.0, 0.0, 0.0)))
    // estimation mode (50k distincts at lgK=12): inside the ~3·RSE band
    val big1 = (1 to 50000).map(i => ("g", s"u$i")).toDF("grp", "value")
    val big2 = (25001 to 75000).map(i => ("g", s"u$i")).toDF("grp", "value")
    val est = Sketches.thetaSetOps(
        Sketches.thetaSketches(big1, Seq("grp"), "value"),
        Sketches.thetaSketches(big2, Seq("grp"), "value"), Seq("grp"))
      .as[(String, Double, Double, Double, Double)].collect().head
    assert(math.abs(est._2 - 75000) / 75000 < 0.05, s"union ${est._2}")
    assert(math.abs(est._3 - 25000) / 25000 < 0.10, s"intersect ${est._3}")
    // non-string valueCol rejected
    intercept[IllegalArgumentException] {
      Sketches.thetaSketches(Seq(("g", 1L)).toDF("grp", "v"), Seq("grp"), "v")
    }
  }

  test("all-NULL value groups: NULL sketches yield NULL/empty estimates, not NPEs") {
    import spark.implicits._
    val df = Seq(("g1", Option("a")), ("g1", Option("b")),
      ("g2", Option.empty[String])).toDF("grp", "v")
    // KLL: numeric sketch over an all-NULL group
    val kll = Sketches.estimateQuantiles(
        Sketches.quantileSketches(
          df.withColumn("v", when(col("v").isNotNull, lit(1.0))), Seq("grp"), "v"),
        Seq("grp"), Seq(0.5))
      .as[(String, Double, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(kll("g1").isDefined && kll("g2").isEmpty)
    // theta: the NULL-sketch group estimates against the empty set
    val a = Sketches.thetaSketches(df, Seq("grp"), "v")
    val ops = Sketches.thetaSetOps(a, a, Seq("grp"))
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(ops("g1") === 2.0)
    assert(!ops.contains("g2") || ops("g2") === 0.0) // empty on both sides
  }

  test("guards") {
    intercept[IllegalArgumentException] {
      Sketches.distinctSketches(corpus, Seq.empty, "value")
    }
    intercept[IllegalArgumentException] { Sketches.merge(Seq.empty, Seq("grp")) }
    // non-string valueCol would hash the native type and make every later
    // string point-query silently answer ~0 — rejected at build time
    import spark.implicits._
    val typed = Seq(("a", 1L), ("a", 2L)).toDF("grp", "n")
    val e = intercept[IllegalArgumentException] {
      Sketches.cmsSketches(typed, Seq("grp"), "n")
    }
    assert(e.getMessage.contains("StringType"))
    // and the documented escape hatch works: cast first
    val ok = Sketches.cmsSketches(
      typed.withColumn("n", col("n").cast("string")), Seq("grp"), "n")
    assert(Sketches.estimateCounts(ok, Seq("grp"), Seq("1"))
      .as[(String, String, Long)].collect().head._3 >= 1L)
  }
}
