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
