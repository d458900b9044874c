package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.L2DistSqExpr
import graft.operators.Pq

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val cbSchema = StructType(Seq(
    StructField("subspace", IntegerType, nullable = false),
    StructField("code", LongType, nullable = false),
    StructField("cv", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** planted m=2, sd=2, k=2 codebook: subspace 0 splits on sign of the
    * first pair, subspace 1 on the second. */
  private def plantedCb = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(0, 0L, Seq(-1.0, -1.0)), Row(0, 1L, Seq(1.0, 1.0)),
      Row(1, 0L, Seq(-2.0, -2.0)), Row(1, 1L, Seq(2.0, 2.0))),
    cbSchema)

  test("L2DistSqExpr equals the zip_with reference and null rules") {
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0, -1.0)),
      (Seq(0.0f, 0.0f), Seq(0.0, 0.0))
    ).toDF("a", "b")
    val ref = aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(L2DistSqExpr(col("a"), col("b")).as("n"), ref.as("r"))
      .as[(Double, Double)].collect()
    for ((n, r) <- rows) assert(n === r)
    // length mismatch -> NULL
    val bad = Seq((Seq(1.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(L2DistSqExpr(col("a"), col("b"))).collect()
    assert(bad.head.isNullAt(0))
  }

  test("encode picks the nearest codeword per subspace, zero-shuffle") {
    val vecs = Seq(
      (1L, Seq(0.9f, 1.1f, -2.1f, -1.9f)),  // -> codes [1, 0]
      (2L, Seq(-0.5f, -0.7f, 1.5f, 2.5f)),  // -> codes [0, 1]
      (3L, Seq(1.0f, 1.0f, 2.0f, 2.0f))     // -> codes [1, 1] (exact)
    ).toDF("vec_id", "embedding")
    val out = Pq.encode(vecs, "embedding", plantedCb)
      .select("vec_id", "pq_code").as[(Long, Seq[Long])].collect().toMap
    assert(out === Map(1L -> Seq(1L, 0L), 2L -> Seq(0L, 1L), 3L -> Seq(1L, 1L)))
    val plan = Pq.encode(vecs, "embedding", plantedCb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"encode must not shuffle:\n$plan")
  }

  test("ADC is exact when vectors sit on codewords; rerank equals exact search") {
    // every vector IS a codeword concatenation -> quantization error 0,
    // so ADC distances equal true distances
    val corpus = Seq(
      (1L, Seq(-1.0f, -1.0f, -2.0f, -2.0f)),
      (2L, Seq(-1.0f, -1.0f, 2.0f, 2.0f)),
      (3L, Seq(1.0f, 1.0f, -2.0f, -2.0f)),
      (4L, Seq(1.0f, 1.0f, 2.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val encoded = Pq.encode(corpus, "embedding", plantedCb)
    val queries = corpus.filter(col("vec_id") <= 2)
    val adc = Pq.adcTopK(encoded, queries, "embedding", "vec_id", plantedCb, k = 4)
      .select("query_id", "neighbor_id", "adc_dist")
      .as[(Long, Long, Double)].collect().toSet
    val exact = Pq.exactL2TopK(corpus, queries, "embedding", "vec_id", k = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(adc === exact)
    // two-stage with kCandidates = |corpus| degenerates to exact search
    val rr = Pq.adcRerankTopK(corpus, encoded, queries, "embedding", "vec_id",
        plantedCb, k = 2, kCandidates = 4)
      .as[(Long, Long, Double)].collect().toSet
    val exact2 = Pq.exactL2TopK(corpus, queries, "embedding", "vec_id", k = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(rr === exact2)
  }

  test("trainCodebooks: dense codes, planted clusters recovered after one round") {
    // 2 clean clusters per subspace; seeds (2 lowest ids) land one per
    // cluster, so one Lloyd round must converge codewords to the means
    val rows = (0 until 40).map { i =>
      val s0 = if (i % 2 == 0) 1.0f else -1.0f
      val s1 = if (i % 2 == 0) 3.0f else -3.0f
      (i.toLong, Seq(s0 + (i % 4) * 0.01f, s0, s1, s1 - (i % 4) * 0.01f))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val cb = Pq.trainCodebooks(corpus, "embedding", "vec_id",
      subspaces = 2, codebookSize = 2, iters = 2)
    val got = cb.as[(Int, Long, Seq[Double])].collect()
    assert(got.map(r => (r._1, r._2)).sorted ===
      Seq((0, 0L), (0, 1L), (1, 0L), (1, 1L)))
    // every codeword is the mean of its cluster: distances within 1e-9 of
    // a driver-side recomputation
    val byKey = got.map(r => (r._1, r._2) -> r._3).toMap
    def mean(sel: Int => Boolean, a: Int, b: Int): Seq[Double] = {
      val sub = rows.filter(r => sel(r._1.toInt)).map(_._2.slice(a, b).map(_.toDouble))
      sub.transpose.map(c => c.sum / c.length)
    }
    // seed 0 (vec 0) is the even cluster, seed 1 (vec 1) the odd one
    val tol = 1e-9
    def close(x: Seq[Double], y: Seq[Double]): Boolean =
      x.zip(y).forall { case (p, q) => math.abs(p - q) < tol }
    assert(close(byKey((0, 0L)), mean(_ % 2 == 0, 0, 2)))
    assert(close(byKey((0, 1L)), mean(_ % 2 == 1, 0, 2)))
    assert(close(byKey((1, 0L)), mean(_ % 2 == 0, 2, 4)))
    assert(close(byKey((1, 1L)), mean(_ % 2 == 1, 2, 4)))
  }

  test("adcRecallSummary on random vectors: deterministic and above threshold") {
    val rnd = new scala.util.Random(5)
    val corpus = (0 until 300).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 8)
    val s1 = Pq.adcRecallSummary(corpus, queries, "embedding", "vec_id",
      k = 5, kCandidates = 50, subspaces = 4, codebookSize = 8, iters = 2,
      minRecall = 0.8).collect().head
    assert(s1.getLong(0) === 8L)       // n_queries
    assert(s1.getLong(1) === 40L)      // n_truth = 8 * 5
    assert(s1.getInt(3) === 1, s"recall too low: $s1")
    val s2 = Pq.adcRecallSummary(corpus, queries, "embedding", "vec_id",
      k = 5, kCandidates = 50, subspaces = 4, codebookSize = 8, iters = 2,
      minRecall = 0.8).collect().head
    assert(s1 === s2)
  }

  test("ivfAdcRerankTopK: degenerate config equals exact search; partial probes recall") {
    val rnd = new scala.util.Random(9)
    val corpus = (0 until 200).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 5)
    val cents = operators.Similarity.kmeansCentroids(corpus, "embedding", "vec_id",
      nCentroids = 4, iters = 2)
    val cb = Pq.trainCodebooks(corpus, "embedding", "vec_id",
      subspaces = 8, codebookSize = 8, iters = 2)
    val encoded = Pq.encode(
      operators.Similarity.ivfAssignWith(corpus, "embedding", cents),
      "embedding", cb)
    assert(encoded.columns.contains("centroid_id"))
    // nProbe = all buckets, kCandidates = |corpus| -> exact
    val full = Pq.ivfAdcRerankTopK(corpus, encoded, queries, "embedding", "vec_id",
        cents, cb, k = 5, nProbe = 4, kCandidates = 200)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = Pq.exactL2TopK(corpus, queries, "embedding", "vec_id", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full === exact)
    // partial probes: still a valid top-k list per query, mostly overlapping
    val part = Pq.ivfAdcRerankTopK(corpus, encoded, queries, "embedding", "vec_id",
        cents, cb, k = 5, nProbe = 2, kCandidates = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(part.groupBy(_._1).forall(_._2.length <= 5))
    val hits = part.toSet.intersect(exact).size
    assert(hits >= exact.size / 2, s"partial-probe recall collapsed: $hits/${exact.size}")
    // missing bucket column fails loudly
    intercept[IllegalArgumentException] {
      Pq.ivfAdcRerankTopK(corpus, Pq.encode(corpus, "embedding", cb), queries,
        "embedding", "vec_id", cents, cb)
    }
  }

  test("encode runs unchanged on a memory stream (zero-shuffle claim)") {
    implicit val ctx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    stream.addData(
      (1L, Seq(0.9f, 1.1f, -2.1f, -1.9f)),
      (2L, Seq(-0.5f, -0.7f, 1.5f, 2.5f)))
    val q = Pq.encode(stream.toDF().toDF("vec_id", "embedding"),
        "embedding", plantedCb)
      .select("vec_id", "pq_code")
      .writeStream.format("memory").queryName("pq_enc").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("pq_enc").as[(Long, Seq[Long])].collect().toMap
    assert(got === Map(1L -> Seq(1L, 0L), 2L -> Seq(0L, 1L)))
  }

  test("codebooks survive a save/load round-trip; searches agree exactly") {
    val rnd = new scala.util.Random(17)
    val corpus = (0 until 150).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 3)
    val cb = Pq.trainCodebooks(corpus, "embedding", "vec_id",
      subspaces = 4, codebookSize = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Pq.saveCodebooks(cb, s"$dir/cb")
    val loaded = Pq.loadCodebooks(spark, s"$dir/cb")
    val a = Pq.adcTopK(Pq.encode(corpus, "embedding", cb), queries,
        "embedding", "vec_id", cb, k = 5)
      .as[(Long, Long, Double)].collect().toSet
    val b = Pq.adcTopK(Pq.encode(corpus, "embedding", loaded), queries,
        "embedding", "vec_id", loaded, k = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("guards: bad dims, empty corpus, oversized codebook") {
    val tiny = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Pq.trainCodebooks(tiny, "embedding", "vec_id", subspaces = 2, codebookSize = 1)
    }
    intercept[IllegalArgumentException] {
      Pq.trainCodebooks(tiny.filter(col("vec_id") < 0), "embedding", "vec_id",
        subspaces = 1, codebookSize = 1)
    }
    intercept[IllegalArgumentException] {
      Pq.trainCodebooks(tiny, "embedding", "vec_id", subspaces = 1, codebookSize = 5)
    }
  }

  test("pqCodeStats/pqDriftReport: hand-computed occupancy and error; " +
    "enforcePqFreshness gates skew and error rise") {
    // build: 3 vectors on/near codewords — stats hand-checkable
    val build = Seq(
      (1L, Seq(1.0f, 1.0f, 2.0f, 2.0f)),   // codes [1,1], err [0, 0]
      (2L, Seq(-1.0f, -1.0f, -2.0f, -2.0f)), // codes [0,0], err [0, 0]
      (3L, Seq(0.9f, 1.1f, 2.0f, 2.0f))    // codes [1,1], err [0.02, 0]
    ).toDF("vec_id", "embedding")
    val ref = Pq.pqCodeStats(
      Pq.encode(build, "embedding", plantedCb), "embedding", plantedCb)
    val refMap = ref.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(refMap((0, 1L))._1 == 2L)
    assert(math.abs(refMap((0, 1L))._2 - 0.01) < 1e-6) // (0.02 + 0) / 2, float ulps
    assert(refMap((1, 1L)) == ((2L, 0.0)))
    assert(refMap((0, 0L)) == ((1L, 0.0)))
    // save/load the reference alongside the codebooks
    val dir = java.nio.file.Files.createTempDirectory("pq-drift").toString
    Pq.saveCodebooks(plantedCb, dir, Some(ref))
    val loadedRef = Pq.loadPqReference(spark, dir)
    // drifted live corpus: drop vec 2, add two far-from-codeword rows
    // into (0,1)/(1,1) — occupancy shifts AND error rises
    val now = Seq(
      (1L, Seq(1.0f, 1.0f, 2.0f, 2.0f)),
      (3L, Seq(0.9f, 1.1f, 2.0f, 2.0f)),
      (4L, Seq(2.0f, 2.0f, 3.0f, 3.0f)),   // codes [1,1], err [2, 2]
      (5L, Seq(2.0f, 2.0f, 3.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val report = Pq.pqDriftReport(
      Pq.encode(now, "embedding", plantedCb), "embedding", plantedCb, loadedRef)
    val rows = report.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r).toMap
    // (0,0): ref 1/3, now 0/4 -> ratio 0, mean_err_now NULL
    assert(rows((0, 0L)).getDouble(4) == 0.0)
    assert(rows((0, 0L)).isNullAt(6))
    // (0,1): ref 2/3, now 4/4 -> ratio (4*3)/(2*4) = 1.5 exactly
    assert(rows((0, 1L)).getDouble(4) == 1.5)
    // err rise at (0,1): now (0.02 + 0 + 2 + 2)/4 = 1.005, ref 0.01
    assert(math.abs(rows((0, 1L)).getDouble(7) - 0.995) < 1e-6)
    // enforce: fails closed naming the rule (empty bucket + err rise)
    val e = intercept[IllegalStateException] {
      Pq.enforcePqFreshness(report)
    }
    assert(e.getMessage.contains("occupancy_ratio") ||
      e.getMessage.contains("mean_err"), e.getMessage)
    // the undrifted corpus passes
    Pq.enforcePqFreshness(Pq.pqDriftReport(
      Pq.encode(build, "embedding", plantedCb), "embedding", plantedCb,
      loadedRef))
    // a codebook dir saved WITHOUT a reference fails loud on load
    val bare = java.nio.file.Files.createTempDirectory("pq-bare").toString
    Pq.saveCodebooks(plantedCb, bare)
    val e2 = intercept[IllegalArgumentException] {
      Pq.loadPqReference(spark, bare)
    }
    assert(e2.getMessage.contains("_pq_reference"), e2.getMessage)
  }

  test("guards: corrupt codebooks and wrong-length vectors fail loudly") {
    val vecs = Seq((1L, Seq(1.0f, 1.0f, 2.0f, 2.0f))).toDF("vec_id", "embedding")
    // gap in codes (0,2 — no 1): must be rejected at meta validation
    val gappy = spark.createDataFrame(java.util.Arrays.asList(
      Row(0, 0L, Seq(-1.0, -1.0)), Row(0, 2L, Seq(1.0, 1.0)),
      Row(1, 0L, Seq(-2.0, -2.0)), Row(1, 1L, Seq(2.0, 2.0))), cbSchema)
    val e1 = intercept[IllegalArgumentException] {
      Pq.encode(vecs, "embedding", gappy)
    }
    assert(e1.getMessage.contains("not dense"))
    // non-dense subspace numbering (0,2)
    val skewedSubs = spark.createDataFrame(java.util.Arrays.asList(
      Row(0, 0L, Seq(-1.0, -1.0)), Row(0, 1L, Seq(1.0, 1.0)),
      Row(2, 0L, Seq(-2.0, -2.0)), Row(2, 1L, Seq(2.0, 2.0))), cbSchema)
    val e2 = intercept[IllegalArgumentException] {
      Pq.encode(vecs, "embedding", skewedSubs)
    }
    assert(e2.getMessage.contains("subspaces are not dense"))
    // wrong-length vector vs a valid codebook: loud runtime error naming
    // the mismatch, not a silent code -1
    val short = Seq((1L, Seq(1.0f, 1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e3 = intercept[Exception] {
      Pq.encode(short, "embedding", plantedCb).collect()
    }
    assert(e3.getMessage.contains("codebook dim") ||
      Option(e3.getCause).exists(_.getMessage.contains("codebook dim")))
  }
}
