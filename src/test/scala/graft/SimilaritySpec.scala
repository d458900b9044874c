package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val corpus =
    spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
  private lazy val queries = corpus.filter(col("vec_id") < 10)

  test("bruteForceTopK: self is rank-1 with score ~1.0; k rows per query") {
    val top = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", k = 5)
      .collect()
    val byQuery = top.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    byQuery.foreach { case (qid, rows) =>
      assert(rows.length == 5)
      val best = rows.maxBy(_.getAs[Double]("score"))
      assert(best.getAs[Long]("neighbor_id") == qid)
      assert(math.abs(best.getAs[Double]("score") - 1.0) < 1e-9)
    }
  }

  test("bruteForceTopK broadcasts the query side (corpus not shuffled for join)") {
    val plan = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
  }

  test("ivfTopK with nProbe = nCentroids degenerates to exact brute force") {
    val bf = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(corpus, queries, "embedding", "vec_id",
        k = 5, nCentroids = 8, nProbe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == bf)
  }

  test("ivfTopK probes a subset: k results per query, all from probed buckets") {
    val out = Similarity.ivfTopK(corpus, queries, "embedding", "vec_id",
      k = 5, nCentroids = 16, nProbe = 4).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    byQuery.values.foreach(rows => assert(rows.length == 5))
  }

  test("ivfAssign gives every vector exactly one centroid from the centroid set") {
    val assigned = Similarity.ivfAssign(corpus, "embedding", "vec_id", nCentroids = 8)
    assert(assigned.count() == corpus.count())
    val cents = assigned.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val expected = corpus.orderBy("vec_id").limit(8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(cents.subsetOf(expected))
  }

  test("IVF recall vs brute force rises with nProbe (k-means centroids)") {
    val bf = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nProbe: Int): Double = {
      val ivf = Similarity.ivfTopK(corpus, queries, "embedding", "vec_id",
          k = 10, nCentroids = 16, nProbe = nProbe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      ivf.intersect(bf).size.toDouble / bf.size
    }
    // measured ~0.84 / ~0.93; floors leave margin for float-sum order
    // wobble in the k-means means
    assert(recall(4) >= 0.7)
    assert(recall(8) >= 0.85)
  }

  test("ivfRecallSummary matches an independently computed recall@k") {
    val bf = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(corpus, queries, "embedding", "vec_id",
        k = 5, nCentroids = 16, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectedHits = ivf.intersect(bf).size

    val row = Similarity.ivfRecallSummary(corpus, queries, "embedding", "vec_id",
      k = 5, nCentroids = 16, nProbe = 4, minRecall = 0.9).collect()(0)
    assert(row.getAs[Long]("n_queries") == 10)
    assert(row.getAs[Long]("n_truth") == bf.size)
    assert(row.getAs[Long]("n_hits") == expectedHits)
    val recall = expectedHits.toDouble / bf.size
    assert(row.getAs[Int]("recall_ok") == (if (recall >= 0.9) 1 else 0))

    // an unreachable threshold flips the flag — the gate can actually fail
    val strict = Similarity.ivfRecallSummary(corpus, queries, "embedding", "vec_id",
      k = 5, nCentroids = 16, nProbe = 1, minRecall = 1.0).collect()(0)
    if (strict.getAs[Long]("n_hits") < strict.getAs[Long]("n_truth"))
      assert(strict.getAs[Int]("recall_ok") == 0)
  }

  test("a zero-norm corpus vector is never returned as a neighbor") {
    import spark.implicits._
    val dim = corpus.select(size(col("embedding"))).head.getInt(0)
    val zero = Seq((999999L, Array.fill(dim)(0.0f))).toDF("vec_id", "embedding")
    val poisoned = corpus.unionByName(zero)
    val top = Similarity.bruteForceTopK(poisoned, queries, "embedding", "vec_id", k = 5)
      .collect()
    assert(top.nonEmpty)
    assert(!top.exists(_.getAs[Long]("neighbor_id") == 999999L))
    assert(top.forall(r => !r.getAs[Double]("score").isNaN))
  }

  test("kmeansCentroids: k full-dimension centroids; iter 0 returns the seeds") {
    val dim = corpus.select(size(col("embedding"))).head.getInt(0)
    val refined = Similarity.kmeansCentroids(corpus, "embedding", "vec_id",
      nCentroids = 8, iters = 2).collect()
    assert(refined.length == 8)
    refined.foreach(r => assert(r.getSeq[Double](1).length == dim))

    val seeds = Similarity.kmeansCentroids(corpus, "embedding", "vec_id",
      nCentroids = 8, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val raw = corpus.orderBy("vec_id").limit(8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    assert(seeds.keySet == raw.keySet)
    // Lloyd rounds move at least one centroid off its seed
    assert(refined.exists(r => seeds(r.getLong(0)) != r.getSeq[Double](1)))
  }

  test("VectorMeanAgg equals the posexplode/avg relational form (fp tolerance)") {
    val assigned = corpus.select(
      (col("vec_id") % 7).as("g"), col("embedding"))
    val agg = assigned.groupBy("g")
      .agg(graft.functions.VectorMeanAgg(col("embedding")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val relational = assigned
      .select(col("g"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("g", "pos").agg(avg(col("v")).as("m"))
      .groupBy("g")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))), s => s("m")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(agg.keySet == relational.keySet && agg.nonEmpty)
    agg.foreach { case (g, v) =>
      val w = relational(g)
      assert(v.length == w.length)
      v.zip(w).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)), s"group $g")
      }
    }
  }

  test("VectorMeanAgg: null vectors skipped, null elements skipped per position") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(Option(1.0), Option(4.0)))),
      (1L, Some(Seq(Option(3.0), None))),
      (1L, Option.empty[Seq[Option[Double]]]),
      (2L, Option.empty[Seq[Option[Double]]])
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(graft.functions.VectorMeanAgg(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Any](1))).toMap
    assert(out(1L) == Seq(2.0, 4.0)) // pos 0: (1+3)/2; pos 1: 4/1 (null skipped)
    assert(out(2L) == null)          // only-null group -> NULL result
  }

  test("kmeansCentroids at iters=8: flat per-round plans, no analysis blowup") {
    // centroids are localized after every Lloyd round, so iteration count
    // must scale linearly — before the per-round collect, round N's plan
    // embedded round N-1's whole assignment chain and iters=8 was
    // effectively unplannable
    val t0 = System.nanoTime()
    val cents = Similarity.kmeansCentroids(corpus, "embedding", "vec_id",
      nCentroids = 8, iters = 8)
    // the returned frame is a driver-local leaf relation, not an
    // 8-round iteration chain
    assert(cents.queryExecution.optimizedPlan.children.isEmpty)
    assert(cents.count() == 8)
    assert((System.nanoTime() - t0) / 1e9 < 120.0)
  }

  test("ivfTopKWith from persisted centroids == in-line ivfTopK (save/load roundtrip)") {
    // the deployment path: build the index once, persist it, and run the
    // search from the loaded table with the Lloyd loop skipped entirely
    val cents = Similarity.kmeansCentroids(corpus, "embedding", "vec_id",
      nCentroids = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-cents")
      .resolve("centroids").toString
    Similarity.saveCentroids(cents, dir)
    val loaded = Similarity.loadCentroids(spark, dir)
    // loaded table is a driver-local leaf relation like the in-line build
    assert(loaded.queryExecution.optimizedPlan.children.isEmpty)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("neighbor_id"), round(col("score"), 9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inline = rows(Similarity.ivfTopK(corpus, queries, "embedding", "vec_id",
      k = 5, nCentroids = 8, nProbe = 3))
    val fromSaved = rows(Similarity.ivfTopKWith(corpus, queries, "embedding", "vec_id",
      loaded, k = 5, nProbe = 3))
    assert(fromSaved == inline)
    assert(fromSaved.nonEmpty)
  }

  test("forget on the assignment table == rebuild from the reduced corpus (multi-cluster)") {
    // the IVF forget contract in the PRODUCTION (nProbe < nCentroids)
    // config: centroids are doc-free and stay; removeIds over the
    // persisted assignment table, probed via ivfTopKAssigned, must be
    // value-equal to re-assigning the reduced corpus under the SAME
    // centroids - and no removed id may ever surface
    val cents = Similarity.kmeansCentroids(corpus, "embedding", "vec_id",
      nCentroids = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-fgt")
      .resolve("assigned").toString
    Similarity.ivfAssignWith(corpus, "embedding", cents)
      .write.mode("overwrite").parquet(dir)
    val removed = corpus.filter(col("vec_id") % 3 === 0)
    val kept = graft.operators.Forget.removeIds(
      spark.read.parquet(dir), "vec_id", removed, "vec_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("neighbor_id"), round(col("score"), 9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val forgotten = rows(Similarity.ivfTopKAssigned(
      kept, queries, "embedding", "vec_id", cents, k = 5, nProbe = 3))
    val rebuilt = rows(Similarity.ivfTopKWith(
      corpus.join(removed.select("vec_id"), Seq("vec_id"), "left_anti"),
      queries, "embedding", "vec_id", cents, k = 5, nProbe = 3))
    assert(forgotten == rebuilt)
    assert(forgotten.nonEmpty)
    val removedIds = removed.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(forgotten.forall { case (_, n, _) => !removedIds.contains(n) })
  }

  test("ivfDriftReport: exact ratios; enforceIvfFreshness fires on drift") {
    import spark.implicits._
    // two axis-aligned centroids; build corpus balanced 3/3
    val cents = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("centroid_id", "cv")
    def vecs(rows: (Long, Seq[Double])*) = rows.toDF("vec_id", "v")
    val build = vecs(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.1)), (3L, Seq(1.0, -0.1)),
      (4L, Seq(0.0, 1.0)), (5L, Seq(0.1, 1.0)), (6L, Seq(-0.1, 1.0)))
    val ref = Similarity.ivfAssignmentStats(
      Similarity.ivfAssignWith(build, "v", cents), "v", cents)
    // persisted alongside centroids; read back for the report
    val dir = java.nio.file.Files.createTempDirectory("ivf-drift-spec").toString
    Similarity.saveCentroids(cents, dir, Some(ref))
    val loadedRef = Similarity.loadIvfReference(spark, dir)
    // undrifted corpus: ratios 1, drops 0 → enforce passes
    val same = Similarity.ivfDriftReport(
      Similarity.ivfAssignWith(build, "v", cents), "v", cents, loadedRef)
    assert(Similarity.enforceIvfFreshness(same) eq same)
    assert(same.collect().forall(r =>
      r.getDouble(r.fieldIndex("occupancy_ratio")) == 1.0 &&
        r.getDouble(r.fieldIndex("mean_cos_drop")) == 0.0))
    // drifted corpus: bucket 0 swamped by far-from-centroid vectors
    val drift = build.unionByName(vecs(
      (10L, Seq(1.0, 0.9)), (11L, Seq(1.0, 0.9)), (12L, Seq(1.0, 0.9)),
      (13L, Seq(1.0, 0.9)), (14L, Seq(1.0, 0.9)), (15L, Seq(1.0, 0.9))))
    val report = Similarity.ivfDriftReport(
      Similarity.ivfAssignWith(drift, "v", cents), "v", cents, loadedRef)
    val b0 = report.filter(col("centroid_id") === 0).collect().head
    // occupancy: bucket 0 went 3/6 -> 9/12: ratio (9*6)/(3*12) = 1.5 exact
    assert(b0.getDouble(b0.fieldIndex("occupancy_ratio")) == 1.5)
    assert(b0.getDouble(b0.fieldIndex("mean_cos_drop")) > 0.0)
    val e = intercept[IllegalStateException] {
      Similarity.enforceIvfFreshness(report,
        maxOccupancyRatio = 1.2, maxMeanCosDrop = 0.01)
    }
    assert(e.getMessage.contains("value_range"), e.getMessage)
    // a bucket dying entirely fails closed through the non-null rules
    val dead = Similarity.ivfDriftReport(
      Similarity.ivfAssignWith(vecs((1L, Seq(1.0, 0.0))), "v", cents),
      "v", cents, loadedRef)
    intercept[IllegalStateException] { Similarity.enforceIvfFreshness(dead) }
    // an index saved WITHOUT the reference has no drift yardstick
    val bare = java.nio.file.Files.createTempDirectory("ivf-bare-spec").toString
    Similarity.saveCentroids(cents, bare)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.loadIvfReference(spark, bare)
    }
    assert(e2.getMessage.contains("_ivf_reference"), e2.getMessage)
    // and the reference sub-artifact is invisible to loadCentroids
    assert(Similarity.loadCentroids(spark, dir).collect().length == 2)
  }
}
