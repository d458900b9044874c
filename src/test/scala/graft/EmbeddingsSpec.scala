package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Embeddings}

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val embs =
    spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")

  test("l2Normalize yields unit vectors; zero-norm and NULL vectors go NULL") {
    val unit = embs.select(
        Embeddings.l2Norm(Embeddings.l2Normalize(col("embedding"))).as("n"))
      .agg(min("n"), max("n")).head()
    assert(math.abs(unit.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(unit.getDouble(1) - 1.0) < 1e-9)
    val edge = Seq(
      (1L, Some(Seq(0.0f, 0.0f))),
      (2L, Option.empty[Seq[Float]])
    ).toDF("vec_id", "embedding")
      .select(Embeddings.l2Normalize(col("embedding")).as("nv"))
      .collect()
    assert(edge.forall(_.isNullAt(0)))
  }

  test("quantize/dequantize roundtrip error is bounded by half a step (scale/254)") {
    val q = Embeddings.quantizeInt8(embs, "embedding", "vec_id")
    val joined = embs.join(q, "vec_id")
      .select(
        col("scale"),
        aggregate(
          zip_with(
            col("embedding"),
            Embeddings.dequantize(col("q"), col("scale")),
            (x, d) => abs(x.cast("double") - d)),
          lit(0.0), (acc, e) => greatest(acc, e)).as("max_err"))
    val bad = joined.filter(col("max_err") > col("scale") / 254.0 + 1e-12).count()
    assert(bad == 0)
    // bytes actually span the int8 range: every vector's max |element|
    // quantizes to ±127
    val extremes = q.select(array_max(transform(col("q"), x => abs(x.cast("int")))).as("m"))
      .filter(col("m") =!= 127).count()
    assert(extremes == 0)
  }

  test("quantizeInt8: all-zero vector -> scale 0, zero bytes") {
    val out = Embeddings.quantizeInt8(
        Seq((1L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"),
        "embedding", "vec_id").head()
    assert(out.getAs[Double]("scale") == 0.0)
    assert(out.getSeq[Byte](out.fieldIndex("q")).toSeq == Seq(0, 0, 0).map(_.toByte))
  }

  test("semanticNearDups multi-cluster: planted identical vectors always pair at 1.0") {
    val e = embs
    val dups = e.filter(col("vec_id") % 25 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val corpus = e.unionByName(dups)
    val pairs = Dedup.semanticNearDups(corpus, "embedding", "vec_id",
        threshold = 0.999, nCentroids = 8, kmeansIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = dups.select("vec_id").collect()
      .map(r => (r.getLong(0) - 100000, r.getLong(0))).toSet
    // identical vectors share an argmax centroid, so the cluster route
    // can never miss an exact duplicate
    assert(expected.subsetOf(pairs), s"missing: ${expected -- pairs}")
  }

  test("semanticNearDups multi-cluster pairs are a subset of the all-pairs set") {
    val corpus = embs
    val multi = Dedup.semanticNearDups(corpus, "embedding", "vec_id",
        threshold = 0.9, nCentroids = 8, kmeansIters = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = Dedup.semanticNearDups(corpus, "embedding", "vec_id",
        threshold = 0.9, nCentroids = 1, kmeansIters = 1, maxCluster = None)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(multi.subsetOf(all))
  }

  test("semanticNearDupsWith from persisted centroids == in-line build") {
    val cents = graft.operators.Similarity.kmeansCentroids(
      embs, "embedding", "vec_id", nCentroids = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup-cents")
      .resolve("centroids").toString
    graft.operators.Similarity.saveCentroids(cents, dir)
    val loaded = graft.operators.Similarity.loadCentroids(spark, dir)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = pairs(Dedup.semanticNearDups(embs, "embedding", "vec_id",
      threshold = 0.9, nCentroids = 8, kmeansIters = 2))
    val fromSaved = pairs(Dedup.semanticNearDupsWith(embs, "embedding", "vec_id",
      loaded, threshold = 0.9))
    assert(fromSaved == inline)
  }

  test("dropSemanticDuplicates keeps the lowest id of each duplicate group") {
    val e = embs.filter(col("vec_id") < 100)
    val corpus = e.unionByName(
      e.filter(col("vec_id") % 10 === 0).withColumn("vec_id", col("vec_id") + 100000))
    val kept = Dedup.dropSemanticDuplicates(corpus, "embedding", "vec_id",
        threshold = 0.999, nCentroids = 1, kmeansIters = 1, maxCluster = None)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // every planted copy (higher id) gone, every original still there
    assert(kept.forall(_ < 100000))
    assert(e.collect().map(_.getLong(0)).toSet.subsetOf(kept))
  }

  test("randomProject: matches the driver-side reference, deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vecs = (1L to 50L).map(i => (i, Seq.fill(32)(rnd.nextFloat())))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Embeddings.randomProject(df, "embedding", outDim = 8, seed = "t")
      .select("vec_id", "proj").as[(Long, Seq[Double])].collect().toMap
    // reference: same signs from the same hash
    val s = 1.0 / math.sqrt(8.0)
    def sign(j: Int, i: Int): Double =
      if (graft.functions.Md5Long60Expr.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"t:$j:$i")) % 2 == 0) s else -s
    for ((id, v) <- vecs) {
      val want = (0 until 8).map { j =>
        (0 until 32).map(i => sign(j, i) * v(i).toDouble).sum
      }
      val got = out(id)
      assert(got.size === 8)
      (got, want).zipped.foreach((g, w) => assert(math.abs(g - w) < 1e-12))
    }
    // determinism across runs
    val again = Embeddings.randomProject(df, "embedding", outDim = 8, seed = "t")
      .select("vec_id", "proj").as[(Long, Seq[Double])].collect().toMap
    assert(again === out)
  }

  test("randomProject: JL distance preservation in expectation (loose band)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vecs = (1L to 40L).map(i => (i, Seq.fill(256)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val proj = Embeddings.randomProject(df, "embedding", outDim = 64)
      .select("vec_id", "proj").as[(Long, Seq[Double])].collect().toMap
    // mean relative squared-distance distortion over random pairs must be
    // small (E[dist² preserved]; ε ~ sqrt(8·ln(pairs)/outDim) is ~0.6 at
    // these sizes per-pair — the MEAN over 40 pairs concentrates much
    // tighter; assert a generous 0.25)
    val pairs = (1L to 40L).sliding(2).toSeq
    val rel = pairs.map { case Seq(a, b) =>
      val va = vecs(a.toInt - 1)._2.map(_.toDouble)
      val vb = vecs(b.toInt - 1)._2.map(_.toDouble)
      val d2 = (va, vb).zipped.map((x, y) => (x - y) * (x - y)).sum
      val pa = proj(a); val pb = proj(b)
      val p2 = (pa, pb).zipped.map((x, y) => (x - y) * (x - y)).sum
      math.abs(p2 - d2) / d2
    }
    assert(rel.sum / rel.size < 0.25, s"mean distortion ${rel.sum / rel.size}")
    // wrong-length and NULL vectors project to NULL
    val odd = Seq((1L, Seq(1.0f, 2.0f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val nulls = Embeddings.randomProject(
        odd.unionByName(Seq((3L, Seq.fill(2)(1.0f))).toDF("vec_id", "embedding")),
        "embedding", outDim = 4)
      .select(col("vec_id"), col("proj").isNull).as[(Long, Boolean)]
      .collect().toMap
    assert(!nulls(1L) && nulls(2L) && !nulls(3L))
    // a mismatched row against the inferred dim nulls out
    val mixed = Seq((1L, Seq.fill(8)(1.0f)), (2L, Seq.fill(5)(1.0f)))
      .toDF("vec_id", "embedding")
    val m = Embeddings.randomProject(mixed, "embedding", outDim = 2)
      .select(col("vec_id"), col("proj").isNull).as[(Long, Boolean)]
      .collect().toMap
    assert(!m(1L) && m(2L))
  }
}
