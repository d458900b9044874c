package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("hashSample: deterministic, repartition-stable, ~fraction of rows") {
    val n = docs.count()
    val a = Sampling.hashSample(docs, "doc_id", 0.25).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.25).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b) // membership is a function of (seed, id), not partitioning
    assert(math.abs(a.size.toDouble / n - 0.25) < 0.1)
    // different seeds select different (overlapping but not equal) rows
    val c = Sampling.hashSample(docs, "doc_id", 0.25, seed = "other").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(c != a)
    // boundary fractions
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() == 0)
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == n)
    // below-resolution fractions fail loudly instead of sampling nothing
    intercept[IllegalArgumentException] {
      Sampling.hashSample(docs, "doc_id", 0.1 / Sampling.Buckets)
    }
    // (tiny LAST splits absorb the rounding remainder by design, so the
    // zero-width check is exercised with the tiny split in the middle)
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, "doc_id",
        Seq(("val", 0.01 / Sampling.Buckets), ("train", 1.0)))
    }
  }

  test("hashSample of a smaller fraction is a subset of a larger one (same seed)") {
    val small = Sampling.hashSample(docs, "doc_id", 0.1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val large = Sampling.hashSample(docs, "doc_id", 0.3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large)) // nested samples: growing the sample keeps prior members
  }

  test("splitAssign: total coverage, disjoint splits, weights ~respected, integer weights ok") {
    val out = Sampling.splitAssign(docs, "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(out.keySet == Set("train", "val", "test"))
    assert(out.values.sum == n.toLong) // every row in exactly one split
    assert(math.abs(out("train") / n - 0.8) < 0.1)
    // unnormalized integer weights give the same assignment
    val byInts = Sampling.splitAssign(docs, "doc_id",
        Seq(("train", 8.0), ("val", 1.0), ("test", 1.0)))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byInts == out)
  }

  test("splitAssign with one split labels everything") {
    val out = Sampling.splitAssign(docs, "doc_id", Seq(("all", 1.0)))
    assert(out.filter(col("split") === "all").count() == docs.count())
  }

  test("binByTokenBudget: bins respect the budget up to one straddling row") {
    import spark.implicits._
    val df = Seq(
      (1L, 900L), (2L, 900L), (3L, 900L), // bins: prefix 0, 900, 1800
      (4L, 5000L),                        // oversized row
      (5L, 100L)
    ).toDF("doc_id", "tok")
    val out = Sampling.binByTokenBudget(df, "tok", "doc_id", budget = 2000L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin_id")).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 3L))
    // per-bin totals: at most budget + one row's tokens
    val sums = Sampling.binByTokenBudget(df, "tok", "doc_id", budget = 2000L)
      .groupBy("bin_id").agg(sum("tok").as("s"), max("tok").as("m")).collect()
    sums.foreach(r => assert(r.getLong(1) <= 2000L + r.getLong(2)))
  }

  test("binByTokenBudget partitioned by key bins each group independently") {
    import spark.implicits._
    val df = Seq(
      ("en", 1L, 1500L), ("en", 2L, 1500L),
      ("de", 3L, 1500L), ("de", 4L, 1500L)
    ).toDF("lang", "doc_id", "tok")
    val out = Sampling.binByTokenBudget(df, "tok", "doc_id", budget = 2000L,
        byCol = Some("lang"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin_id")).toMap
    // both groups restart at bin 0 — doc 3 is de's FIRST row, not a continuation
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }
}
