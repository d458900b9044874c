package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Md5Long60Expr
import graft.operators.Sampling

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def esKey(seed: String, id: Long, w: Double): Double = {
    val h = Md5Long60Expr.hash(UTF8String.fromString(s"$seed:$id"))
    math.log((h + 1).toDouble / 1152921504606846976.0) / w
  }

  test("global top-k matches the reference A-Res keys, deterministic") {
    val rows = (0L until 300L).map(i => (i, 1.0 + (i % 17)))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "w", "id", k = 20, seed = "t1")
      .select("id", "es_key").as[(Long, Double)].collect()
    val want = rows.map { case (i, w) => (i, esKey("t1", i, w)) }
      .sortBy { case (i, k) => (-k, i) }.take(20)
    assert(got.sortBy(r => (-r._2, r._1)).map(_._1).toSeq === want.map(_._1).toSeq)
    got.sortBy(r => (-r._2, r._1)).zip(want).foreach { case ((_, gk), (_, wk)) =>
      assert(math.abs(gk - wk) < 1e-12)
    }
    // rerun: identical
    val again = Sampling.weightedSample(df, "w", "id", k = 20, seed = "t1")
      .select("id").as[Long].collect().toSet
    assert(again === got.map(_._1).toSet)
    // different seed: (almost surely) different sample
    val other = Sampling.weightedSample(df, "w", "id", k = 20, seed = "t2")
      .select("id").as[Long].collect().toSet
    assert(other !== got.map(_._1).toSet)
  }

  test("weights drive inclusion: the heavy item always beats featherweights") {
    // one item with weight 1e9 among 200 items with weight 1e-6: its
    // inclusion probability is ~1 for any seed — check several
    val df = ((0L until 200L).map(i => (i, 1e-6)) :+ (999L, 1e9)).toDF("id", "w")
    for (seed <- Seq("s1", "s2", "s3")) {
      val ids = Sampling.weightedSample(df, "w", "id", k = 5, seed = seed)
        .select("id").as[Long].collect().toSet
      assert(ids.contains(999L), s"seed $seed")
    }
  }

  test("null and non-positive weights are excluded; grouped arm takes k per group") {
    val df = Seq(
      (1L, Some(2.0), "a"), (2L, Some(0.0), "a"), (3L, None, "a"),
      (4L, Some(-1.0), "a"), (5L, Some(1.0), "a"),
      (6L, Some(1.0), "b"), (7L, Some(1.0), "b"), (8L, Some(1.0), "b"))
      .toDF("id", "w", "g")
    val global = Sampling.weightedSample(df, "w", "id", k = 10)
      .select("id").as[Long].collect().toSet
    assert(global === Set(1L, 5L, 6L, 7L, 8L))
    val grouped = Sampling.weightedSample(df, "w", "id", k = 2, byCol = Some("g"))
      .groupBy("g").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(grouped === Map("a" -> 2L, "b" -> 2L))
  }
}
