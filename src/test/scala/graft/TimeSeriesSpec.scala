package graft

import org.apache.spark.sql.functions._
import graft.functions.DtwDistExpr
import graft.operators.Similarity
import graft.streaming.Events

/** The time-series similarity family (SURVEY §2 row 176): fixed-grid
  * series vectors, the banded-DTW kernel, and the top-k search. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def dist(a: Seq[Double], b: Seq[Double], band: Int): Option[Double] = {
    val r = Seq((a, b)).toDF("a", "b")
      .select(DtwDistExpr(col("a"), col("b"), band)).collect().head
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("DTW properties: identity, symmetry, band widening never hurts, " +
    "band=0 == Manhattan on aligned series") {
    val rnd = new scala.util.Random(29)
    val cases = Seq.fill(40)(
      (Seq.fill(6 + rnd.nextInt(6))(rnd.nextInt(10).toDouble),
        Seq.fill(6 + rnd.nextInt(6))(rnd.nextInt(10).toDouble)))
    for ((a, b) <- cases) {
      // identity
      assert(dist(a, a, 0).contains(0.0))
      val wide = math.max(a.length, b.length)
      // symmetry at a feasible band
      assert(dist(a, b, wide) == dist(b, a, wide))
      // widening the band can only find cheaper (or equal) paths
      val d2 = dist(a, b, math.abs(a.length - b.length) + 1)
      val dW = dist(a, b, wide)
      assert(d2.isDefined && dW.isDefined && dW.get <= d2.get + 1e-12,
        s"band widening hurt: $d2 -> $dW")
      // band=0 over equal lengths degenerates to Manhattan distance
      if (a.length == b.length) {
        val manhattan = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(math.abs(dist(a, b, 0).get - manhattan) < 1e-9)
      }
    }
    // warping absorbs a pure shift that an aligned metric punishes
    val pulse = Seq(0.0, 0, 5, 5, 0, 0, 0, 0)
    val shifted = Seq(0.0, 5, 5, 0, 0, 0, 0, 0)
    assert(dist(pulse, shifted, 2).contains(0.0))
    assert(dist(pulse, shifted, 0).get > 0.0)
  }

  test("DTW null rules: infeasible band gap, empty side, null element") {
    assert(dist(Seq(1.0, 2, 3, 4, 5), Seq(1.0), 2).isEmpty) // |5-1| > 2
    assert(dist(Seq.empty[Double], Seq(1.0), 8).isEmpty)
    val withNull = Seq((Seq[java.lang.Double](1.0, null), Seq(1.0, 2.0)))
      .toDF("a", "b")
      .select(DtwDistExpr(col("a").cast("array<double>"), col("b"), 2))
      .collect().head
    assert(withNull.isNullAt(0))
    // SQL registration surface
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT dtw_dist(array(0.0d, 5.0d), array(5.0d, 0.0d), 1)")
      .collect().head.getDouble(0)
    assert(viaSql == 10.0)
  }

  test("seriesVectors: dense zero-filled grid, out-of-grid rows dropped, " +
    "one aggregation") {
    val t0 = 1704067200000000L // 2024-01-01T00:00:00Z
    val day = 86400000000L
    val ev = Seq(
      (1L, t0 + 1L, 2.0), (1L, t0 + day + 1L, 3.0), (1L, t0 + day + 2L, 4.0),
      (2L, t0 + 2 * day, 5.0),
      (2L, t0 - 1L, 99.0),          // before the grid: dropped
      (2L, t0 + 3 * day, 99.0))     // past nBuckets=3: dropped
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val out = Events.seriesVectors(ev, t0, day, nBuckets = 3)
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) == Seq(2.0, 7.0, 0.0))
    assert(out(2L) == Seq(0.0, 0.0, 5.0))
    // exactly one aggregate in the plan — no collect/pivot/regroup
    val plan = Events.seriesVectors(ev, t0, day, nBuckets = 3)
      .queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, plan.toString)
  }

  test("dtwTopK: rank/tiebreak contract and infeasible exclusion") {
    val corpus = Seq(
      (10L, Seq(0.0, 1, 5, 5, 1, 0, 0, 0)),
      (11L, Seq(0.0, 1, 5, 5, 1)) // infeasible vs len-8 at band 2
    ).toDF("id", "v")
    val q = Seq((1L, Seq(0.0, 1, 5, 5, 1, 0, 0, 0))).toDF("id", "v")
    val got = Similarity.dtwTopK(corpus, q, "v", "id", k = 5, band = 2)
      .select("neighbor_id", "dtw_dist", "rank")
      .as[(Long, Double, Int)].collect().toSeq
    assert(got == Seq((10L, 0.0, 1)))
  }
}
