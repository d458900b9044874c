package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference power iteration over a dense map — the
    * definitional computation, shared by every case below. */
  private def referenceRanks(
    edges: Seq[(String, String)],
    iterations: Int,
    d: Double = 0.85
  ): Map[String, Double] = {
    val dedup = edges.distinct
    val nodes = dedup.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = dedup.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var rank = nodes.map(v => v -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      val dm = nodes.filterNot(out.contains).map(rank).sum
      val contrib = dedup
        .groupBy(_._2)
        .view.mapValues(_.map { case (u, _) => rank(u) / out(u) }.sum)
        .toMap
      rank = nodes.map(v =>
        v -> ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dm / n))).toMap
    }
    rank
  }

  private val diamond = Seq(
    ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a"))

  test("pageRank matches the definitional power iteration on a known graph") {
    val got = Graph.pageRank(diamond.toDF("s", "t"), "s", "t", iterations = 12)
      .as[(String, Double)].collect().toMap
    val want = referenceRanks(diamond, 12)
    assert(got.keySet === want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, k)
    // conservation: total rank mass stays 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRank handles dangling nodes (mass re-spreads, still sums to 1)") {
    // e is a pure sink: without the dangling correction, mass drains
    val g = Seq(("a", "b"), ("b", "e"), ("a", "e"), ("c", "a"), ("a", "c"))
    val got = Graph.pageRank(g.toDF("s", "t"), "s", "t", iterations = 15)
      .as[(String, Double)].collect().toMap
    val want = referenceRanks(g, 15)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, k)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the sink fed by everyone outranks its feeders' average
    assert(got("e") > got("b"))
  }

  test("pageRank on a randomized graph: parallel edges dedup, nulls dropped") {
    val rnd = new scala.util.Random(3)
    val edges = Seq.fill(300)((s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}"))
    val withNulls = edges.map { case (a, b) => (a, b) } ++
      Seq((null.asInstanceOf[String], "n1"), ("n2", null.asInstanceOf[String]))
    val got = Graph.pageRank(withNulls.toDF("s", "t"), "s", "t", iterations = 8)
      .as[(String, Double)].collect().toMap
    val want = referenceRanks(edges, 8)
    assert(got.keySet === want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12, k)
  }

  test("pageRank is deterministic, localizes under the node limit, leaves no blocks") {
    val df = diamond.toDF("s", "t")
    val r1 = Graph.pageRank(df, "s", "t", iterations = 6)
    // localized arm: the result is a driver-local relation — every loop
    // checkpoint already freed, nothing for the session sweep to find
    assert(GraftSession.sweepPersistedState(spark) === 0)
    val v1 = r1.as[(String, Double)].collect().toMap
    val v2 = Graph.pageRank(df, "s", "t", iterations = 6)
      .as[(String, Double)].collect().toMap
    assert(v1 === v2)
    GraftSession.sweepPersistedState(spark)
  }

  test("pageRank distributed arm (forced): agrees with the localized arm to 1e-12") {
    val df = diamond.toDF("s", "t")
    // localizeEdgeLimit = 0 forces the join-shaped loop even on a tiny
    // graph; localizeNodeLimit = 0 additionally forces the
    // checkpoint-backed result (caller frees)
    val r = Graph.pageRank(df, "s", "t", iterations = 4,
      localizeNodeLimit = 0, localizeEdgeLimit = 0)
    val v = r.as[(String, Double)].collect().toMap
    val local = Graph.pageRank(df, "s", "t", iterations = 4)
      .as[(String, Double)].collect().toMap
    val want = referenceRanks(diamond, 4)
    for ((k, x) <- want) {
      assert(math.abs(v(k) - x) < 1e-12, k)
      assert(math.abs(local(k) - x) < 1e-12, k)
      assert(math.abs(v(k) - local(k)) < 1e-12, k)
    }
    org.apache.spark.sql.GraftSqlBridge.unpersistLocalCheckpoint(r)
    assert(GraftSession.sweepPersistedState(spark) === 0)
  }

  test("pageRank distributed arm with node-localized result: no blocks left") {
    val df = diamond.toDF("s", "t")
    val r = Graph.pageRank(df, "s", "t", iterations = 3, localizeEdgeLimit = 0)
    val v = r.as[(String, Double)].collect().toMap
    assert(GraftSession.sweepPersistedState(spark) === 0)
    val want = referenceRanks(diamond, 3)
    for ((k, x) <- want) assert(math.abs(v(k) - x) < 1e-12, k)
  }

  test("pageRank validates its arguments") {
    val df = diamond.toDF("s", "t")
    intercept[IllegalArgumentException] {
      Graph.pageRank(df, "s", "t", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(df, "s", "t", damping = 1.0)
    }
  }

  test("labelPropagation: hand-computed synchronous rounds with min-label ties") {
    // triangle 1-2-3 plus the 4-5 pair (which oscillates under
    // synchronous updates — bipartite, the documented LPA behavior;
    // determinism is the contract, not convergence)
    val df = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L)).toDF("s", "t")
    val r1 = Graph.labelPropagation(df, "s", "t", iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 5L, 5L -> 4L))
    val r2 = Graph.labelPropagation(df, "s", "t", iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }

  test("labelPropagation separates two dense communities joined by one bridge") {
    val cliqueA = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val cliqueB = for (a <- 11L to 15L; b <- (a + 1) to 15L) yield (a, b)
    val df = (cliqueA ++ cliqueB ++ Seq((5L, 11L))).toDF("s", "t")
    val labels = Graph.labelPropagation(df, "s", "t", iterations = 4)
      .as[(Long, Long)].collect().toMap
    val la = (1L to 5L).map(labels)
    val lb = (12L to 15L).map(labels)
    assert(la.distinct.size === 1, s"community A split: $labels")
    assert(lb.distinct.size === 1, s"community B split: $labels")
    assert(la.head !== lb.head, s"communities merged: $labels")
  }

  test("labelPropagation distributed arm agrees with the localized arm") {
    val rnd = new scala.util.Random(41)
    val edges = (1 to 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val df = edges.toDF("s", "t")
    val local = Graph.labelPropagation(df, "s", "t", iterations = 3)
      .as[(Long, Long)].collect().toMap
    val dist = Graph.labelPropagation(df, "s", "t", iterations = 3,
        localizeEdgeLimit = 0)
      .as[(Long, Long)].collect().toMap
    assert(local === dist)
    assert(GraftSession.sweepPersistedState(spark) === 0)
  }

  test("labelPropagation on string nodes: binary-order ties agree across arms") {
    val df = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"))
      .toDF("s", "t")
    val local = Graph.labelPropagation(df, "s", "t", iterations = 2)
      .as[(String, String)].collect().toMap
    val dist = Graph.labelPropagation(df, "s", "t", iterations = 2,
        localizeEdgeLimit = 0)
      .as[(String, String)].collect().toMap
    assert(local === dist)
  }
}
