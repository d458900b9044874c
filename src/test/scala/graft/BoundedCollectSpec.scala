package graft

import org.apache.spark.sql.functions._
import graft.functions.BoundedCollectAgg

/** Unit pins for the single-pass bounded bucket collection
  * ([[graft.functions.BoundedCollectAgg]]) — the r18 replacement for the
  * two-pass count+join cap. Every property here is load-bearing for the
  * LSH-family caps in [[graft.operators.Dedup]]. */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  private def bucketize(df: org.apache.spark.sql.DataFrame, cap: Int, distinct: Boolean) =
    df.repartition(7) // force multi-partition partial/merge paths
      .groupBy("k")
      .agg(BoundedCollectAgg(col("v"), cap, distinct).as("bc"))
      .select(col("k"), col("bc.n").as("n"),
        array_sort(col("bc.items")).as("items"))

  test("row parity: exact count, complete items for under-cap groups, " +
    "empty items past the cap") {
    val df = (Seq.tabulate(5)(i => ("small", i.toLong)) ++
      Seq.tabulate(40)(i => ("big", i.toLong))).toDF("k", "v")
    val got = bucketize(df, cap = 10, distinct = false)
      .as[(String, Long, Seq[Long])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("small") === ((5L, (0L until 5L).toSeq)))
    // over-cap: count stays EXACT (40, not saturated), items withheld
    assert(got("big") === ((40L, Seq.empty[Long])))
  }

  test("row parity keeps duplicates (collect_list semantics)") {
    val df = Seq(("k", 1L), ("k", 1L), ("k", 2L)).toDF("k", "v")
    val got = bucketize(df, cap = 10, distinct = false)
      .as[(String, Long, Seq[Long])].collect().head
    assert(got === (("k", 3L, Seq(1L, 1L, 2L))))
  }

  test("distinct parity: dedup across partitions, count saturates at cap+1") {
    // 60 rows, 6 distinct values, heavily duplicated across partitions
    val small = (0 until 60).map(i => ("small", (i % 6).toLong))
    // 100 distinct values -> saturates a cap of 8 at 9
    val big = (0 until 100).map(i => ("big", i.toLong))
    val got = bucketize((small ++ big).toDF("k", "v"), cap = 8, distinct = true)
      .as[(String, Long, Seq[Long])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("small") === ((6L, (0L until 6L).toSeq)))
    assert(got("big")._1 === 9L) // cap + 1: the saturation floor
    assert(got("big")._2.isEmpty)
  }

  test("null items are skipped in count and items (collect_* semantics)") {
    val df = Seq(("k", Some(1L)), ("k", None), ("k", Some(2L)), ("k", None))
      .toDF("k", "v")
    val got = bucketize(df, cap = 3, distinct = false)
      .as[(String, Long, Seq[Long])].collect().head
    assert(got === (("k", 2L, Seq(1L, 2L))))
    // an all-null group still appears, with n = 0 and no items
    val nulls = Seq(("z", Option.empty[Long])).toDF("k", "v")
    val gotNull = bucketize(nulls, cap = 3, distinct = false)
      .as[(String, Long, Seq[Long])].collect().head
    assert(gotNull === (("z", 0L, Seq.empty[Long])))
  }

  test("struct items dedup by VALUE, not object identity") {
    val df = (0 until 30).map(i => ("k", i % 3, s"s${i % 3}"))
      .toDF("k", "a", "b")
      .select(col("k"), struct(col("a"), col("b")).as("v"))
    val got = df.repartition(5).groupBy("k")
      .agg(BoundedCollectAgg(col("v"), 10, distinct = true).as("bc"))
      .select(col("bc.n")).as[Long].collect().head
    assert(got === 3L)
  }

  test("boundary: exactly cap distinct members survive; cap+1 drop") {
    val atCap = (0 until 10).map(i => ("k", i.toLong)).toDF("k", "v")
    val g1 = bucketize(atCap, cap = 10, distinct = true)
      .as[(String, Long, Seq[Long])].collect().head
    assert(g1 === (("k", 10L, (0L until 10L).toSeq)))
    val overCap = (0 until 11).map(i => ("k", i.toLong)).toDF("k", "v")
    val g2 = bucketize(overCap, cap = 10, distinct = true)
      .as[(String, Long, Seq[Long])].collect().head
    assert(g2._2 === 11L)
    assert(g2._3.isEmpty)
  }

  test("matches collect_set/collect_list exactly on every under-cap group " +
    "(randomized, multi-partition)") {
    val rnd = new scala.util.Random(18)
    val rows = (0 until 500).map { _ =>
      (s"k${rnd.nextInt(20)}", rnd.nextInt(15).toLong)
    }
    val df = rows.toDF("k", "v").repartition(11)
    val cap = 40 // every group under cap (max 15 distinct, ~25 rows/group)
    val wantSet = df.groupBy("k").agg(sort_array(collect_set(col("v"))).as("s"))
      .as[(String, Seq[Long])].collect().toMap
    val gotSet = bucketize(df, cap, distinct = true)
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(gotSet === wantSet)
    val wantList = df.groupBy("k").agg(sort_array(collect_list(col("v"))).as("s"))
      .as[(String, Seq[Long])].collect().toMap
    val gotList = bucketize(df, cap, distinct = false)
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(gotList === wantList)
  }

  test("randomized equivalence with collect_list/collect_set semantics " +
    "across caps (seeded, multi-partition)") {
    val rnd = new scala.util.Random(20260816L)
    // skewed groups: a few huge, many small — exercises partial
    // saturation, merge-path dedup, and boundary caps together
    val rows = (0 until 4000).map { _ =>
      val g = rnd.nextInt(30)
      val k = if (g < 3) s"big$g" else s"k$g"
      (k, rnd.nextInt(if (g < 3) 200 else 12).toLong)
    }
    val df = rows.toDF("k", "v").repartition(13)
    val byKey = rows.groupBy(_._1)
    for (cap <- Seq(2, 7, 64, 500)) {
      // list parity: keep/drop by ROW count, survivors carry the exact
      // multiset, counts exact even past the cap
      val gotL = bucketize(df, cap, distinct = false)
        .as[(String, Long, Seq[Long])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      byKey.foreach { case (k, vs) =>
        val (n, items) = gotL(k)
        assert(n == vs.size.toLong, s"cap=$cap k=$k")
        if (vs.size <= cap)
          assert(items == vs.map(_._2).sorted, s"cap=$cap k=$k")
        else assert(items.isEmpty, s"cap=$cap k=$k")
      }
      // set parity: keep/drop by DISTINCT count, survivors carry the
      // exact distinct set, over-cap saturates at cap+1
      val gotS = bucketize(df, cap, distinct = true)
        .as[(String, Long, Seq[Long])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      byKey.foreach { case (k, vs) =>
        val distinct = vs.map(_._2).distinct.sorted
        val (n, items) = gotS(k)
        if (distinct.size <= cap) {
          assert(n == distinct.size.toLong, s"cap=$cap k=$k")
          assert(items == distinct, s"cap=$cap k=$k")
        } else {
          assert(n == cap + 1L, s"cap=$cap k=$k (saturation floor)")
          assert(items.isEmpty, s"cap=$cap k=$k")
        }
      }
    }
  }

  test("cap below 2 fails analysis") {
    val df = Seq(("k", 1L)).toDF("k", "v")
    val e = intercept[Exception] {
      df.groupBy("k").agg(BoundedCollectAgg(col("v"), 1, distinct = false)).collect()
    }
    assert(e.getMessage.contains("cap must be >= 2"), e.getMessage)
  }
}
