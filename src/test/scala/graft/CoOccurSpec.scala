package graft

import org.apache.spark.sql.functions._
import graft.operators.CoOccur

class CoOccurSpec extends SparkSpec {
  import spark.implicits._

  private def refPairs(texts: Seq[String], window: Int): Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map.empty[(String, String), Long]
    for (t <- texts) {
      val ws = t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim match {
        case "" => Array.empty[String]
        case s => s.split(" ")
      }
      for (i <- ws.indices; j <- (i + 1) until math.min(i + window + 1, ws.length)) {
        val k = if (ws(i) <= ws(j)) (ws(i), ws(j)) else (ws(j), ws(i))
        m(k) = m.getOrElse(k, 0L) + 1L
      }
    }
    m.toMap
  }

  test("co-occurrence counts match brute force on randomized docs") {
    val rnd = new scala.util.Random(19)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff", "g")
    val texts = (0 until 80).map(_ =>
      (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (w <- Seq(1, 3)) {
      val got = CoOccur.coOccurrence(df, "text", window = w)
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === refPairs(texts, w), s"window $w")
    }
  }

  test("pair keys are unordered; minCount prunes") {
    val df = Seq((1L, "x y"), (2L, "y x"), (3L, "x z")).toDF("id", "text")
    val got = CoOccur.coOccurrence(df, "text", window = 2)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map(("x", "y") -> 2L, ("x", "z") -> 1L))
    val pruned = CoOccur.coOccurrence(df, "text", window = 2, minCount = 2)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(pruned === Set(("x", "y")))
  }

  test("pmi matches the reference formula; P stays unfiltered under minCount") {
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("id", "text")
    // pairs window 2: doc1: (a,b)i01,(a,a)i02,(b,b)i13,(a,b)i12,(a,b)i23 -> ab:3, aa:1, bb:1
    // doc2: (a,c):1  => P = 6; unigrams a:3... doc1 a twice + doc2 a once = 3, b:2, c:1, T=6
    val got = CoOccur.pmi(df, "text", window = 2)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    def ref(nab: Long, na: Long, nb: Long): Double =
      math.log((nab.toDouble / 6.0) / ((na.toDouble / 6.0) * (nb.toDouble / 6.0)))
    assert(got(("a", "b"))._1 === 3L)
    assert(math.abs(got(("a", "b"))._2 - ref(3, 3, 2)) < 1e-12)
    assert(math.abs(got(("a", "a"))._2 - ref(1, 3, 3)) < 1e-12)
    assert(math.abs(got(("a", "c"))._2 - ref(1, 3, 1)) < 1e-12)
    // minCount filters the OUTPUT but not the probability space
    val filtered = CoOccur.pmi(df, "text", window = 2, minCount = 2)
      .as[(String, String, Long, Double)].collect()
    assert(filtered.length === 1 && filtered.head._1 === "a" && filtered.head._2 === "b")
    assert(math.abs(filtered.head._4 - ref(3, 3, 2)) < 1e-12)
  }

  test("associationRules: hand-computed support/confidence/lift, set semantics") {
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"), (1L, "x"), // duplicate x collapses
      (2L, "x"), (2L, "y"),
      (3L, "x"),
      (4L, "y"), (4L, "w")).toDF("txn", "item")
    val got = CoOccur.associationRules(df, "txn", "item")
      .as[(String, String, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    // N=4, n_x=3, n_y=3, n_z=1, n_w=1
    val (nab, sup, conf, lift) = got(("x", "y"))
    assert(nab === 2L && sup === 0.5)
    assert(math.abs(conf - 2.0 / 3.0) < 1e-15)
    assert(math.abs(lift - (2.0 / 3.0) / (3.0 / 4.0)) < 1e-15)
    val zx = got(("z", "x"))
    assert(zx._1 === 1L && zx._3 === 1.0) // z always with x
    assert(math.abs(zx._4 - 1.0 / (3.0 / 4.0)) < 1e-15)
    assert(got.contains(("y", "x")) && !got.contains(("z", "w")))
    // minSupportCount prunes pairs, both directions
    val pruned = CoOccur.associationRules(df, "txn", "item", minSupportCount = 2)
      .as[(String, String, Long, Double, Double, Double)].collect()
    assert(pruned.map(r => (r._1, r._2)).toSet === Set(("x", "y"), ("y", "x")))
  }

  test("short and empty docs contribute no pairs; window guard") {
    val df = Seq((1L, "solo"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    assert(CoOccur.coOccurrence(df, "text").count() === 0L)
    intercept[IllegalArgumentException] {
      CoOccur.coOccurrence(df, "text", window = 0)
    }
  }
}
