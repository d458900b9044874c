package graft

import org.apache.spark.sql.functions._
import graft.functions.WinnowExpr
import graft.operators.Dedup

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val W = 4

  /** Definitional reference: O(n·w) windows over directly-computed
    * polynomial hashes — no rolling update, no ring buffer. */
  private def reference(s: String, k: Int, w: Int): Set[(Int, Long)] = {
    val cps = s.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return Set.empty
    val hashes = (0 until m).map { p =>
      (0 until k).foldLeft(0L)((h, j) =>
        (h * WinnowExpr.Base + cps(p + j)) % WinnowExpr.Mod)
    }
    (0 until math.max(1, m - w + 1)).map { wi =>
      val end = math.min(wi + w, m)
      // rightmost minimum
      val best = (wi until end).minBy(p => (hashes(p), -p))
      (best, hashes(best))
    }.toSet
  }

  private def winnowOf(s: String, k: Int = K, w: Int = W): Set[(Int, Long)] =
    Seq(Tuple1(s)).toDF("t")
      .select(explode(WinnowExpr(col("t"), k, w)).as("f"))
      .select("f.pos", "f.hash").as[(Int, Long)].collect().toSet

  test("matches the definitional reference on random strings") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", "abcde", "abcdefghijklmnop ")
    for (a <- alphabets; len <- Seq(7, 8, 9, 20, 100, 400)) {
      val s = (0 until len).map(_ => a(rnd.nextInt(a.length))).mkString
      assert(winnowOf(s) == reference(s, K, W), s"len=$len alpha=$a s=$s")
    }
  }

  test("tie rule: constant text selects each window's rightmost position") {
    // all k-gram hashes equal -> rightmost min per window -> positions
    // w-1 .. m-1 exactly
    val got = winnowOf("a" * 16) // m = 9 grams
    assert(got.map(_._1) == (W - 1 until 9).toSet)
    assert(got.map(_._2).size == 1)
  }

  test("short text is empty; window guarantee covers every window") {
    assert(winnowOf("short") == Set.empty)
    assert(winnowOf("a" * (K - 1)) == Set.empty)
    assert(winnowOf("a" * K).map(_._1) == Set(0)) // one gram, one window
    // every window of w grams contains a selected position (locality)
    val s = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .alphanumeric.take(300).mkString
    val sel = winnowOf(s).map(_._1)
    val m = s.length - K + 1
    for (wi <- 0 until (m - W + 1))
      assert(sel.exists(p => p >= wi && p < wi + W), s"window $wi uncovered")
  }

  test("winnowTable normalization: re-cased/re-spaced copies fingerprint identically") {
    val df = Seq(
      (1L, "The Quick   Brown Fox\n\nJumps Over The Lazy Dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely unrelated content that is here to differ a lot"))
      .toDF("doc_id", "text")
    val t = Dedup.winnowTable(df, "text", "doc_id", K, W)
      .select("doc_id", "pos", "hash")
      .as[(Long, Int, Long)].collect().groupBy(_._1)
    assert(t(1L).map(x => (x._2, x._3)).toSet == t(2L).map(x => (x._2, x._3)).toSet)
    assert(t(1L).map(_._3).toSet.intersect(t(3L).map(_._3).toSet).isEmpty)
  }

  test("winnowedOverlapPairs: a planted shared run pairs, minShared gates") {
    val shared = "this exact block of twenty words is copied verbatim between two documents"
    val df = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"one two three four five $shared six seven"),
      (3L, "nothing in common with anything else at all here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowedOverlapPairs(df, "text", "doc_id", K, W, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L)))
    // the shared run is ~74 chars -> far more than 2 shared fingerprints
    assert(pairs((1L, 2L)) >= 10L)
    // a high minShared threshold drops the pair
    assert(Dedup.winnowedOverlapPairs(df, "text", "doc_id", K, W,
      minShared = 1000).count() == 0L)
  }

  test("NULL text and argument validation") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("x" * 20))).toDF("doc_id", "text")
    val out = df.select(WinnowExpr(col("text"), K, W).as("f"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0))
    intercept[IllegalArgumentException] { WinnowExpr(col("text"), 0, 4) }
    intercept[IllegalArgumentException] { WinnowExpr(col("text"), 8, 0) }
  }

  test("winnowedOverlapPairsAgainst: cross-corpus parity and the k/w guard") {
    val shared = "this exact block of twenty words is copied verbatim between corpora"
    val prior = Seq(
      (1L, s"alpha beta gamma $shared delta"),
      (2L, "nothing of note here at all in this one"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"one two three $shared four"),
      (11L, "also nothing shared with anyone anywhere"))
      .toDF("doc_id", "text")
    val idx = Dedup.winnowIndex(prior, "text", "doc_id", K, W)
    val got = Dedup.winnowedOverlapPairsAgainst(batch, idx, "text", "doc_id",
        K, W, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == Set((10L, 1L)))
    // reference: distinct shared hashes between the two docs directly
    val expect = winnowOf(
        s"alpha beta gamma $shared delta".toLowerCase).map(_._2)
      .intersect(winnowOf(s"one two three $shared four").map(_._2)).size
    assert(got((10L, 1L)) == expect && expect >= 2)
    // a mismatched-parameter probe fails loudly instead of silently
    // sharing nothing
    val ex = intercept[Exception] {
      Dedup.winnowedOverlapPairsAgainst(batch, idx, "text", "doc_id",
        k = K, w = W + 1, minShared = 1).collect()
    }
    assert(ex.getMessage != null)
  }
}
