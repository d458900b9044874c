package graft

import org.apache.spark.sql.functions._
import graft.functions.AcAutomaton
import graft.operators.PhraseMatch

class PhraseMatchSpec extends SparkSpec {
  import spark.implicits._

  test("automaton equals brute force on randomized inputs (overlaps forced)") {
    val rnd = new scala.util.Random(31)
    val alphabet = "abc"
    def randStr(n: Int) = (1 to n).map(_ => alphabet(rnd.nextInt(3))).mkString
    val patterns = (1 to 40).map(_ => randStr(1 + rnd.nextInt(4))).distinct.toIndexedSeq
    val ac = new AcAutomaton(patterns, caseInsensitive = false)
    for (_ <- 1 to 200) {
      val text = randStr(rnd.nextInt(30))
      val got = ac.matchIds(text).toSeq
      val want = patterns.zipWithIndex.collect {
        case (p, i) if text.contains(p) => i
      }
      assert(got === want, s"text='$text' patterns=$patterns")
    }
  }

  test("overlapping and nested patterns all report") {
    val ac = new AcAutomaton(IndexedSeq("ab", "ba", "aba", "b"), caseInsensitive = false)
    assert(ac.matchIds("aba").toSeq === Seq(0, 1, 2, 3))
    assert(ac.matchIds("ab").toSeq === Seq(0, 3))
    assert(ac.matchIds("cc").toSeq === Seq())
  }

  test("case-insensitive arm lowercases both sides; originals returned") {
    val df = Seq((1L, "The Quick Fox"), (2L, "nothing here"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val out = PhraseMatch.withMatches(df, "text", Seq("QUICK", "fox", "absent"))
      .select(col("id"), col("matched_phrases"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    assert(out(1L) === Some(Seq("QUICK", "fox")))
    assert(out(2L) === Some(Seq()))
    assert(out(3L) === None)
    // case-sensitive arm distinguishes
    val cs = PhraseMatch.withMatches(df, "text", Seq("QUICK", "Fox"),
        caseInsensitive = false)
      .select(col("id"), col("matched_phrases"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    assert(cs(1L) === Some(Seq("Fox")))
  }

  test("dropMatching removes matched rows, keeps NULL text") {
    val df = Seq((1L, "contains bad phrase"), (2L, "clean"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val kept = PhraseMatch.dropMatching(df, "text", Seq("bad phrase"))
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L, 3L))
  }

  test("scales past regex alternation: 10k patterns in one pass") {
    val patterns = (1 to 10000).map(i => s"tok${i}x")
    val ac = new AcAutomaton(patterns.toIndexedSeq, caseInsensitive = false)
    assert(ac.matchIds("prefix tok42x suffix tok9999x").toSeq === Seq(41, 9998))
    assert(ac.matchIds("tok10001x").toSeq === Seq())
  }

  test("guards: empty list and empty pattern rejected") {
    intercept[IllegalArgumentException] {
      new AcAutomaton(IndexedSeq.empty, caseInsensitive = false)
    }
    intercept[IllegalArgumentException] {
      new AcAutomaton(IndexedSeq("a", ""), caseInsensitive = false)
    }
    // duplicates — including ones created by case folding — are a
    // blocklist bug, not something to silently alias
    intercept[IllegalArgumentException] {
      new AcAutomaton(IndexedSeq("x", "x"), caseInsensitive = false)
    }
    intercept[IllegalArgumentException] {
      new AcAutomaton(IndexedSeq("Spam", "spam"), caseInsensitive = true)
    }
    // same two are DISTINCT case-sensitively
    assert(new AcAutomaton(IndexedSeq("Spam", "spam"), caseInsensitive = false)
      .matchIds("spam Spam").toSeq === Seq(0, 1))
  }
}
