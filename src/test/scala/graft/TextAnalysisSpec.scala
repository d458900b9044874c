package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(t: String, c: org.apache.spark.sql.Column): Any =
    Seq(t).toDF("text").select(c).head.get(0)

  test("wsTokenCount: whitespace runs, blanks, empty") {
    assert(one("a b  c", TextAnalysis.wsTokenCount(col("text"))) == 3)
    assert(one("  ", TextAnalysis.wsTokenCount(col("text"))) == 0)
    assert(one("", TextAnalysis.wsTokenCount(col("text"))) == 0)
    assert(one("one\ttwo\nthree", TextAnalysis.wsTokenCount(col("text"))) == 3)
  }

  test("bpeishTokenCount: letter runs, digit runs, single marks") {
    assert(one("ab1 c!", TextAnalysis.bpeishTokenCount(col("text"))) == 4)
    assert(one("hello, world42", TextAnalysis.bpeishTokenCount(col("text"))) == 4)
  }

  test("ratios: alpha, punct, stopword") {
    assert(one("ab!?", TextAnalysis.alphaRatio(col("text"))) == 0.5)
    assert(one("ab!?", TextAnalysis.punctRatio(col("text"))) == 0.5)
    assert(one("the cat", TextAnalysis.stopwordRatio(col("text"))) == 0.5)
    assert(one("", TextAnalysis.alphaRatio(col("text"))) == 0.0)
  }

  test("langId picks the language with most stopword hits, 'und' when none") {
    assert(one("the cat sat on the mat", TextAnalysis.langId(col("text"))) == "en")
    assert(one("der Hund und die Katze ist nicht da", TextAnalysis.langId(col("text"))) == "de")
    assert(one("le chat est dans la maison pour que", TextAnalysis.langId(col("text"))) == "fr")
    assert(one("el perro y los gatos es una del", TextAnalysis.langId(col("text"))) == "es")
    assert(one("xyzzy plugh", TextAnalysis.langId(col("text"))) == "und")
  }

  test("fingerprint is invariant to case/punctuation/whitespace") {
    val fps = Seq("Hello, World!", "hello   world", "HELLO WORLD.")
      .toDF("text").select(TextAnalysis.fingerprint(col("text")))
      .collect().map(_.getString(0)).toSet
    assert(fps.size == 1)
  }

  test("quality score is in [0,1] and higher for stopword-rich prose") {
    val q = Seq("the cat is in the hat and it is flat for all of us to see",
        "@@@ ### $$$ %%%")
      .toDF("text").select(TextAnalysis.qualityScore(col("text")))
      .collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }
}
