package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

class Uax29Spec extends SparkSpec {
  import spark.implicits._

  private def words(t: String): Seq[String] =
    Seq(Tuple1(t)).toDF("text")
      .select(TextAnalysis.uax29Words(col("text")).as("w"))
      .head().getSeq[String](0)

  test("pinned multilingual segmentations (the q_uax29 constant table)") {
    assert(words("Hello, world! It's 3.5 miles.") ===
      Seq("Hello", "world", "It's", "3.5", "miles"))
    assert(words("我爱大规模数据处理引擎") ===
      "我爱大规模数据处理引擎".map(_.toString))
    assert(words("日本語のテキストです") ===
      Seq("日", "本", "語", "の", "テキスト", "で", "す"))
    assert(words("スパークとカタカナ") === Seq("スパーク", "と", "カタカナ"))
    assert(words("한국어 텍스트 처리") === Seq("한국어", "텍스트", "처리"))
    assert(words("สวัสดีครับ ยินดีต้อนรับ") ===
      Seq("สวัสดีครับ", "ยินดีต้อนรับ"))
    assert(words("C++ is fun; x2=4") === Seq("C", "is", "fun", "x2", "4"))
    assert(words("我爱Spark和DataFrame") ===
      Seq("我", "爱", "Spark", "和", "DataFrame"))
    assert(words("") === Seq.empty)
  }

  test("CJK text no longer collapses to one token") {
    val df = Seq((1L, "我爱大规模数据处理引擎")).toDF("id", "text")
    val r = df.select(
      TextAnalysis.wsTokenCount(col("text")).as("ws"),
      TextAnalysis.uax29TokenCount(col("text")).as("uax")).head()
    assert(r.getInt(0) === 1)   // whitespace: one giant "word"
    assert(r.getInt(1) === 11)  // UAX#29: one token per ideograph
  }

  test("NULL text propagates NULL count; blank counts zero") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "  ")).toDF("id", "text")
    val rows = df.select(col("id"), TextAnalysis.uax29TokenCount(col("text")).as("n"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getInt(1) === 0)
  }

  test("topWords under the uax29 tokenizer counts ideographs; unknown tokenizer throws") {
    val df = Seq(
      (1L, "我爱数据"), (2L, "我爱 Spark"), (3L, "spark spark")).toDF("id", "text")
    val top = TextAnalysis.topWords(df, "text", k = 3, tokenizer = "uax29")
      .as[(String, Long)].collect().toSeq
    assert(top === Seq(("我", 2L), ("爱", 2L), ("spark", 3L)).sortBy { case (w, n) => (-n, w) })
    intercept[IllegalArgumentException] {
      TextAnalysis.topWords(df, "text", k = 3, tokenizer = "nope")
    }
  }

  test("gopherRules uax29 arm sees real word counts on unspaced text") {
    val cjk = "我爱大规模数据处理引擎" * 5 // 55 ideographs, zero spaces
    val df = Seq((1L, cjk)).toDF("id", "text")
    val ws = TextAnalysis.gopherRules(df, "text", "id").head()
    val ux = TextAnalysis.gopherRules(df, "text", "id", tokenizer = "uax29").head()
    assert(ws.getAs[Long]("n_words") === 1L)
    assert(ux.getAs[Long]("n_words") === 55L)
  }

  test("uax29 shingle tables give CJK docs real shingle sets") {
    val df = Seq(
      (1L, "我爱大规模数据"),
      (2L, "我爱大规模引擎")).toDF("id", "text")
    val sh = Dedup.uax29ShingleTable(df, "text", "id", k = 3)
      .select(col("doc_id"), col("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L) === Seq("我 爱 大", "爱 大 规", "大 规 模", "规 模 数", "模 数 据"))
    // whitespace arm: whole line is ONE shingle (the failure mode)
    val wsSh = Dedup.shingleTable(df, "text", "id", k = 3)
      .select(col("doc_id"), col("sh")).as[(Long, Seq[String])].collect().toMap
    assert(wsSh(1L).length === 1)
    // hashed arm hashes exactly the string shingles' values
    val hs = Dedup.uax29HashedShingleTable(df, "text", "id", k = 3)
    assert(hs.select(explode(col("hs"))).distinct().count() ===
      Dedup.uax29ShingleTable(df, "text", "id", k = 3)
        .select(explode(col("sh"))).distinct().count())
  }

  test("uax29Sentences: lossless partition on random text") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val pieces = Array("Hello world", "ok.", "No!", "Really?", "第一。",
      "x y z", " ", "\n", "e.g. fine", "Dr. Who", "a.b", "  tail")
    val texts = (0L until 40L).map { i =>
      (i, (0 until rnd.nextInt(12)).map(_ => pieces(rnd.nextInt(pieces.length)))
        .mkString(" "))
    }
    val got = texts.toDF("id", "text")
      .select(col("id"), col("text"),
        concat_ws("", graft.operators.TextAnalysis.uax29Sentences(col("text")))
          .as("rebuilt"))
      .as[(Long, String, String)].collect()
    got.foreach { case (id, t, r) => assert(r === t, s"doc $id") }
  }

  test("uax29Sentences: empty array for empty, NULL for NULL") {
    import spark.implicits._
    val out = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"), graft.operators.TextAnalysis.uax29Sentences(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    assert(out(1L) === Seq.empty)
    assert(out(2L) === null)
  }
}
