package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def toks(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")

  test("chunk boundaries: stride windows, overlap shared, every token covered") {
    val df = Seq((1L, toks(100))).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "text", "doc_id", chunkTokens = 40, overlap = 10)
      .orderBy("chunk_idx").collect()
    // n=100, stride=30: ceil(90/30)=3 chunks at starts 0/30/60
    assert(out.map(_.getAs[Int]("token_start")).toSeq == Seq(0, 30, 60))
    assert(out.map(_.getAs[Int]("n_tokens")).toSeq == Seq(40, 40, 40))
    // consecutive chunks share exactly `overlap` tokens
    val words = out.map(_.getAs[String]("chunk").split(" ").toSeq)
    assert(words(0).takeRight(10) == words(1).take(10))
    assert(words(1).takeRight(10) == words(2).take(10))
    // every source token appears in at least one chunk
    assert(words.flatten.toSet == toks(100).split(" ").toSet)
  }

  test("short / boundary docs: one chunk when n <= chunkTokens; empty docs vanish") {
    val df = Seq(
      (1L, toks(5)),      // shorter than overlap
      (2L, toks(64)),     // exactly chunkTokens
      (3L, toks(65)),     // one past -> 2 chunks
      (4L, ""),           // empty: no chunks
      (5L, "   \n  ")     // whitespace-only: no chunks
    ).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "text", "doc_id", chunkTokens = 64, overlap = 16)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    // doc 3's second chunk starts at stride 48 and carries the 17-token tail
    val tail = Chunking.chunkByTokens(df, "text", "doc_id", chunkTokens = 64, overlap = 16)
      .filter(col("doc_id") === 3 && col("chunk_idx") === 1).head()
    assert(tail.getAs[Int]("token_start") == 48)
    assert(tail.getAs[Int]("n_tokens") == 17)
  }

  test("chunking is a generate over a projection: no shuffle in the plan") {
    val df = Seq((1L, toks(100))).toDF("doc_id", "text")
    val plan = Chunking.chunkByTokens(df, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("argument validation fails loudly") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "text", "doc_id", chunkTokens = 0)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "text", "doc_id", chunkTokens = 10, overlap = 10)
    }
  }

  test("chunkBySentences: greedy parity with a local reference on random docs") {
    val rnd = new scala.util.Random(67)
    val sents = Array("One two three.", "Four five.", "Six seven eight nine ten.",
      "Go!", "Why not?", "Single.", "Words with more tokens than the budget here now.")
    val docs = (0L until 30L).map { i =>
      (i, (0 until (1 + rnd.nextInt(8))).map(_ => sents(rnd.nextInt(sents.length)))
        .mkString(" "))
    }
    val maxTokens = 6
    val got = Chunking.chunkBySentences(docs.toDF("id", "text"), "text", "id",
        maxTokens = maxTokens)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getLong(3), r.getString(4)))
      .toMap
    // local reference: JDK sentence boundaries + ws token counts + the
    // same greedy rule, written independently of the expression code
    docs.foreach { case (id, text) =>
      val bi = java.text.BreakIterator.getSentenceInstance(java.util.Locale.ROOT)
      bi.setText(text)
      val segs = scala.collection.mutable.ArrayBuffer.empty[String]
      var st = bi.first(); var e = bi.next()
      while (e != java.text.BreakIterator.DONE) {
        segs += text.substring(st, e); st = e; e = bi.next()
      }
      var chunks = Vector.empty[(Int, Long, String)]
      var (cs, ct, cc) = (0, 0L, "")
      segs.foreach { sg =>
        val toks = sg.split("\\s+").count(_.nonEmpty).toLong
        if (cs > 0 && toks > 0 && ct + toks > maxTokens) {
          chunks :+= ((cs, ct, cc)); cs = 0; ct = 0L; cc = ""
        }
        cs += 1; ct += toks; cc += sg
      }
      if (cs > 0) chunks :+= ((cs, ct, cc))
      chunks.zipWithIndex.foreach { case ((ns, nt, c), k) =>
        assert(got((id, k)) === ((ns, nt, c)), s"doc $id chunk $k")
      }
      // losslessness: chunks concatenate back to the document
      assert(chunks.map(_._3).mkString === text, s"doc $id rebuild")
    }
  }

  test("chunkBySentences: oversized sentence is its own chunk; uax29 arm counts CJK") {
    val df = Seq(
      (1L, "This single sentence has way more than five tokens total. Tiny one."),
      (2L, "第一句话很长。短。")
    ).toDF("id", "text")
    val ws = Chunking.chunkBySentences(df, "text", "id", maxTokens = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(3), r.getString(4))).toMap
    assert(ws((1L, 0)) === ((10L,
      "This single sentence has way more than five tokens total. ")))
    assert(ws((1L, 1)) === ((2L, "Tiny one.")))
    // ws arm: no spaces in CJK -> each sentence is 1 "token", both fit one chunk
    assert(ws((2L, 0))._2 === "第一句话很长。短。")
    // uax29 arm: 第一句话很长。 = 6 ideographs + 。(punct dropped) = 6 words
    val ux = Chunking.chunkBySentences(df.filter(col("id") === 2L), "text", "id",
        maxTokens = 5, tokenizer = "uax29")
      .collect().map(r => (r.getInt(1)) -> (r.getLong(3), r.getString(4))).toMap
    assert(ux(0) === ((6L, "第一句话很长。")))
    assert(ux(1) === ((1L, "短。")))
  }
}
