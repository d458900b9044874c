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
}
