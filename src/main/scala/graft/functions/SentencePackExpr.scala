package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Sentence-preserving greedy chunk packing in ONE evaluation pass —
 * the native engine of [[graft.operators.Chunking.chunkBySentences]]:
 * segment the document into UAX#29 sentences
 * ([[Uax29SentencesExpr]]'s lossless partition), count each
 * sentence's tokens, and pack CONSECUTIVE sentences greedily into
 * chunks of at most `maxTokens` tokens — a sentence never splits
 * across chunks (the RAG/context-window prep where row 63's sliding
 * token windows would cut mid-sentence). A single sentence larger
 * than maxTokens becomes its own OVERSIZED chunk (splitting it would
 * betray the operator's one guarantee); zero-token sentences
 * (whitespace/punctuation-only segments) always attach to the open
 * chunk — only a token-bearing sentence can trigger a flush.
 *
 * One native pass per document — segmentation, counting, and packing
 * never materialize intermediate plan arrays, and there are no
 * per-sentence lambda frames (an aggregate-HOF spelling with an
 * array accumulator is O(sentences²) in Catalyst's copy-on-append).
 * Because the sentence segments partition the text losslessly,
 * `concat(chunks) == document` exactly (pinned by spec on random
 * text) — chunking is reversible with zero bookkeeping.
 *
 * Tokenizers: `"ws"` counts maximal runs of non-whitespace over the
 * Java-regex `\s` set — VALUE-IDENTICAL to the engine's wsTokenCount
 * so chunk budgets agree with every other token-budget operator —
 * or `"uax29"` ([[Uax29WordsExpr]] word count, the multilingual arm:
 * CJK text has no spaces, so "ws" would see one giant token per
 * sentence and pack by sentence COUNT, not budget).
 *
 * Returns array<struct<chunk_idx, n_sentences, n_tokens, chunk>>;
 * empty input → empty array; NULL → NULL.
 */
case class SentencePackExpr(child: Expression, maxTokens: Int, tokenizer: String)
  extends UnaryExpression {

  require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
  // "whitespace" is the engine-wide selector constant
  // (TextAnalysis.WhitespaceTokenizer); "ws" kept as the historical
  // short form — one vocabulary across every tokenizer-parameterized
  // operator, no construction-time surprises
  require(tokenizer == "ws" || tokenizer == "whitespace" || tokenizer == "uax29",
    s"unknown tokenizer '$tokenizer' (expected ws, whitespace, or uax29)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("n_sentences", IntegerType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false)
  )), containsNull = false)

  override def prettyName: String = "sentence_chunks"

  override protected def nullSafeEval(input: Any): Any =
    SentencePackExpr.pack(input.asInstanceOf[UTF8String], maxTokens, tokenizer == "uax29")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SentencePackExpr.pack($c, $maxTokens, ${tokenizer == "uax29"})")

  override protected def withNewChildInternal(newChild: Expression): SentencePackExpr =
    copy(child = newChild)
}

object SentencePackExpr {

  /** Tokens as maximal non-whitespace runs over the Java-regex `\s`
    * set — the ASCII set `split("\\s+")` uses, so counts here equal
    * the engine's wsTokenCount exactly (Character.isWhitespace is a
    * BROADER Unicode set and would disagree). */
  private def wsTokens(s: String): Long = {
    var n = 0L
    var inTok = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (!ws && !inTok) { n += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    n
  }

  def pack(text: UTF8String, maxTokens: Int, uax29: Boolean): ArrayData = {
    val sentences = Uax29SentencesExpr.segment(text)
    val n = sentences.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val chunk = new java.lang.StringBuilder
    var chunkSentences = 0
    var chunkTokens = 0L
    var idx = 0
    def flush(): Unit = {
      if (chunkSentences > 0) {
        out += new GenericInternalRow(Array[Any](
          idx, chunkSentences, chunkTokens, UTF8String.fromString(chunk.toString)))
        idx += 1
        chunk.setLength(0)
        chunkSentences = 0
        chunkTokens = 0L
      }
    }
    var i = 0
    while (i < n) {
      val sent = sentences.getUTF8String(i)
      val toks =
        if (uax29) Uax29WordsExpr.segment(sent).numElements().toLong
        else wsTokens(sent.toString)
      // flush ONLY when a token-bearing sentence would overflow the
      // budget — zero-token segments always attach to the open chunk
      if (chunkSentences > 0 && toks > 0 && chunkTokens + toks > maxTokens) flush()
      chunk.append(sent.toString)
      chunkSentences += 1
      chunkTokens += toks
      i += 1
    }
    flush()
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column, maxTokens: Int, tokenizer: String): Column =
    GraftSqlBridge.column(SentencePackExpr(
      GraftSqlBridge.expression(c), maxTokens, tokenizer))
}
