package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Token-window document chunking: split each document into fixed-size
 * overlapping token windows — the sequence-preparation step between a
 * curated corpus and an LLM training/RAG pipeline (context windows are
 * token-bounded; documents are not).
 *
 * Chunk i covers tokens [i·stride, i·stride + chunkTokens) of the
 * whitespace token sequence, stride = chunkTokens − overlap, and the
 * chunk count is ceil((n − overlap) / stride) (minimum 1), so every
 * token lands in at least one chunk and consecutive chunks share
 * exactly `overlap` tokens (the standard sliding-window recipe).
 * Chunk text is the token slice re-joined with single spaces —
 * chunking is defined over TOKENS, so original whitespace runs are
 * not preserved. A token is a maximal non-whitespace run (the
 * [[TextAnalysis.wsTokenCount]] notion, derived split-and-filter so
 * no empty token survives ANY whitespace shape); empty,
 * whitespace-only, and NULL documents produce no chunks.
 *
 * Scale shape: one generate (explode of a per-doc index range) over
 * a projection — the word array is materialized ONCE per document and
 * each chunk slices it by bound attribute (no per-chunk re-split, no
 * shuffle, no window; chunk provenance is (doc_id, chunk_idx), so the
 * op rides the corpus scan exactly like the line rules).
 */
object Chunking {

  /**
   * (doc_id, chunk_idx, token_start, n_tokens, chunk): the sliding
   * token windows of each document, deterministic and contiguous per
   * doc (chunk_idx 0..n_chunks−1).
   */
  def chunkByTokens(
    df: DataFrame,
    textCol: String,
    idCol: String,
    chunkTokens: Int = 512,
    overlap: Int = 64
  ): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlap vs $chunkTokens")
    val stride = chunkTokens - overlap
    val words = df.select(
        col(idCol).as("doc_id"),
        filter(split(col(textCol), "\\s+"), t => t =!= "").as("w"))
      // NULL text: split -> NULL, size -> -1, filtered here with the
      // token-free docs
      .filter(size(col("w")) > 0)
      // doubles are exact for any realistic token count (< 2^53), and
      // ceil-on-double avoids an integral-division detour through SQL
      .withColumn("n_chunks",
        greatest(lit(1L),
          ceil((size(col("w")).cast("double") - lit(overlap)) / lit(stride))))
    words
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("int").as("token_start"),
        slice(col("w"), (col("chunk_idx") * stride).cast("int") + 1, lit(chunkTokens)).as("cw"))
      .select(
        col("doc_id"), col("chunk_idx"), col("token_start"),
        size(col("cw")).as("n_tokens"),
        concat_ws(" ", col("cw")).as("chunk"))
  }

  /**
   * SENTENCE-preserving chunking: pack consecutive UAX#29 sentences
   * greedily into chunks of at most `maxTokens` tokens, never
   * splitting a sentence — the RAG/context-window prep where
   * [[chunkByTokens]]' sliding windows would cut mid-sentence. One
   * native pass per document ([[graft.functions.SentencePackExpr]]:
   * segmentation + token counting + packing with no intermediate
   * plan arrays) followed by one generate — no shuffle, the op rides
   * the corpus scan. Because sentence segments partition the text
   * losslessly, the chunks of a document CONCATENATE back to exactly
   * its original text (unlike the token windows, which re-join on
   * single spaces) — chunking is reversible with zero bookkeeping.
   * A sentence longer than maxTokens becomes its own oversized chunk
   * (n_tokens says so — callers route those to [[chunkByTokens]] if
   * they must be bounded). Empty/NULL documents produce no chunks.
   *
   * @param tokenizer "ws" (whitespace tokens, the engine's budget
   *                  notion) or "uax29" (multilingual word count —
   *                  CJK has no spaces, so "ws" would pack by
   *                  sentence count, not budget)
   */
  def chunkBySentences(
    df: DataFrame,
    textCol: String,
    idCol: String,
    maxTokens: Int = 512,
    tokenizer: String = "ws"
  ): DataFrame =
    df.select(
        col(idCol).as("doc_id"),
        explode(graft.functions.SentencePackExpr(
          col(textCol), maxTokens, tokenizer)).as("c"))
      .select(
        col("doc_id"),
        col("c.chunk_idx").as("chunk_idx"),
        col("c.n_sentences").as("n_sentences"),
        col("c.n_tokens").as("n_tokens"),
        col("c.chunk").as("chunk"))
}
