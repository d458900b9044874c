package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Token-ALIGNED gram primitives shared by the span-level operators
 * ([[Contamination.decontaminateSpans]], [[Dedup.dropDuplicateSpans]]):
 * tokens are whitespace-split from the ORIGINAL text (so every gram's
 * position indexes the original token stream and cut spans can be
 * re-joined), normalization happens per token (whole-text normalization
 * loses token positions), and gram hashing is the fused native
 * [[graft.functions.ShingleHashExpr]] windowed pass — one call per row,
 * no interpreted per-position lambda (a transform(sequence…slice…md5)
 * spelling of the same values ran ~20× slower at sf0.1).
 */
private[operators] object SpanGrams {

  /** Whitespace tokens of the original text, empties dropped. */
  def tokensOf(c: Column): Column = filter(split(c, "\\s+"), t => t =!= "")

  /** Per-token normalization (lowercase, [a-z0-9] only) — positions kept. */
  def normTok(w: Column): Column =
    transform(w, t => regexp_replace(lower(t), "[^a-z0-9]", ""))

  /** 60-bit hashes of the k-token windows over a normalized token array.
    * The size guard keeps ShingleHashExpr's whole-text fallback out
    * (short docs have no spans to cut), so the norm argument is never
    * read; NULL token arrays fall to the empty branch. */
  def gramHashes(nt: Column, k: Int): Column =
    when(size(nt) >= k, graft.functions.ShingleHashExpr(nt, lit(""), k))
      .otherwise(array().cast("array<bigint>"))
}
