package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable hashing primitives.
 *
 * All near-dup / fingerprint operators hash through MD5 rather than Spark's
 * Murmur3 `hash()` so results are reproducible by ANY engine (the DuckDB
 * correctness oracle recomputes them with its own `md5`), and stable across
 * Spark versions. MD5 here is a uniform hash, not a security primitive.
 *
 * Everything is a pure Catalyst expression — codegen'd, no UDFs.
 */
object Hashing {

  /**
   * 60-bit non-negative hash of a string: the first 15 hex chars of the MD5
   * digest, as a Long. 15 hex chars = 60 bits, always positive, and
   * recomputable in SQL engines as `('0x' || substr(md5(x),1,15))::BIGINT`.
   * Backed by the native [[Md5Long60Expr]] (one digest call, no hex
   * round-trip); `conv(substring(md5(c),1,15),16,10)` computes the same
   * value.
   */
  def md5Long60(c: Column): Column = Md5Long60Expr(c)

  /**
   * Normalize free text for fingerprinting/shingling: lowercase, collapse
   * every run of non-alphanumeric characters to a single space, trim.
   * Mirrored in the DuckDB oracles as
   * `trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))`.
   */
  def normalizeText(c: Column): Column = NormalizeTextExpr(c)

  /** Whitespace tokens of normalized text; empty text → empty array.
    * One fused lowercase + byte scan straight to the array
    * ([[NormalizedWordsExpr]]) — byte-identical to splitting
    * [[normalizeText]] on single spaces, without materializing the
    * intermediate string or running the regex NFA per row. */
  def normalizedWords(c: Column): Column = NormalizedWordsExpr(c)

  /** UAX#29 words of case-folded text ([[Uax29WordsExpr]]) — the
    * multilingual arm of [[normalizedWords]]: CJK segments at
    * ideograph/run granularity instead of collapsing to one "word"
    * per whitespace gap. Lowercased for the same vocabulary-keyed
    * determinism; punctuation-only segments already drop inside the
    * expression, so no regex strip is needed (and none would be safe —
    * `[^a-z0-9]` would erase every non-Latin script). */
  def uax29NormalizedWords(c: Column): Column = Uax29WordsExpr(lower(c))

  /** Normalized text under the named tokenizer — the one string every
    * hash-keyed EXACT arm fingerprints. "whitespace" is
    * [[normalizeText]] (which maps non-ASCII-alnum to spaces: ALL CJK
    * text normalizes to EMPTY — fine for Latin corpora, catastrophic
    * over-collapse for multilingual ones); "uax29" space-joins
    * [[uax29NormalizedWords]], so two CJK docs are equal iff their
    * segmented word sequences are. */
  def normalizedTextFor(c: Column, tokenizer: String): Column = tokenizer match {
    case "whitespace" => normalizeText(c)
    case "uax29" => concat_ws(" ", uax29NormalizedWords(c))
    case other => throw new IllegalArgumentException(
      s"unknown tokenizer '$other' (expected whitespace or uax29)")
  }
}
