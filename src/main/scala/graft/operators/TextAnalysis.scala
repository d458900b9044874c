package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/**
 * Text statistics for training-data curation: token counts, quality
 * ratios, language ID, and document fingerprints.
 *
 * Every function is a pure Catalyst column expression (codegen'd,
 * shuffle-free) so the whole analysis runs in the scan's projection at
 * 100 TB — no UDFs, no per-row closures.
 */
object TextAnalysis {

  /** Whitespace token count (0 for blank text). */
  def wsTokenCount(c: Column): Column =
    when(trim(c) === "", lit(0)).otherwise(size(split(trim(c), "\\s+")))

  /**
   * BPE-ish token count: alphabetic runs, digit runs, and single
   * non-alphanumeric marks each count as one token — a deterministic,
   * vocabulary-free approximation of subword tokenizers.
   */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishTokenCount(c: Column): Column = regexp_count(c, lit(BpeishPattern))

  /** Ratio of alphabetic characters to all characters (NULL-safe, 0 for empty). */
  def alphaRatio(c: Column): Column =
    coalesce(
      length(regexp_replace(c, "[^A-Za-z]", "")).cast("double") /
        nullif(length(c), lit(0)).cast("double"),
      lit(0.0))

  /** Ratio of punctuation/symbol characters to all characters. */
  def punctRatio(c: Column): Column =
    coalesce(
      length(regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("double") /
        nullif(length(c), lit(0)).cast("double"),
      lit(0.0))

  /** Small English stopword list used for quality/language scoring. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  val DeStopwords: Seq[String] =
    Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
  val FrStopwords: Seq[String] =
    Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que")
  val EsStopwords: Seq[String] =
    Seq("el", "los", "de", "y", "es", "en", "una", "del", "por", "con")

  /** Count of tokens (with multiplicity) belonging to a stopword set. */
  def stopwordCount(c: Column, stopwords: Seq[String]): Column =
    size(filter(Hashing.normalizedWords(c), w => w.isin(stopwords.map(lit): _*)))

  /** Stopword tokens / all tokens (0 for empty text). */
  def stopwordRatio(c: Column, stopwords: Seq[String] = EnStopwords): Column =
    coalesce(
      stopwordCount(c, stopwords).cast("double") /
        nullif(size(Hashing.normalizedWords(c)), lit(0)).cast("double"),
      lit(0.0))

  /**
   * Composite quality score in [0,1]: stopword density + alphabetic purity
   * + length adequacy, weighted 0.4/0.4/0.2. A heuristic pre-filter for
   * training corpora, not a learned model.
   */
  def qualityScore(c: Column): Column =
    lit(0.4) * stopwordRatio(c) +
      lit(0.4) * alphaRatio(c) +
      lit(0.2) * least(wsTokenCount(c).cast("double") / lit(100.0), lit(1.0))

  /**
   * N-gram-free stopword-list language ID over {en, de, fr, es}: the
   * language whose stopword list matches the most tokens wins, fixed
   * precedence en > de > fr > es on ties, 'und' (undetermined) when no
   * list matches at all.
   */
  def langId(c: Column): Column = {
    val en = stopwordCount(c, EnStopwords)
    val de = stopwordCount(c, DeStopwords)
    val fr = stopwordCount(c, FrStopwords)
    val es = stopwordCount(c, EsStopwords)
    val m = greatest(en, de, fr, es)
    when(m === 0, lit("und"))
      .when(en === m, lit("en"))
      .when(de === m, lit("de"))
      .when(fr === m, lit("fr"))
      .otherwise(lit("es"))
  }

  /**
   * Content-defined document fingerprints: `fingerprint` is the MD5 of the
   * normalized text (robust to case/punctuation/whitespace changes);
   * `minhash_0` is the first MinHash component (a locality-sensitive
   * 60-bit sketch of the shingle set).
   */
  def fingerprint(c: Column, k: Int = 3): Column =
    md5(Hashing.normalizeText(c))

  def minhash0(c: Column, k: Int = 3): Column =
    array_min(transform(Dedup.shingles(c, k), s => Hashing.md5Long60Seeded(s, lit(0))))
}
