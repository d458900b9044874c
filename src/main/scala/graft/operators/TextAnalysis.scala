package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, TextScanExpr}

/**
 * Text statistics for training-data curation: token counts, quality
 * ratios, language ID, and document fingerprints.
 *
 * Every function is a pure Catalyst column expression (codegen'd,
 * shuffle-free) so the whole analysis runs in the scan's projection at
 * 100 TB — no UDFs, no per-row closures.
 */
object TextAnalysis {

  /** Whitespace token count (0 for blank text, NULL for NULL text) —
    * the number of maximal non-whitespace runs, equivalent to the
    * `CASE WHEN trim(text)='' THEN 0 ELSE len(split(trim(text),'\s+'))`
    * oracle spelling (which NULL-propagates), evaluated by the one-pass
    * [[graft.functions.TextScanExpr]] instead of a split allocation. */
  def wsTokenCount(c: Column): Column =
    TextScanExpr(c).getField("ws_tokens")

  /**
   * BPE-ish token count: alphabetic runs, digit runs, and single
   * non-alphanumeric marks each count as one token — a deterministic,
   * vocabulary-free approximation of subword tokenizers. Evaluated by
   * [[graft.functions.TextScanExpr]] (value-identical to
   * `regexp_count(c, BpeishPattern)`, which the oracle still spells);
   * the regex engine was the sf1 board's only exponent-1.0 non-IO cell.
   */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishTokenCount(c: Column): Column =
    TextScanExpr(c).getField("bpeish_tokens")

  /** UAX#29 default-rules word array of the raw text
    * ([[graft.functions.Uax29WordsExpr]]) — the multilingual tokenizer
    * arm: Chinese/Japanese segment per ideograph, Katakana/Hangul/Thai
    * as runs, Latin words keep internal apostrophes and decimal points.
    * Whitespace splitting remains every operator's DEFAULT (it is
    * oracle-portable and right for space-delimited corpora); this arm
    * exists because whitespace collapses unspaced scripts to one "word"
    * per line, silently distorting shingles, quality signals, and token
    * budgets. */
  def uax29Words(c: Column): Column = graft.functions.Uax29WordsExpr(c)

  /** UAX#29 token count (0 for blank text, NULL for NULL text) — the
    * [[wsTokenCount]] contract under the multilingual segmenter: a
    * 40-ideograph unspaced Chinese line counts 40 tokens, not 1. */
  def uax29TokenCount(c: Column): Column = size(uax29Words(c))

  /** UAX#29 default-rules SENTENCE segments — a LOSSLESS partition of
    * the input (concat(segments) == input; trailing whitespace stays
    * attached), via the native [[graft.functions.Uax29SentencesExpr]].
    * The boundary primitive behind [[Chunking.chunkBySentences]]. */
  def uax29Sentences(c: Column): Column = graft.functions.Uax29SentencesExpr(c)

  /** Tokenizer selector accepted by the word-keyed operators. */
  val WhitespaceTokenizer = "whitespace"
  val Uax29Tokenizer = "uax29"

  /** Mojibake repair ([[graft.functions.FixMojibakeExpr]] — UTF-8
    * bytes mis-decoded as cp1252 upstream, inverted and strictly
    * re-decoded; clean text is a guaranteed no-op, double-encoding
    * undone, NULL propagates). Run BEFORE unicode normalization and
    * every hash-keyed stage: "cafÃ©" and "café" must fingerprint
    * together or dedup silently forks on crawl-encoding accidents. */
  def fixMojibake(c: Column): Column = graft.functions.FixMojibakeExpr(c)

  /** Normalized word array under the named tokenizer (plan-time error
    * for an unknown name — the [[graft.operators.Checks]] fail-loud
    * convention). */
  def normalizedWordsFor(c: Column, tokenizer: String): Column = tokenizer match {
    case WhitespaceTokenizer => Hashing.normalizedWords(c)
    case Uax29Tokenizer => Hashing.uax29NormalizedWords(c)
    case other => throw new IllegalArgumentException(
      s"unknown tokenizer '$other' (expected $WhitespaceTokenizer or $Uax29Tokenizer)")
  }

  /** [[alphaRatio]] over an already-computed [[TextScanExpr]] struct. */
  private def alphaRatioOf(ts: Column): Column =
    coalesce(
      ts.getField("n_alpha").cast("double") /
        nullif(ts.getField("n_chars"), lit(0)).cast("double"),
      lit(0.0))

  /** [[punctRatio]] over an already-computed [[TextScanExpr]] struct. */
  private def punctRatioOf(ts: Column): Column =
    coalesce(
      ts.getField("n_other").cast("double") /
        nullif(ts.getField("n_chars"), lit(0)).cast("double"),
      lit(0.0))

  /** Ratio of alphabetic characters to all characters (NULL-safe, 0 for empty). */
  def alphaRatio(c: Column): Column = alphaRatioOf(TextScanExpr(c))

  /** Ratio of punctuation/symbol characters to all characters. */
  def punctRatio(c: Column): Column = punctRatioOf(TextScanExpr(c))

  /** Small English stopword list used for quality/language scoring. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  val DeStopwords: Seq[String] =
    Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
  val FrStopwords: Seq[String] =
    Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que")
  val EsStopwords: Seq[String] =
    Seq("el", "los", "de", "y", "es", "en", "una", "del", "por", "con")

  /**
   * Stopword families for language ID, PRECEDENCE order (ties resolve
   * to the earlier family). Ten Latin-script languages; every list is
   * the language's top function words in NORMALIZED form —
   * [[Hashing.normalizeText]] lowercases and strips non-[a-z0-9], so
   * diacritic-bearing stopwords (på, się, için) can never match the
   * word stream and are deliberately absent. Real corpora share
   * function words across languages (de/en/la/un/e/o…); the confidence
   * column exists exactly because membership is not exclusive.
   */
  val StopwordFamilies: Seq[(String, Seq[String])] = Seq(
    "en" -> EnStopwords,
    "de" -> DeStopwords,
    "fr" -> FrStopwords,
    "es" -> EsStopwords,
    "it" -> Seq("il", "di", "che", "e", "la", "per", "un", "sono", "con", "non"),
    "pt" -> Seq("o", "que", "do", "da", "em", "um", "para", "uma", "os", "como"),
    "nl" -> Seq("de", "het", "een", "van", "en", "dat", "op", "te", "niet", "zijn"),
    "sv" -> Seq("och", "att", "det", "som", "en", "av", "har", "inte", "den", "jag"),
    "pl" -> Seq("i", "w", "nie", "na", "z", "do", "to", "jest", "ale", "po"),
    "tr" -> Seq("bir", "ve", "bu", "da", "ne", "ile", "ben", "gibi", "ama", "o"))

  /** Stopword count over an already-materialized word-array column. */
  def stopwordCountOf(w: Column, stopwords: Seq[String]): Column =
    size(filter(w, x => x.isin(stopwords.map(lit): _*)))

  /** Stopword density over an already-materialized word array (0 for
    * empty) — the `stopword_r` component shared by [[withQuality]] and
    * [[appendQuality]]. */
  private def stopwordRatioOf(w: Column): Column =
    coalesce(
      stopwordCountOf(w, EnStopwords).cast("double") /
        nullif(size(w), lit(0)).cast("double"),
      lit(0.0))

  /** The composite-quality combination over already-computed component
    * columns — the single source of the 0.4/0.4/0.2 formula for both
    * DataFrame quality forms. */
  private def qualityFromComponents(
    stopwordR: Column, alphaR: Column, nWords: Column
  ): Column =
    lit(0.4) * stopwordR + lit(0.4) * alphaR +
      lit(0.2) * least(nWords.cast("double") / lit(100.0), lit(1.0))

  /** Count of tokens (with multiplicity) belonging to a stopword set. */
  def stopwordCount(c: Column, stopwords: Seq[String]): Column =
    stopwordCountOf(Hashing.normalizedWords(c), stopwords)

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
   * N-gram-free stopword-list language ID over [[StopwordFamilies]]
   * (10 languages as of r11): the language whose stopword list matches
   * the most tokens wins, family order breaks ties, 'und'
   * (undetermined) when no list matches at all.
   */
  def langId(c: Column): Column = {
    val counts = StopwordFamilies.map { case (l, sw) => l -> stopwordCount(c, sw) }
    val m = greatest(counts.map(_._2): _*)
    counts.init.foldLeft(when(m === 0, lit("und"))) {
      case (acc, (l, n)) => acc.when(n === m, lit(l))
    }.otherwise(lit(StopwordFamilies.last._1))
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
    array_min(transform(Dedup.shingles(c, k),
      s => Hashing.md5Long60(s).bitwiseXOR(Hashing.md5Long60(lit("0")))))

  // ------------------------------------------- DataFrame-level hot paths
  //
  // The Column forms above are convenient, but a Catalyst expression tree
  // re-evaluates shared subtrees (normalization, word split) per reference
  // — and inside higher-order-function lambdas there is no codegen CSE to
  // save you. These DataFrame forms materialize the word array ONCE per
  // document as a projection column and compute everything downstream from
  // bound attributes; use them on 100 TB paths.

  /** (doc_id, lang_pred, lang_conf): language ID over the full
    * [[StopwordFamilies]] table with each stopword list counted once
    * off the materialized word array. `lang_conf` is the winning
    * family's share of ALL stopword matches (1.0 = no other family
    * matched anything; 0.0 for 'und') — the margin signal a routing
    * pipeline thresholds on, since function words are shared across
    * languages and a bare argmax hides how contested the call was. */
  def withLangId(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val counted = Dedup.wordTable(df, textCol, idCol)
      .select(col("doc_id") +: StopwordFamilies.map { case (l, sw) =>
        stopwordCountOf(col("w"), sw).as(s"s_$l")
      }: _*)
    val cols = StopwordFamilies.map { case (l, _) => l -> col(s"s_$l") }
    val m = greatest(cols.map(_._2): _*)
    val tot = cols.map(_._2).reduce(_ + _)
    counted.select(
      col("doc_id"),
      cols.init.foldLeft(when(m === 0, lit("und"))) {
        case (acc, (l, n)) => acc.when(n === m, lit(l))
      }.otherwise(lit(StopwordFamilies.last._1)).as("lang_pred"),
      when(m === 0, lit(0.0))
        .otherwise(m.cast("double") / tot.cast("double")).as("lang_conf"))
  }

  /**
   * (doc_id, n_chars, n_words, alpha_r, punct_r, stopword_r, quality):
   * quality metrics with the word array materialized once; `quality` is
   * derived from the unrounded component columns.
   */
  def withQuality(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
        col(idCol).as("doc_id"),
        TextScanExpr(col(textCol)).as("ts"),
        Hashing.normalizedWords(col(textCol)).as("w"))
      .select(
        col("doc_id"),
        col("ts").getField("n_chars").as("n_chars"),
        col("ts").getField("ws_tokens").as("n_words"),
        alphaRatioOf(col("ts")).as("alpha_r"),
        punctRatioOf(col("ts")).as("punct_r"),
        stopwordRatioOf(col("w")).as("stopword_r"))
      .select(
        col("doc_id"), col("n_chars"), col("n_words"),
        col("alpha_r"), col("punct_r"), col("stopword_r"),
        qualityFromComponents(col("stopword_r"), col("alpha_r"), col("n_words"))
          .as("quality"))

  /**
   * `df.*` + `quality`: the same composite score as [[withQuality]] but
   * APPENDED to every input column, for pipeline stages that need the
   * score without losing the text — no self-join back to the source
   * required (the join the curation pipeline used to pay re-evaluated
   * its whole upstream dedup chain twice). Same staged-select structure
   * as [[withQuality]]: the word array and each component materialize
   * once per row across a projection boundary, because the stopword
   * count is a lambda HOF and codegen CSE does not deduplicate lambdas.
   */
  def appendQuality(
    df: DataFrame, textCol: String, qualityCol: String = "quality"
  ): DataFrame = {
    val passthrough = df.columns.map(col).toIndexedSeq
    df.select(passthrough ++ Seq(
        Hashing.normalizedWords(col(textCol)).as("__gq_w"),
        TextScanExpr(col(textCol)).as("__gq_ts")): _*)
      .select(passthrough ++ Seq(
        stopwordRatioOf(col("__gq_w")).as("__gq_stop"),
        alphaRatioOf(col("__gq_ts")).as("__gq_alpha"),
        col("__gq_ts").getField("ws_tokens").as("__gq_nw")): _*)
      .select(passthrough :+
        qualityFromComponents(col("__gq_stop"), col("__gq_alpha"), col("__gq_nw"))
          .as(qualityCol): _*)
  }

  /**
   * (doc_id, fingerprint, minhash_0): content fingerprints with the
   * shingle set materialized once per document. minhash_0 is element 0
   * of a 1-hash MinHash signature (min over shingles of
   * h60(s) XOR h60("0")) — computed with the native array-hash +
   * signature expressions instead of a per-shingle lambda chain; the
   * [[minhash0]] Column form stays as the portable reference.
   */
  def fingerprints(df: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame =
    Dedup.wordTable(df, textCol, idCol)
      .select(col("doc_id"), col("norm"),
        graft.functions.ShingleHashExpr(col("w"), col("norm"), k).as("hs"))
      .select(
        col("doc_id"),
        md5(col("norm")).as("fingerprint"),
        element_at(
          graft.functions.MinHashSignatureExpr(col("hs"), 1), 1)
          .as("minhash_0"))

  /**
   * (doc_id, n_grams, rep_ratio): fraction of DUPLICATE word k-grams per
   * document — the repetition quality signal (boilerplate, generated
   * spam, and scraper loops score high; clean prose near 0). Documents
   * under k words fall back to the single whole-text shingle (ratio 0).
   * Pure projection over the materialized shingle table: no shuffle.
   */
  def withRepetition(df: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame =
    Dedup.shingleTable(df, textCol, idCol, k)
      .select(
        col("doc_id"),
        size(col("sh")).cast("long").as("n_grams"),
        (lit(1.0) - size(array_distinct(col("sh"))).cast("double")
          / size(col("sh")).cast("double")).as("rep_ratio"))

  /** The stopword set the Gopher rules require ≥ minStopHits distinct
    * members of (Rae et al. 2021, appendix A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher-style rule-based document filter (the published heuristic
   * recipe for web-corpus cleaning): per-document signals plus a `pass`
   * verdict. Signals, with the paper's default bounds:
   *
   *   - `n_words` in [50, 100 000] — whitespace tokens of the raw text
   *   - `mean_word_len` in [3, 10]
   *   - `symbol_ratio` (`#` chars + `...` runs, per word) ≤ 0.1
   *   - `bullet_ratio` (lines starting `-`/`*`/`•`) < 0.9
   *   - `ellipsis_ratio` (lines ending `...`/`…`) ≤ 0.3
   *   - `alpha_word_ratio` (words containing a letter) ≥ 0.8
   *   - `stop_hits` (distinct [[GopherStopwords]] present) ≥ 2
   *
   * Pure Catalyst projection: the word and line arrays are materialized
   * ONCE as projection columns (no HOF re-evaluation of the split per
   * signal), everything downstream is bound-attribute arithmetic —
   * shuffle-free and codegen'd, so the filter rides the 100 TB scan.
   * Empty/blank documents score 0 words and fail the word-count rule.
   */
  def gopherRules(
    df: DataFrame,
    textCol: String,
    idCol: String,
    minWords: Int = 50,
    maxWords: Int = 100000,
    minMeanLen: Double = 3.0,
    maxMeanLen: Double = 10.0,
    maxSymbolRatio: Double = 0.1,
    maxBulletRatio: Double = 0.9,
    maxEllipsisRatio: Double = 0.3,
    minAlphaWordRatio: Double = 0.8,
    minStopHits: Int = 2,
    tokenizer: String = WhitespaceTokenizer
  ): DataFrame = {
    val staged = df.select(
      col(idCol).as("doc_id"),
      col(textCol).as("text"),
      gopherWordsFor(col(textCol), tokenizer).as("w"),
      split(col(textCol), "\n").as("ln"))
    val s = gopherSignals(col("text"), col("w"), col("ln"))
    staged.select(
        col("doc_id"),
        s.nWords.as("n_words"),
        s.meanLen.as("mean_word_len"),
        s.symbolRatio.as("symbol_ratio"),
        s.bulletRatio.as("bullet_ratio"),
        s.ellipsisRatio.as("ellipsis_ratio"),
        s.alphaWordRatio.as("alpha_word_ratio"),
        s.stopHits.as("stop_hits"))
      .withColumn("pass",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanLen, maxMeanLen) &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("bullet_ratio") < maxBulletRatio &&
          col("ellipsis_ratio") <= maxEllipsisRatio &&
          col("alpha_word_ratio") >= minAlphaWordRatio &&
          col("stop_hits") >= minStopHits)
  }

  /**
   * [[gopherRules]] as a row-preserving FILTER: keeps exactly the rows
   * whose `pass` verdict is true, with the input's columns untouched.
   * For pipelines this avoids the id-join back onto the input (which
   * would re-evaluate the caller's upstream plan twice); the signal
   * arrays live in temp columns for the filter's duration only.
   */
  /**
   * C4-style line cleaning + page filter (Raffel et al. 2020 §2.2 —
   * the boilerplate screen the Gopher rules assume already ran): keep
   * only lines that end in terminal punctuation, have ≥
   * `minWordsPerLine` words, and don't mention javascript; drop the
   * whole page when fewer than `minLines` lines survive or the page
   * contains `{` or "lorem ipsum" anywhere. Returns the corpus with
   * `textCol` REWRITTEN to the surviving lines (joined by `\n`) and
   * failing pages removed; NULL text drops (no prose to keep).
   *
   * One native [[graft.functions.C4LinesExpr]] call per row — line
   * split, trailing-blank strip, word counts, and both needle scans
   * fused into a single byte pass (an HOF `filter` spelling pays an
   * interpreted lambda frame per line) — then a pushed filter. Pure
   * projection: no shuffle, composes before every hash-keyed stage.
   */
  def c4Clean(
    df: DataFrame,
    textCol: String,
    minWordsPerLine: Int = 3,
    minLines: Int = 5,
    terminators: String = graft.functions.C4LinesExpr.AsciiTerminators
  ): DataFrame = {
    require(minLines >= 0, s"minLines must be >= 0: $minLines")
    Cols.requireAbsent(df, "__c4")
    df.withColumn("__c4",
        graft.functions.C4LinesExpr(col(textCol), minWordsPerLine, terminators))
      .filter(col("__c4.n_kept") >= minLines && !col("__c4.flagged"))
      .withColumn(textCol, col("__c4.text"))
      .drop("__c4")
  }

  def gopherFilter(
    df: DataFrame,
    textCol: String,
    minWords: Int = 50,
    maxWords: Int = 100000,
    minMeanLen: Double = 3.0,
    maxMeanLen: Double = 10.0,
    maxSymbolRatio: Double = 0.1,
    maxBulletRatio: Double = 0.9,
    maxEllipsisRatio: Double = 0.3,
    minAlphaWordRatio: Double = 0.8,
    minStopHits: Int = 2,
    tokenizer: String = WhitespaceTokenizer
  ): DataFrame = {
    Cols.requireAbsent(df, "__w", "__ln")
    val staged = df
      .withColumn("__w", gopherWordsFor(col(textCol), tokenizer))
      .withColumn("__ln", split(col(textCol), "\n"))
    val s = gopherSignals(col(textCol), col("__w"), col("__ln"))
    staged.filter(
        s.nWords.between(minWords, maxWords) &&
          s.meanLen.between(minMeanLen, maxMeanLen) &&
          s.symbolRatio <= maxSymbolRatio &&
          s.bulletRatio < maxBulletRatio &&
          s.ellipsisRatio <= maxEllipsisRatio &&
          s.alphaWordRatio >= minAlphaWordRatio &&
          s.stopHits >= minStopHits)
      .drop("__w", "__ln")
  }

  /** Raw whitespace word array for the Gopher signals (empty for blank). */
  private def gopherWords(t: Column): Column =
    when(trim(t) === "", array().cast("array<string>"))
      .otherwise(split(trim(t), "\\s+"))

  /** Gopher word array under the named tokenizer — RAW case either way
    * (the signals measure the text as written; [[uax29Words]] already
    * drops punctuation-only segments, which for the symbol/alpha ratios
    * is the UAX notion of "word" doing its job). */
  private def gopherWordsFor(t: Column, tokenizer: String): Column =
    tokenizer match {
      case WhitespaceTokenizer => gopherWords(t)
      case Uax29Tokenizer => uax29Words(t)
      case other => throw new IllegalArgumentException(
        s"unknown tokenizer '$other' (expected $WhitespaceTokenizer or $Uax29Tokenizer)")
    }

  private final case class GopherSignals(
    nWords: Column, meanLen: Column, symbolRatio: Column, bulletRatio: Column,
    ellipsisRatio: Column, alphaWordRatio: Column, stopHits: Column)

  /** The seven signals over MATERIALIZED word/line array columns (`w`,
    * `ln` must be bound attributes, not expressions — each is referenced
    * several times and HOF lambdas get no codegen CSE). */
  private def gopherSignals(t: Column, w: Column, ln: Column): GopherSignals = {
    val nWords = size(w).cast("long")
    val nLines = size(ln).cast("long") // ≥ 1: splitting "" yields [""]
    GopherSignals(
      nWords = nWords,
      meanLen = coalesce(
        aggregate(w, lit(0L), (acc, x) => acc + length(x).cast("long"))
          .cast("double") / nullif(nWords, lit(0L)).cast("double"),
        lit(0.0)),
      symbolRatio = coalesce(
        (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\.")))
          .cast("double") / nullif(nWords, lit(0L)).cast("double"),
        lit(0.0)),
      bulletRatio =
        size(filter(ln, l => ltrim(l).rlike("^[-*•]"))).cast("double") /
          nLines.cast("double"),
      ellipsisRatio =
        size(filter(ln, l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") /
          nLines.cast("double"),
      alphaWordRatio = coalesce(
        size(filter(w, x => x.rlike("[A-Za-z]"))).cast("double") /
          nullif(nWords, lit(0L)).cast("double"),
        lit(0.0)),
      stopHits = size(array_intersect(
        transform(w, x => lower(x)), lit(GopherStopwords.toArray))).cast("long"))
  }

  /**
   * Corpus-wide top-k token frequencies over the normalized word stream —
   * vocabulary building, stopword discovery, drift monitoring. Returns
   * (word, n) with a deterministic total order (n desc, word asc), so
   * the k-set is unique even through count ties at the boundary.
   *
   * Scale shape: explode → hash aggregate with map-side partials
   * (frequent words collapse before the shuffle — they are the point of
   * the query), then ORDER BY + LIMIT plans as TakeOrderedAndProject:
   * each partition surrenders only its local top-k, never a full sort
   * of the vocabulary (PlanAuditSpec asserts it).
   */
  def topWords(
    df: DataFrame,
    textCol: String,
    k: Int = 1000,
    tokenizer: String = WhitespaceTokenizer
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    df.select(explode(normalizedWordsFor(col(textCol), tokenizer)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(k)
  }

  /**
   * Fit a unigram language model over the corpus: the top-`vocabSize`
   * normalized-word frequencies ([[topWords]] — deterministic through
   * ties). The CCNet-style perplexity filter without a pretrained LM:
   * fit on the corpus (or a trusted reference slice), score with
   * [[unigramNll]], cut both tails (high = gibberish/OOV/wrong-language,
   * low = repetitive boilerplate).
   */
  def unigramModel(df: DataFrame, textCol: String, vocabSize: Int = 50000): DataFrame =
    topWords(df, textCol, vocabSize)

  /**
   * Per-document mean negative log-likelihood (nats/token) under a
   * unigram `model` (word, n) with add-alpha smoothing:
   * p(w) = (c_w + α) / (T + α·(V+1)), OOV words get c_w = 0 — every
   * token has positive probability, so the score is always finite.
   * Returns (doc_id, n_tokens, nll); documents with zero normalized
   * tokens have no likelihood and are absent (filter them first or
   * treat absence as "no signal", like the contamination NULL-text rule).
   *
   * Scale shape: T and V fold to ONE driver row (metadata, like the
   * k-means centroid fold); the word stream explodes and left-joins the
   * BROADCAST model, and the per-doc regroup shuffles one
   * partially-aggregated row per document, not one per token — the
   * [[Contamination.contaminationScores]] shape exactly.
   */
  def unigramNll(
    df: DataFrame,
    model: DataFrame,
    textCol: String,
    idCol: String,
    alpha: Double = 1.0
  ): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive for finite OOV scores: $alpha")
    // The model plan may itself be a corpus-wide aggregation (unigramModel);
    // localize it ONCE (metadata-sized: <= vocabSize rows) so the T/V fold
    // and the scoring join both read the local relation instead of each
    // re-running the full model plan.
    val localModel = Similarity.localize(
      model.select(col("word"), col("n").cast("long").as("n")))
    val tv = localModel.agg(
      coalesce(sum(col("n")), lit(0L)).as("t"),
      count(lit(1)).as("v")).head()
    val denom = tv.getLong(0).toDouble + alpha * (tv.getLong(1).toDouble + 1.0)
    val words = Dedup.wordTable(df, textCol, idCol)
      .select(col("doc_id"), explode(col("w")).as("word"))
    words
      .join(broadcast(localModel), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(-log((coalesce(col("n"), lit(0L)).cast("double") + alpha) / denom))
          .as("nll_sum"))
      .select(
        col("doc_id"), col("n_tokens"),
        (col("nll_sum") / col("n_tokens").cast("double")).as("nll"))
  }

  /**
   * Bigram model: the top-`bigramVocab` adjacent normalized-word PAIR
   * counts (prev, word, n), deterministic through ties (n desc, prev
   * asc, word asc — the [[topWords]] convention). Pairs come from one
   * explode over per-document positions; documents under 2 words
   * contribute none. Pair with [[unigramModel]] for [[bigramNll]]'s
   * interpolated scorer. Bounded: `bigramVocab` rows regardless of
   * corpus size (TakeOrdered — each partition surrenders k rows).
   */
  def bigramModel(
    df: DataFrame,
    textCol: String,
    bigramVocab: Int = 200000
  ): DataFrame = {
    require(bigramVocab >= 1, s"bigramVocab must be >= 1: $bigramVocab")
    df.select(Hashing.normalizedWords(col(textCol)).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(
        transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(
            element_at(col("w"), i).as("prev"),
            element_at(col("w"), i + 1).as("word")))).as("p"))
      .select(col("p.prev").as("prev"), col("p.word").as("word"))
      .groupBy("prev", "word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("prev").asc, col("word").asc)
      .limit(bigramVocab)
  }

  /**
   * Per-document mean negative log-likelihood under an INTERPOLATED
   * bigram LM — the distributed stand-in for the CCNet/KenLM perplexity
   * filter one rung up from [[unigramNll]]: repetitive boilerplate
   * ("the the the…") scores LOW (its bigrams are frequent), shuffled or
   * gibberish text scores HIGH even when its unigrams are common —
   * word-ORDER signal a unigram model cannot see. Per position i:
   * {{{
   *   p_uni(w)   = (c_w + α) / (T + α·(V+1))          (unigramNll's formula)
   *   p_bi(w|v)  = (c_vw + α) / (c_v + α·(V+1))       (successor smoothing)
   *   p_1        = p_uni                               (no predecessor)
   *   p_i        = λ·p_bi + (1−λ)·p_uni                (i ≥ 2)
   * }}}
   * with c_vw from `biModel` (0 when absent), c_v / c_w from `uniModel`
   * (0 for OOV), T/V the unigram total/vocab. Every probability is
   * positive, so NLL is always finite. Returns (doc_id, n_tokens, nll);
   * zero-token documents are absent (the [[unigramNll]] convention).
   *
   * Scale shape: both models localize once (metadata-sized) and
   * broadcast; the token stream is ONE explode carrying each token's
   * predecessor alongside (no self-join to find it), three broadcast
   * joins (word / prev / pair), and the per-doc regroup shuffles one
   * partially-aggregated row per document.
   */
  def bigramNll(
    df: DataFrame,
    uniModel: DataFrame,
    biModel: DataFrame,
    textCol: String,
    idCol: String,
    alpha: Double = 1.0,
    lambda: Double = 0.7
  ): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive for finite OOV scores: $alpha")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    val uni = Similarity.localize(
      uniModel.select(col("word"), col("n").cast("long").as("n")))
    val bi = Similarity.localize(
      biModel.select(col("prev"), col("word"), col("n").cast("long").as("n_bi")))
    val tv = uni.agg(
      coalesce(sum(col("n")), lit(0L)).as("t"),
      count(lit(1)).as("v")).head()
    val denom = tv.getLong(0).toDouble + alpha * (tv.getLong(1).toDouble + 1.0)
    val succDenomAdd = alpha * (tv.getLong(1).toDouble + 1.0)
    val toks = Dedup.wordTable(df, textCol, idCol)
      .filter(size(col("w")) >= 1)
      .select(col("doc_id"),
        explode(
          transform(sequence(lit(1), size(col("w"))),
            i => struct(
              element_at(col("w"), i).as("word"),
              when(i === 1, lit(null).cast("string"))
                .otherwise(element_at(col("w"), i - 1)).as("prev")))).as("t"))
      .select(col("doc_id"), col("t.word").as("word"), col("t.prev").as("prev"))
    val pUni = (coalesce(col("n"), lit(0L)).cast("double") + alpha) / denom
    val pBi = (coalesce(col("n_bi"), lit(0L)).cast("double") + alpha) /
      (coalesce(col("n_prev"), lit(0L)).cast("double") + succDenomAdd)
    val p = when(col("prev").isNull, pUni)
      .otherwise(lit(lambda) * pBi + lit(1.0 - lambda) * pUni)
    toks
      .join(broadcast(uni), Seq("word"), "left")
      .join(broadcast(uni.select(col("word").as("prev"), col("n").as("n_prev"))),
        Seq("prev"), "left")
      .join(broadcast(bi), Seq("prev", "word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(-log(p)).as("nll_sum"))
      .select(col("doc_id"), col("n_tokens"),
        (col("nll_sum") / col("n_tokens").cast("double")).as("nll"))
  }

  /**
   * Smoothed unigram KL divergence between two corpora — the
   * distribution-drift monitor: how far corpus A's token distribution
   * has moved from reference corpus B (new crawl vs last crawl, a
   * filtered mix vs its target, batch N vs batch N−1). Returns one row
   * per symbol — the union of both corpora's top-`vocabSize`
   * vocabularies plus a `<oov>` bucket holding all remaining mass —
   * with add-α smoothed probabilities and the KL integrand:
   * {{{
   *   p(w) = (c_A(w) + α) / (T_A + α·(V+1))      (q likewise from B)
   *   kl_term(w) = p(w) · ln(p(w) / q(w))
   * }}}
   * `sum(kl_term)` is KL(A‖B) in nats, ≥ 0, finite by construction
   * (both distributions sum to 1 exactly over the V+1 symbols; the
   * `<oov>` label is safe — normalized words are [a-z0-9]+ only).
   *
   * Scale shape: each corpus is exploded and count-aggregated ONCE into
   * a LOCALIZED word-count table (vocabulary-sized — Heaps-law bounded
   * far below corpus scale, the same driver economics as the vocab
   * broadcasts this function already does). The plan boundary is
   * load-bearing, not a cache nicety: the top-V cut, the in-vocab
   * lookup, and the total-token fold all consume the counts, and
   * without it Catalyst pushes the in-vocab semi join BELOW the count
   * aggregate, splitting the consumers into non-identical subtrees that
   * each re-scan the corpus (observed: 26 scans at plan level). With
   * it, the corpus is scanned once per side. An earlier persist()-based
   * boundary had the same plan shape but left the counts in the
   * BlockManager while the call ran — under a memory-pressured session
   * its first access swung 1.9-14.5 s with eviction thrash; the
   * localized relation is deterministic. Everything past the counts is
   * vocab-sized; the result (≤ 2V+1 rows) is likewise computed EAGERLY
   * and returned localized — no persisted state outlives the call
   * (TextAnalysisSpec pins it).
   */
  def unigramDivergence(
    dfA: DataFrame,
    dfB: DataFrame,
    textCol: String,
    vocabSize: Int = 10000,
    alpha: Double = 1.0
  ): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    require(alpha > 0.0, s"alpha must be positive for finite KL: $alpha")
    def counts(df: DataFrame) =
      Similarity.localize(
        df.select(explode(Hashing.normalizedWords(col(textCol))).as("word"))
          .groupBy("word").agg(count(lit(1)).as("n")))
    val cA = counts(dfA)
    val cB = counts(dfB)
    def topV(c: DataFrame) =
      c.orderBy(col("n").desc, col("word").asc).limit(vocabSize).select("word")
    val vocab = topV(cA).union(topV(cB)).distinct()
    val inA = cA.join(broadcast(vocab), Seq("word"), "left_semi")
      .withColumnRenamed("n", "n_a")
    val inB = cB.join(broadcast(vocab), Seq("word"), "left_semi")
      .withColumnRenamed("n", "n_b")
    val joined = vocab
      .join(broadcast(inA), Seq("word"), "left")
      .join(broadcast(inB), Seq("word"), "left")
      .na.fill(0L, Seq("n_a", "n_b"))
    // one broadcast row: totals, in-vocab mass, vocab size
    val stats = joined
      .agg(
        coalesce(sum(col("n_a")), lit(0L)).as("va"),
        coalesce(sum(col("n_b")), lit(0L)).as("vb"),
        count(lit(1)).as("v"))
      .crossJoin(cA.agg(coalesce(sum(col("n")), lit(0L)).as("t_a")))
      .crossJoin(cB.agg(coalesce(sum(col("n")), lit(0L)).as("t_b")))
    val symbols = joined.select(col("word"), col("n_a"), col("n_b"))
      .unionByName(stats.select(
        lit("<oov>").as("word"),
        (col("t_a") - col("va")).as("n_a"),
        (col("t_b") - col("vb")).as("n_b")))
    val pA = (col("n_a") + alpha) / (col("t_a") + lit(alpha) * (col("v") + 1))
    val pB = (col("n_b") + alpha) / (col("t_b") + lit(alpha) * (col("v") + 1))
    Similarity.localize(
      symbols
        .crossJoin(broadcast(stats))
        .select(col("word"), pA.as("p_a"), pB.as("p_b"))
        .select(col("word"), col("p_a"), col("p_b"),
          (col("p_a") * log(col("p_a") / col("p_b"))).as("kl_term")))
  }

  /**
   * Per-document Shannon character entropy (bits/char) over the first
   * `maxChars` characters — the cheapest repetitive-garbage detector:
   * natural English runs ~4 bits/char, keyboard mash and single-char
   * floods sit far lower, random base64 higher. NULL for NULL/empty
   * text (no distribution to measure).
   *
   * One NATIVE pass per row ([[graft.functions.CharEntropyExpr]]):
   * code-point counts into a small map, then
   * H = (ln n − Σ c·ln c / n) / ln 2, code-gen'd as a single static
   * call. Earlier portable spellings of the same values — a
   * per-distinct-count HOF, then a sorted run-length fold — measured
   * 5-8× and ~2× slower respectively (HOF lambdas are interpreted).
   * Zero shuffle; `maxChars` keeps the cost flat at 100 TB (quality
   * signals don't need the tail of a 10 MB document).
   */
  def withCharEntropy(
    df: DataFrame,
    textCol: String,
    outCol: String = "char_entropy",
    maxChars: Int = 2000
  ): DataFrame = {
    require(maxChars >= 1, s"maxChars must be >= 1: $maxChars")
    Cols.requireAbsent(df, outCol)
    df.withColumn(outCol,
      graft.functions.CharEntropyExpr(substring(col(textCol), 1, maxChars)))
  }

  /**
   * Unicode-normalize text (default NFC) — run BEFORE any hash-keyed
   * operator on multilingual corpora: composed and decomposed accents
   * are different bytes, so unnormalized text defeats exact dedup,
   * line rules, shingle hashing, and contamination grams on visually
   * identical content. Native codegen'd expression
   * ([[graft.functions.UnicodeNormExpr]]), pure scan projection.
   */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    graft.functions.UnicodeNormExpr(c, form)

  /**
   * Accent folding for match keys (entity resolution, URL slugs,
   * blocklist lookups): NFD-decompose, strip every combining mark
   * (`\p{M}` — the Unicode category, not a hand list), NFC-recompose —
   * "café" → "cafe", "Müller" → "Muller". Deliberately NOT a
   * transliteration: characters that are not base+mark decompositions
   * (ß, æ, ø) pass through unchanged, the same contract as public
   * `strip_accents` implementations, which is what keeps the DuckDB
   * oracle exact. Pure scan projection (native norm expr + one regex),
   * streaming-safe. NULL propagates.
   */
  def foldAccents(c: Column): Column =
    graft.functions.UnicodeNormExpr(
      regexp_replace(graft.functions.UnicodeNormExpr(c, "NFD"), "\\p{M}", ""),
      "NFC")

  /** PII patterns chosen to mean the same thing in Java regex and RE2
    * (no backrefs, no lookaround) so engine and oracle agree: emails,
    * IPv4 literals, and phone-ish digit runs. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  /**
   * Masks emails, IPv4 addresses, then phone-like digit runs with
   * `replacement` — the pre-training scrub pass. Order matters (emails
   * and IPs contain digit runs; the replacement token contains none, so
   * later passes can't re-match earlier masks). Three codegen'd
   * regexp_replace calls in the scan projection: no UDF, no shuffle.
   */
  def scrubPii(c: Column, replacement: String = "<PII>"): Column = {
    val r = lit(replacement)
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailPattern), r),
        lit(Ipv4Pattern), r),
      lit(PhonePattern), r)
  }

  /**
   * Per-group token distribution stats — the monitoring aggregate a
   * pipeline runs over every ingest to catch distribution drift:
   * (byCol, n_docs, total_tokens, mean_tokens, p<q>_tokens …).
   *
   * `approx = false` (default) uses EXACT percentiles — a sort-based
   * aggregation holding each group's values, value-identical to
   * DuckDB's quantile_cont and therefore oracle-gateable. At 100 TB
   * pass `approx = true`: percentile_approx streams a bounded sketch
   * per group instead of materializing the values (rank error ≤
   * 1/accuracy) — same columns, spec-pinned near the exact form.
   * Everything else is plain partial-aggregated count/sum/avg either
   * way: one shuffle on byCol.
   */
  def tokenStats(
    df: DataFrame,
    textCol: String,
    byCol: String,
    percentiles: Seq[Double] = Seq(0.5, 0.95),
    approx: Boolean = false,
    accuracy: Int = 10000
  ): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1]: $percentiles")
    val names = percentiles.map(p => s"p${(p * 100).round}_tokens")
    require(names.distinct.size == names.size,
      s"percentiles $percentiles collide after rounding to column names $names — " +
        "duplicate output columns would be ambiguous downstream")
    val tok = wsTokenCount(col(textCol)).as("tok")
    val pCols = percentiles.zip(names).map { case (p, name) =>
      val c = if (approx) percentile_approx(col("tok"), lit(p), lit(accuracy)).cast("double")
              else percentile(col("tok"), lit(p))
      round(c, 4).as(name)
    }
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      sum(col("tok")).cast("long").as("total_tokens"),
      round(avg(col("tok")), 4).as("mean_tokens")) ++ pCols
    df.select(col(byCol), tok)
      .groupBy(byCol)
      .agg(aggs.head, aggs.tail: _*)
  }
}
