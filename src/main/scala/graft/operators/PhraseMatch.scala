package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{AcAutomaton, AcMatchExpr}

/**
 * Multi-phrase blocklist matching over text — banned phrases, PII
 * keyword families, contamination markers — via a broadcast
 * Aho–Corasick automaton ([[graft.functions.AcAutomaton]]): ONE
 * O(text) pass matches every pattern of an arbitrarily large list,
 * where the regex-alternation spelling collapses past a few thousand
 * alternatives and per-pattern `contains` scans pay O(N·text).
 *
 * Scale shape: the automaton is pattern-list-sized metadata, built
 * once driver-side and broadcast; matching is a pure stateless
 * projection (no shuffle, streaming-safe, predicate-pushdown-friendly
 * when used as a filter). Compose with [[TextAnalysis.piiScrub]] for
 * regex-shaped PII and [[Web.dropBlockedDomains]] for provenance.
 */
object PhraseMatch {

  /** Build + broadcast the automaton (build is driver-side; nodes ≤
    * total pattern chars). */
  def matcher(
    spark: SparkSession,
    patterns: Seq[String],
    caseInsensitive: Boolean = true
  ): Broadcast[AcAutomaton] =
    spark.sparkContext.broadcast(
      new AcAutomaton(patterns.toIndexedSeq, caseInsensitive))

  /** Matched-pattern array column (ORIGINAL pattern forms, pattern-list
    * order) for `textCol` under a prebuilt automaton. */
  def matchesColumn(
    textCol: Column,
    automaton: Broadcast[AcAutomaton],
    patterns: Seq[String]
  ): Column =
    transform(AcMatchExpr(textCol, automaton),
      i => element_at(typedlit(patterns), i + 1))

  /** Adds `outCol`: array<string> of the patterns found in `textCol`
    * (distinct, pattern-list order; empty array when none, NULL text →
    * NULL). One automaton build + broadcast per call — prebuild with
    * [[matcher]] + [[matchesColumn]] to share across frames. */
  def withMatches(
    df: DataFrame,
    textCol: String,
    patterns: Seq[String],
    caseInsensitive: Boolean = true,
    outCol: String = "matched_phrases"
  ): DataFrame = {
    Cols.requireAbsent(df, outCol)
    val bc = matcher(df.sparkSession, patterns, caseInsensitive)
    df.withColumn(outCol, matchesColumn(col(textCol), bc, patterns))
  }

  /** Drops rows whose text contains ANY listed phrase. NULL text is
    * KEPT (a blocklist removes known-bad content; NULL is unknown —
    * the [[Web.dropBlockedDomains]] convention). */
  def dropMatching(
    df: DataFrame,
    textCol: String,
    patterns: Seq[String],
    caseInsensitive: Boolean = true
  ): DataFrame = {
    val bc = matcher(df.sparkSession, patterns, caseInsensitive)
    df.filter(col(textCol).isNull ||
      size(AcMatchExpr(col(textCol), bc)) === 0)
  }
}
