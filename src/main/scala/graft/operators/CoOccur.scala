package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/**
 * Word co-occurrence counts and PMI (pointwise mutual information)
 * association scores over a sliding token window — the corpus statistic
 * behind collocation mining, word-embedding co-occurrence matrices
 * (GloVe-style), and phrase discovery (Church & Hanks 1990 — public
 * method).
 *
 * Pair semantics: within each document's normalized token sequence,
 * every ordered position pair (i, j) with 0 < j − i <= window counts
 * once; the pair key is unordered (lexicographically least token
 * first), so "hash join" and "join hash" accumulate together.
 *
 * Scale shape: pair generation is ROW-LOCAL — a nested higher-order
 * transform over the token array (no positional self-join, no explode
 * before the combine), so the only shuffles are the two
 * map-side-combined counts (pairs, unigrams) and the final
 * vocabulary-sized join of pair counts onto unigram counts (broadcast:
 * the unigram table is the vocabulary, metadata-sized by Heaps' law).
 * Corpus-size totals ride a single-row cross join, never a collect.
 */
object CoOccur {

  /** Unordered within-window pair list of a token array — row-local.
    * (Spark `sequence` runs DESCENDING when start > stop, so the
    * size < 2 case must short-circuit to an empty list explicitly.) */
  private def pairsOf(words: Column, window: Int): Column =
    when(size(words) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(flatten(transform(
        sequence(lit(0), size(words) - 2),
        i => transform(
          sequence(i + 1, least(i + window, size(words) - 1)),
          j => struct(
            least(element_at(words, i + 1), element_at(words, j + 1)).as("w1"),
            greatest(element_at(words, i + 1), element_at(words, j + 1)).as("w2"))))))

  /** All (w1, w2, n_pair) co-occurrence counts (unfiltered). */
  private def pairCounts(df: DataFrame, textCol: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val words = Hashing.normalizedWords(col(textCol))
    df.select(explode(pairsOf(words, window)).as("__p"))
      .select(col("__p.w1"), col("__p.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
  }

  /** (w1, w2, n_pair) co-occurrence counts; `minCount` prunes the tail. */
  def coOccurrence(
    df: DataFrame,
    textCol: String,
    window: Int = 3,
    minCount: Long = 1L
  ): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    pairCounts(df, textCol, window).filter(col("n_pair") >= minCount)
  }

  /**
   * PMI table: ln( (n_pair / P) / ((n_w1 / T) · (n_w2 / T)) ) for every
   * surviving pair, where P = total within-window pairs and T = total
   * token occurrences. Positive PMI ⇒ the pair co-occurs more than
   * independent unigram frequencies predict (a collocation).
   */
  def pmi(
    df: DataFrame,
    textCol: String,
    window: Int = 3,
    minCount: Long = 1L
  ): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val words = Hashing.normalizedWords(col(textCol))
    val all = pairCounts(df, textCol, window)
    val pairs = all.filter(col("n_pair") >= minCount)
    val uni = df.select(explode(words).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    // P counts ALL pairs (the probability space), not just minCount
    // survivors; P and T are single scalars — localized eagerly (two
    // metadata-sized jobs, the k-means-centroid convention) and embedded
    // as literals so the main query stays one pass
    val pRow = all.agg(sum(col("n_pair"))).head()
    val tRow = uni.agg(sum(col("n_w"))).head()
    val p = if (pRow.isNullAt(0)) 1.0 else pRow.getLong(0).toDouble
    val t = if (tRow.isNullAt(0)) 1.0 else tRow.getLong(0).toDouble
    pairs
      .join(broadcast(uni.select(col("w").as("w1"), col("n_w").as("n_w1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("n_w").as("n_w2"))), "w2")
      .select(col("w1"), col("w2"), col("n_pair"),
        log((col("n_pair").cast("double") / lit(p)) /
          ((col("n_w1").cast("double") / lit(t)) *
            (col("n_w2").cast("double") / lit(t)))).as("pmi"))
  }
}
