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
 * Corpus-size totals ride single-row broadcast cross joins, never a
 * collect - one action end to end, with ReuseExchange sharing each
 * count shuffle between its scalar and row consumers.
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

  /** (doc rows) → one materialized `__w` token-array column. The §4
    * doctrine: [[pairsOf]]'s lambdas index `__w` per element, so the
    * regex+split normalization MUST be a real projection column — left
    * inline it re-evaluates per element access, O(words²) per doc (the
    * Dedup.wordTable precedent; measured 185 s → sub-second on the
    * sf0.1 PMI cell). Multi-referenced ⇒ CollapseProject keeps it. */
  private def wordCol(df: DataFrame, textCol: String): DataFrame =
    df.select(Hashing.normalizedWords(col(textCol)).as("__w"))

  /** All (w1, w2, n_pair) co-occurrence counts (unfiltered). */
  private def pairCounts(df: DataFrame, textCol: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    // the explicit not-null filter is a semantic no-op (pairsOf builds
    // struct fields from least/greatest of non-null array elements) but
    // it ALIGNS this subtree with the inner-join legs downstream, whose
    // join-key isnotnull pushdown otherwise makes the pmi scalar leg
    // canonically DIFFERENT — with it, AQE stage reuse computes the
    // pair explode+count once for the pair table and the P scalar
    wordCol(df, textCol)
      .select(explode(pairsOf(col("__w"), window)).as("__p"))
      .filter(col("__p.w1").isNotNull && col("__p.w2").isNotNull)
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
    val all = pairCounts(df, textCol, window)
    val pairs = all.filter(col("n_pair") >= minCount)
    // same aligning no-op filter as pairCounts: the unigram broadcast
    // legs inherit isnotnull(w) from their join-key pushdown, and the
    // T scalar leg must canonicalize to the SAME subtree to share the
    // unigram count shuffle instead of re-running the word explode
    val uni = wordCol(df, textCol).select(explode(col("__w")).as("w"))
      .filter(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    // P counts ALL pairs (the probability space), not just minCount
    // survivors; P and T are single scalars riding as ONE-ROW broadcast
    // cross joins so the whole query is ONE action: the scalar
    // aggregates canonicalize to the same shuffle as the pair/unigram
    // subtrees, so ReuseExchange computes each corpus pass ONCE — the
    // earlier `.head()` spelling ran two extra eager jobs that each
    // re-ran a full corpus explode+count (measured 1.8 s of the 3.3 s
    // sf0.1 cell), and a persist() boundary would leak blocks past the
    // call (the zero-persisted-state hygiene contract).
    val pT = broadcast(all.agg(
      coalesce(sum(col("n_pair")).cast("double"), lit(1.0)).as("__p")))
    val tT = broadcast(uni.agg(
      coalesce(sum(col("n_w")).cast("double"), lit(1.0)).as("__t")))
    pairs
      .join(broadcast(uni.select(col("w").as("w1"), col("n_w").as("n_w1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("n_w").as("n_w2"))), "w2")
      .crossJoin(pT)
      .crossJoin(tT)
      .select(col("w1"), col("w2"), col("n_pair"),
        log((col("n_pair").cast("double") / col("__p")) /
          ((col("n_w1").cast("double") / col("__t")) *
            (col("n_w2").cast("double") / col("__t")))).as("pmi"))
  }

  /** All unordered (a, b) pairs (a before b in the SORTED set array) —
    * row-local, same short-circuit as [[pairsOf]]. */
  private def setPairsOf(sorted: Column): Column =
    when(size(sorted) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(flatten(transform(
        sequence(lit(0), size(sorted) - 2),
        i => transform(
          sequence(i + 1, size(sorted) - 1),
          j => struct(
            element_at(sorted, i + 1).as("a"),
            element_at(sorted, j + 1).as("b"))))))

  /**
   * Association rules over transactions (Agrawal & Srikant, VLDB 1994 —
   * market-basket analysis, pairwise): for every DIRECTED item pair
   * co-occurring in at least `minSupportCount` transactions,
   *
   *   support    = n_ab / N          (fraction of transactions with both)
   *   confidence = n_ab / n_ant      (P(consequent | antecedent))
   *   lift       = confidence / (n_cons / N)   (>1 ⇒ positive association)
   *
   * Item presence is per-transaction SET semantics (duplicates collapse).
   *
   * Scale shape: one distinct + one per-transaction set collection
   * (keyed shuffles), pair generation row-local over the sorted set
   * array, one map-side-combined pair count, broadcast item-count joins
   * (item vocabulary is metadata-sized), N localized as a scalar. A
   * transaction with s distinct items yields s(s−1)/2 pairs — pairwise
   * basket analysis presumes bounded item-type cardinality per basket
   * (event types, categories), not free text; use [[pmi]] for that.
   */
  def associationRules(
    df: DataFrame,
    txnCol: String,
    itemCol: String,
    minSupportCount: Long = 1L
  ): DataFrame = {
    require(minSupportCount >= 1, s"minSupportCount must be >= 1: $minSupportCount")
    val ti = df.filter(col(itemCol).isNotNull)
      .select(col(txnCol).as("__t"), col(itemCol).cast("string").as("__i"))
      .distinct()
    // N rides as a ONE-ROW broadcast cross join (the pmi spelling) so
    // the whole query is ONE action — the eager `.head()` N job paid
    // its own Catalyst planning pass on top of the scan. N is spelled
    // as a row count of the per-transaction SET table (≡ count_distinct
    // of __t over ti); note RemoveRedundantAggregates legitimately
    // strips the unused collect_set from this leg and rewrites it to a
    // bare distinct(__t), so the N scalar keeps its own (pruned,
    // 2-column) scan + distinct rather than sharing the pair chain's
    // exchange — unlike pmi's scalars, this one cannot reuse without
    // defeating the optimizer. The pair-count exchange and the
    // item-count broadcast do reuse (see plans/r21/q_assoc_rules_*).
    val itemCounts = ti.groupBy("__i").agg(count(lit(1)).as("__n"))
    val txnSets = ti.groupBy("__t")
      .agg(sort_array(collect_set(col("__i"))).as("__s"))
    val nT = broadcast(txnSets.agg(
      greatest(coalesce(count(col("__s")).cast("double"), lit(1.0)),
        lit(1.0)).as("__N")))
    val pairs = txnSets
      .select(explode(setPairsOf(col("__s"))).as("__p"))
      .select(col("__p.a"), col("__p.b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupportCount)
    val directed = pairs
      .select(col("a").as("antecedent"), col("b").as("consequent"), col("n_ab"))
      .unionByName(pairs
        .select(col("b").as("antecedent"), col("a").as("consequent"), col("n_ab")))
    directed
      .join(broadcast(itemCounts.select(col("__i").as("antecedent"),
        col("__n").as("__n_ant"))), "antecedent")
      .join(broadcast(itemCounts.select(col("__i").as("consequent"),
        col("__n").as("__n_cons"))), "consequent")
      .crossJoin(nT)
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        (col("n_ab").cast("double") / col("__N")).as("support"),
        (col("n_ab").cast("double") / col("__n_ant")).as("confidence"),
        ((col("n_ab").cast("double") / col("__n_ant")) /
          (col("__n_cons").cast("double") / col("__N"))).as("lift"))
  }
}
