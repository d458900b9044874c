package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * BM25 ranked retrieval over the corpus — the targeted-data-selection
 * primitive: score every document against a (small) set of keyword
 * queries and keep the best matches per query. This is how a training
 * pipeline pulls "documents about X" out of 100 TB without embeddings
 * (and how retrieval-quality eval sets are mined).
 *
 * Scoring is classic BM25 with Lucene's non-negative idf:
 * {{{
 *   idf(t)      = ln(1 + (N − df_t + 0.5) / (df_t + 0.5))
 *   score(q, d) = Σ_{t ∈ q}  idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
 * }}}
 * over [[Dedup.wordTable]] tokens (the corpus-wide word notion shared
 * with dedup/top-words/unigram scoring). N and avgdl count ALL
 * corpus docs, including token-free ones.
 *
 * Scale shape: the query term set is metadata-sized and BROADCAST; the
 * corpus is exploded ONCE and immediately semi-joined against it, so
 * only query-matching postings (docs × query terms, a sliver of the
 * token stream) ever reach a shuffle. Document frequencies are a
 * PARTIAL-AGGREGATED terms-sized table over the postings aggregate,
 * re-read through the SAME shuffle (ReuseExchange) and broadcast back
 * — NOT a per-word count window (a window gathers every posting of a
 * word into one task, so a stopword-like query term at corpus scale
 * is a straggler) and NOT a second aggregation of the corpus (a
 * naïve `postings.groupBy` branch gets column-pruned into a different
 * exchange and silently re-scans the corpus; see the reuse guard in
 * the code, and RetrievalSpec pins exactly one corpus explode plus
 * the ReusedExchange). N/avgdl ride along as a broadcast 1-row
 * aggregate (the [[TextAnalysis.unigramNll]] T/V shape, kept inside
 * the plan — no eager action). The corpus is never shuffled and never
 * joined to itself; every shuffle after the semi join is
 * postings-sized or smaller.
 */
object Retrieval {

  /**
   * All (query_id, doc_id, score) pairs with at least one matching
   * term — the value surface (oracle-gated; ranking is a window over
   * this). Docs sharing no term with a query are absent (BM25 gives
   * them score 0; materializing the zero cross product would be a
   * corpus × queries blowup for no information).
   */
  def bm25Scores(
    corpus: DataFrame,
    textCol: String,
    idCol: String,
    queries: DataFrame,
    queryIdCol: String,
    queryTextCol: String,
    k1: Double = 1.2,
    b: Double = 0.75
  ): DataFrame = {
    require(k1 >= 0.0, s"k1 must be non-negative: $k1")
    require(b >= 0.0 && b <= 1.0, s"b must be in [0, 1]: $b")
    val docs = Dedup.wordTable(corpus, textCol, idCol)
      .select(col("doc_id"), col("w"), size(col("w")).as("dl"))
    // one broadcast row: corpus size + average doc length (metadata fold
    // kept inside the plan — no eager action)
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      coalesce(avg(col("dl")), lit(0.0)).as("avgdl"))
    // query side inlines the same word notion (metadata-sized frame;
    // keeping its explode textually distinct from the corpus's bound-`w`
    // explode also lets RetrievalSpec count corpus scans unambiguously)
    val qterms = queries.select(
      col(queryIdCol).as("query_id"),
      explode(graft.functions.Hashing.normalizedWords(col(queryTextCol))).as("word"))
      .distinct()
    val terms = qterms.select("word").distinct()
    // postings restricted to query terms BEFORE any shuffle
    val postings = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("word"))
      .join(broadcast(terms), Seq("word"), "left_semi")
      .groupBy("word", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
    // document frequency: partial-aggregated per word over the postings
    // aggregate — the partials collapse to ≤ |terms| rows per partition
    // BEFORE the word shuffle, so a stopword-like term costs the same as
    // a rare one (a count window over partitionBy(word) would instead
    // drag every posting of the word into one task — the straggler this
    // round removed). count(when(tf > 0, 1)), NOT count(1), and the
    // difference is load-bearing: tf = count(1) ≥ 1 always, so counting
    // rows where
    // tf > 0 is the row count — but the predicate is opaque to the
    // optimizer, so this branch KEEPS consuming tf and its copy of the
    // postings aggregate stays column-identical to the scoring
    // branch's. count(1) — or anything Catalyst can simplify to it
    // (count(tf) rewrites via tf's non-nullability) — lets pruning
    // specialize the partial aggregate under the postings exchange,
    // breaking exchange identity → no ReuseExchange → a silent second
    // corpus scan (the pruned-agg trap; RetrievalSpec pins scan count
    // AND the ReusedExchange)
    val dfTable = postings
      .groupBy("word")
      .agg(count(when(col("tf") > 0, lit(1))).as("df"))
    // terms-sized (≤ |query terms| rows): broadcast it back onto postings
    val withDf = postings.join(broadcast(dfTable), Seq("word"))
    val idf: Column =
      log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfPart: Column =
      col("tf") * (k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    withDf
      .crossJoin(broadcast(stats))
      .select(col("word"), col("doc_id"), (idf * tfPart).as("contrib"))
      .join(broadcast(qterms), Seq("word"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score"))
  }

  /**
   * Top-k documents per query: (query_id, doc_id, score, rank), rank
   * 1..k by score desc with doc_id tiebreak. row_number ≤ k plans as
   * WindowGroupLimit — each partition surrenders only its local top-k
   * (the [[Sampling.topKBy]] economics; RetrievalSpec asserts it).
   */
  def bm25TopK(
    corpus: DataFrame,
    textCol: String,
    idCol: String,
    queries: DataFrame,
    queryIdCol: String,
    queryTextCol: String,
    k: Int = 10,
    k1: Double = 1.2,
    b: Double = 0.75
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    bm25Scores(corpus, textCol, idCol, queries, queryIdCol, queryTextCol, k1, b)
      .withColumn("rank",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }
}
