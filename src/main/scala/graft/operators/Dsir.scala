package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/**
 * DSIR-style targeted data selection (Data Selection via Importance
 * Resampling, arXiv:2302.03169): score every raw document by how much
 * more target-like than raw-like its hashed n-gram profile is, then
 * resample with deterministic Gumbel-top-k noise — the standard recipe
 * for pulling "more data like this trusted set" out of a 100 TB crawl
 * without training a classifier.
 *
 * Features are unigrams + bigrams of [[Hashing.normalizedWords]],
 * hashed into `nBuckets` buckets (md5-based so the DuckDB oracle
 * re-derives every bucket). The model is the per-bucket add-α
 * log-likelihood ratio; a document's importance weight is the sum of
 * the ratio over its gram OCCURRENCES (≡ Σ_f c_f · log p_t(f)/p_r(f)).
 *
 * Scale shape: the model is nBuckets rows — metadata — fit with ONE
 * scan per corpus (each count aggregation is immediately densified
 * against the bucket spine and LOCALIZED, so no downstream consumer
 * can re-trigger the corpus scan) and broadcast for scoring. Scoring
 * explodes grams, joins the broadcast model at the gram level, and
 * partially aggregates per doc — one corpus scan, shuffle volume one
 * row per document (the [[Contamination.contaminationScores]] shape);
 * gram counts are never shuffled. Resampling is a global top-n
 * (TakeOrderedAndProject — each partition surrenders n rows).
 *
 * The Gumbel noise is HASH-derived, not random: u ∈ (0,1) comes from a
 * 30-bit md5 slice of (seed, doc_id), g = −ln(−ln(u)). Deterministic →
 * rerun-stable, partitioning-independent, and the oracle re-derives
 * every selection decision (the [[Sampling.hashSample]] doctrine).
 */
object Dsir {

  /** Unigram + bigram gram HASHES over a BOUND word-array attribute —
    * fused native windowed hashing (ShingleHashExpr at k=1 and k=2)
    * rather than an interpreted per-gram concat lambda: md5_60 of each
    * word, then of each space-joined word pair — byte-identical to
    * hashing the gram strings (the oracle's h60(gram) spelling). The
    * size guards keep the whole-text fallback out (an empty doc has no
    * grams; a 1-word doc has no bigrams), so the norm argument is
    * never read. */
  private[operators] def gramHashesOf(w: Column): Column =
    concat(
      when(size(w) >= 1, graft.functions.ShingleHashExpr(w, lit(""), 1))
        .otherwise(array().cast("array<bigint>")),
      when(size(w) >= 2, graft.functions.ShingleHashExpr(w, lit(""), 2))
        .otherwise(array().cast("array<bigint>")))

  /** (doc_id, bucket) per gram occurrence — the feature stream, built
    * on [[Dedup.wordTable]] (the corpus-wide normalized-word notion).
    * Shared with [[QualityClassifier]]: one hashed-gram feature space
    * serves importance resampling AND model-based quality scoring. */
  private[operators] def gramBuckets(
    df: DataFrame, textCol: String, idCol: String, nBuckets: Int): DataFrame =
    Dedup.wordTable(df, textCol, idCol)
      .select(col("doc_id"), explode(gramHashesOf(col("w"))).as("h"))
      .select(col("doc_id"), pmod(col("h"), lit(nBuckets.toLong)).as("bucket"))

  /** Dense per-bucket occurrence counts for one corpus, LOCALIZED
    * (nBuckets rows): one corpus scan, no re-triggerable lineage.
    * Inline word materialization (not [[Dedup.wordTable]]) only because
    * model fitting takes no id column; the word notion is still
    * [[Hashing.normalizedWords]]. */
  private def denseCounts(
    df: DataFrame, textCol: String, nBuckets: Int, outCol: String): DataFrame = {
    val spine = df.sparkSession.range(nBuckets).select(col("id").as("bucket"))
    val counts = df
      .select(Hashing.normalizedWords(col(textCol)).as("w"))
      .select(explode(gramHashesOf(col("w"))).as("h"))
      .select(pmod(col("h"), lit(nBuckets.toLong)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(outCol))
    Similarity.localize(
      spine.join(counts, Seq("bucket"), "left").na.fill(0L, Seq(outCol)))
  }

  /**
   * Fit the log-likelihood-ratio model: (bucket, log_ratio) for every
   * bucket, log_ratio = ln p_target(b) − ln p_raw(b) with add-α
   * smoothing (p(b) = (c_b + α) / (T + α·nBuckets); every bucket has
   * positive mass, so ratios are finite even for unseen grams).
   * Metadata-sized and localized — broadcast it into scoring.
   */
  def logRatioModel(
    target: DataFrame,
    raw: DataFrame,
    textCol: String,
    nBuckets: Int = 10000,
    alpha: Double = 1.0
  ): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(alpha > 0.0, s"alpha must be positive for finite ratios: $alpha")
    val dt = denseCounts(target, textCol, nBuckets, "n_t")
    val dr = denseCounts(raw, textCol, nBuckets, "n_r")
    val stats = dt.agg(coalesce(sum(col("n_t")), lit(0L)).as("t_t"))
      .crossJoin(dr.agg(coalesce(sum(col("n_r")), lit(0L)).as("t_r")))
    val logP = (n: Column, t: Column) =>
      log((n + alpha) / (t + lit(alpha) * nBuckets))
    dt.join(dr, Seq("bucket"))
      .crossJoin(broadcast(stats))
      .select(col("bucket"),
        (logP(col("n_t"), col("t_t")) - logP(col("n_r"), col("t_r"))).as("log_ratio"))
  }

  /**
   * (doc_id, weight): per-document importance weight under a fitted
   * `model`. The bucket count is READ OFF the model (it is dense by
   * [[logRatioModel]]'s contract — one row per bucket, metadata-sized),
   * so scoring can never hash into buckets the model lacks: a separate
   * nBuckets parameter here would let a fit/score mismatch silently
   * drop gram occurrences through the inner join. Density is VALIDATED,
   * not assumed: a filtered or deduplicated model frame would otherwise
   * silently re-derive a different bucket modulus than the fit used and
   * skew every weight — that caller error fails loudly here instead
   * (the model is a localized metadata-sized relation, so the one
   * validating aggregate is driver-cheap). Documents with zero grams
   * have no profile and are absent (the contamination NULL-text
   * convention).
   */
  /** Validate that `model` is a dense (bucket, …) spine — one row per
    * bucket 0..D−1 — and return D. Shared with [[QualityClassifier]];
    * see [[importanceWeights]] for why density is validated, not
    * assumed. `fitHint` names the fitting entry point in the error. */
  private[operators] def requireDenseBucketSpine(
    model: DataFrame, fitHint: String): Int =
    localizedDenseSpine(model, fitHint)._2

  /** Collect a metadata-sized dense (bucket, …) spine in ONE job,
    * validate density on the DRIVER, and re-root it as a local relation
    * plus D. This is the score-path spelling of
    * [[requireDenseBucketSpine]]: the first cut ran a validation
    * AGGREGATION job per `score()` call and then let the broadcast
    * exchange re-scan the caller's plan — two extra jobs per scoring
    * call. Here validation shares the one collect the broadcast needs
    * anyway, and the returned frame is a LocalRelation, so the exchange
    * builds from driver rows with no scan job underneath: score-shaped
    * callers run exactly one corpus job. The spine is metadata-sized by
    * [[logRatioModel]]'s contract, so the collect is bounded. */
  private[operators] def localizedDenseSpine(
    model: DataFrame, fitHint: String): (DataFrame, Int) = {
    val rows = model.collect()
    val n = rows.length.toLong
    require(n >= 1, s"model is empty — fit it with $fitHint first")
    val idx = model.schema.fieldIndex("bucket")
    var lo = Long.MaxValue
    var hi = Long.MinValue
    val seen = new scala.collection.mutable.HashSet[Long]
    rows.foreach { r =>
      val b = r.get(idx).asInstanceOf[Number].longValue()
      if (b < lo) lo = b
      if (b > hi) hi = b
      seen += b
    }
    require(
      seen.size.toLong == n && lo == 0L && hi == n - 1,
      s"model is not a dense bucket spine (expected one row per bucket " +
        s"0..${n - 1}; found ${seen.size} distinct " +
        s"buckets in [$lo, $hi] " +
        s"over $n rows) — pass the unmodified $fitHint output")
    val spark = model.sparkSession
    (spark.createDataFrame(java.util.Arrays.asList(rows: _*), model.schema), n.toInt)
  }

  def importanceWeights(
    df: DataFrame,
    model: DataFrame,
    textCol: String,
    idCol: String
  ): DataFrame = {
    val (spine, nBuckets) = localizedDenseSpine(model, "logRatioModel")
    gramBuckets(df, textCol, idCol, nBuckets)
      .join(broadcast(spine), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum(col("log_ratio")).as("weight"))
  }

  /**
   * Deterministic Gumbel keys over a weights table: u from a 30-bit md5
   * slice of (seed, doc_id) — u = (h mod 2³⁰ + 0.5) / 2³⁰, strictly
   * inside (0,1) with exact double arithmetic, so both engines compute
   * identical u bit-for-bit — g = −ln(−ln(u)), key = weight/τ + g.
   * Top-n by key ≡ sampling n docs without replacement ∝ exp(weight/τ)
   * (the Gumbel-top-k identity); τ → 0 approaches hard top-n by weight.
   */
  def gumbelKeys(
    weights: DataFrame,
    tau: Double = 1.0,
    seed: String = "dsir"
  ): DataFrame = {
    require(tau > 0.0, s"tau must be positive: $tau")
    Cols.requireAbsent(weights, "gumbel", "key")
    val h30 = pmod(
      Hashing.md5Long60(concat(lit(seed), lit(":"), col("doc_id").cast("string"))),
      lit(1073741824L))
    val u = (h30 + 0.5) / lit(1073741824.0)
    weights
      .withColumn("gumbel", -log(-log(u)))
      .withColumn("key", col("weight") / tau + col("gumbel"))
  }

  /**
   * The full selection: fit-free scoring of `df` under `model`, Gumbel
   * keys, and the top-`n` cut (key desc, doc_id tiebreak) — plans as
   * TakeOrderedAndProject, no global sort (DsirSpec pins it).
   */
  def resample(
    df: DataFrame,
    model: DataFrame,
    textCol: String,
    idCol: String,
    n: Int,
    tau: Double = 1.0,
    seed: String = "dsir"
  ): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    gumbelKeys(importanceWeights(df, model, textCol, idCol), tau, seed)
      .orderBy(col("key").desc, col("doc_id").asc)
      .limit(n)
  }
}
