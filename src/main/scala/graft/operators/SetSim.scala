package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * EXACT set-similarity self-join (Jaccard >= threshold) via prefix
 * filtering — the AllPairs/PPJoin family (Bayardo et al., WWW 2007;
 * Xiao et al., WWW 2008 — public algorithms).
 *
 * Complements the MinHash-LSH chain (SURVEY.md §2 row 27,
 * [[Dedup.nearDuplicates]]): LSH is probabilistic (recall < 1, tuned by
 * bands×rows), this join is exact — every qualifying pair is returned
 * with its true Jaccard, no false negatives. The cost model differs
 * too: LSH pays numHashes per document and banding collisions; the
 * prefix filter pays one token-frequency aggregation plus an equi-join
 * on RARE tokens only.
 *
 * Why it scales (the 100 TB argument):
 *  - A pair can qualify only if the two sets share a token inside
 *    their PREFIXES — the first `|s| - ceil(t·|s|) + 1` tokens when
 *    every set is ordered by ascending global document frequency
 *    (rarest first). Proof: jaccard(a,b) >= t implies
 *    |a∩b| >= t·|a∪b| >= ceil(t·|a|); if no prefix token of `a`
 *    is in `b`, at most `|a| - prefixLen = ceil(t·|a|) - 1` tokens
 *    can match — contradiction. So the candidate join runs only over
 *    prefix tokens, and the rare-first order puts exactly the LOW
 *    document-frequency tokens (small join buckets) in the prefixes;
 *    stopword-class tokens with huge df land at the suffix end and
 *    never generate candidates except for tiny sets.
 *  - The length filter `t·|a| <= |b| <= |a|/t` prunes candidates
 *    before verification (jaccard <= min/max of the sizes).
 *  - Verification is exact `array_intersect` on the two deduplicated
 *    token arrays — per candidate pair, no corpus re-scan.
 *  - Shuffles: one map-side-combined token-frequency agg, one
 *    token-keyed join to attach frequencies, one per-id window to
 *    rank tokens, one prefix equi-join, one distinct, two id-keyed
 *    verify joins. All keyed, no cartesian anywhere.
 *  - Residual hazard: a mid-frequency token shared by d prefixes
 *    yields O(d²) candidates. `maxTokenBucket` caps that token's
 *    prefix bucket with the loud observed-metric discipline of
 *    [[Dedup]]'s LSH cap (`graft.setsim.bucket_cap#n` — recall-for-
 *    boundedness, never silent; None disables).
 */
object SetSim {

  private val capObsId = new java.util.concurrent.atomic.AtomicLong()

  /** Default prefix-token bucket cap — same rationale as
    * [[Dedup.DefaultMaxBucket]]: bounds the worst single task. */
  val DefaultMaxTokenBucket: Option[Int] = Some(4096)

  /**
   * Exact Jaccard self-join over a precomputed token-set column.
   *
   * @param df        input; `idCol` must be unique per row
   * @param setCol    array column; duplicates inside an array are
   *                  collapsed (set semantics), null/empty sets drop out
   * @param idCol     unique orderable id
   * @param threshold Jaccard threshold in (0, 1]
   * @param maxTokenBucket cap on one prefix token's bucket (see scaladoc)
   * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
   */
  def setSimilarityJoin(
    df: DataFrame,
    setCol: String,
    idCol: String,
    threshold: Double,
    maxTokenBucket: Option[Int] = DefaultMaxTokenBucket
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val sets = df.select(
        col(idCol).as("__id"),
        array_distinct(col(setCol)).as("__set"))
      .filter(col("__set").isNotNull && size(col("__set")) > 0)

    // global token document frequencies — ONE map-side-combined agg
    val tokenDf = sets
      .select(explode(col("__set")).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__df"))

    // per-document tokens ranked rarest-first ((df, token) is a total
    // order, so no global rank — and no single-partition stage — needed)
    val byRarity = Window.partitionBy("__id")
      .orderBy(col("__df").asc, col("__tok").asc)
    val prefix = sets
      .select(col("__id"), size(col("__set")).as("__n"),
        explode(col("__set")).as("__tok"))
      .join(tokenDf, "__tok")
      .withColumn("__pos", row_number().over(byRarity))
      .filter(col("__pos") <= col("__n") - ceil(col("__n") * threshold) + 1)
      .select("__tok", "__id", "__n")

    val capped = maxTokenBucket.fold(prefix) { c =>
      require(c >= 2, s"maxTokenBucket must be >= 2 (a pair), got $c")
      val oversized = size(col("__ids")) > c
      prefix
        .groupBy("__tok")
        .agg(collect_list(struct(col("__id"), col("__n"))).as("__ids"))
        .observe(
          s"graft.setsim.bucket_cap#${capObsId.incrementAndGet()}",
          coalesce(sum(when(oversized, lit(1L))), lit(0L)).as("dropped_buckets"),
          coalesce(sum(when(oversized, size(col("__ids")).cast("long"))), lit(0L))
            .as("dropped_rows"))
        .filter(!oversized)
        .select(col("__tok"), explode(col("__ids")).as("__e"))
        .select(col("__tok"), col("__e.__id").as("__id"), col("__e.__n").as("__n"))
    }

    // candidate pairs: prefix-token equi-join + the length filter;
    // id_a < id_b halves the space and fixes the output orientation
    val cands = capped.select(col("__tok"), col("__id").as("id_a"), col("__n").as("__na"))
      .join(capped.select(col("__tok"), col("__id").as("id_b"), col("__n").as("__nb")),
        Seq("__tok"))
      .filter(col("id_a") < col("id_b") &&
        col("__na") >= col("__nb") * threshold &&
        col("__nb") >= col("__na") * threshold)
      .select("id_a", "id_b")
      .distinct()

    // exact verification on the candidate pairs only
    cands
      .join(sets.select(col("__id").as("id_a"), col("__set").as("__sa")), "id_a")
      .join(sets.select(col("__id").as("id_b"), col("__set").as("__sb")), "id_b")
      .withColumn("__ov", size(array_intersect(col("__sa"), col("__sb"))))
      .withColumn("jaccard", col("__ov").cast("double") /
        (size(col("__sa")) + size(col("__sb")) - col("__ov")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * Text arm: exact near-duplicate pairs over k-word shingle sets —
   * the same shingling as the MinHash chain, evaluated over the 60-bit
   * HASHED shingles ([[Dedup.hashedShingleTable]], the
   * jaccardVerifyHashed precedent): Jaccard over distinct hashed
   * shingles equals Jaccard over distinct shingle strings up to a
   * ~2⁻⁶⁰-per-pair collision — and the hashed table's generator child
   * is the cheap native ShingleHashExpr, which matters because
   * Catalyst's InferFiltersFromGenerate INLINES the generator child
   * into a pushed-down `size(..) > 0` filter evaluated per input row:
   * with the string-shingle HOF spelling that filter re-derives
   * normalize+split per lambda element — O(words·shingles) regex per
   * document, measured 11 s on a 440-doc fixture; the hashed spelling
   * is O(words) per evaluation and sub-second. A pipeline can run LSH
   * at crawl scale and this exact join on the suspicious partition
   * with identical similarity semantics.
   */
  def setSimilarityPairs(
    df: DataFrame,
    textCol: String,
    idCol: String,
    threshold: Double,
    k: Int = 3,
    maxTokenBucket: Option[Int] = DefaultMaxTokenBucket
  ): DataFrame =
    setSimilarityJoin(
      Dedup.hashedShingleTable(df, textCol, idCol, k)
        .withColumnRenamed("doc_id", idCol)
        .withColumnRenamed("hs", "__shingles"),
      "__shingles", idCol, threshold, maxTokenBucket)
}
