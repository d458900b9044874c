package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/**
 * Deterministic sampling, split assignment, and sequence binning for
 * training-data pipelines.
 *
 * All three are HASH-deterministic, not RNG-based: membership depends
 * only on (seed, id), so a rerun — or a different cluster, executor
 * count, or partitioning — selects exactly the same rows. That property
 * is what a 100 TB corpus actually needs from its train/val split:
 * re-ingesting one shard must not reshuffle everyone else's membership,
 * and an exact DuckDB oracle can re-derive every decision (no
 * RNG-stream coupling to Spark internals). Everything is a pure
 * projection or one window — no driver involvement, no collect.
 */
object Sampling {

  /** Buckets per unit of probability mass: hash mod 1e9 gives 9 decimal
    * digits of fraction resolution (modulo bias off a 60-bit hash is
    * ~1e-9 relative — negligible). Public so oracles and callers derive
    * thresholds from the SAME constant; fractions below 1/Buckets are
    * rejected loudly rather than silently rounding to an empty sample. */
  val Buckets = 1000000000L

  /** The 60-bit seeded id hash reduced to a bucket in [0, Buckets):
    * md5_long60(seed || ':' || id) mod Buckets — the same engine-portable
    * MD5 primitive the dedup family uses, so oracles re-derive it
    * byte-for-byte. */
  def hashBucket(id: Column, seed: String): Column =
    Hashing.md5Long60(concat(lit(seed), lit(":"), id.cast("string"))) % Buckets

  /**
   * Deterministic sample: keeps rows whose hash bucket falls under
   * `fraction` of the bucket space. One codegen'd filter in the scan
   * stage (a computed hash can't be a parquet PushedFilter, but nothing
   * shuffles and nothing leaves the executor) — rerun-stable at any
   * parallelism. Samples NEST: fraction 0.1 selects a subset of
   * fraction 0.3 under the same seed.
   */
  def hashSample(
    df: DataFrame,
    idCol: String,
    fraction: Double,
    seed: String = "graft"
  ): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1]: $fraction")
    val threshold = (fraction * Buckets).toLong
    require(fraction == 0.0 || threshold >= 1L,
      s"fraction $fraction is below the sampling resolution 1/$Buckets — " +
        "it would silently select nothing")
    df.filter(hashBucket(col(idCol), seed) < threshold)
  }

  /**
   * Train/val/test-style split assignment: every row gets a `split`
   * label, chosen by where its hash bucket lands in the cumulative
   * weight ranges. Weights are normalized (pass 98/1/1 or 0.98/0.01/0.01
   * alike); every row is assigned to exactly one split (the last range
   * absorbs the rounding remainder). Pure projection.
   *
   * Leakage-safe GROUPED splits need no separate operator: pass the
   * group key as `idCol` (the URL domain from [[Web.withUrlParts]], a
   * [[Dedup.clusterNearDuplicates]] cluster_id) and every row of a
   * group lands in the same split — near-duplicates can then never
   * straddle train and validation.
   */
  def splitAssign(
    df: DataFrame,
    idCol: String,
    weights: Seq[(String, Double)],
    seed: String = "graft",
    splitCol: String = "split"
  ): DataFrame = {
    require(weights.nonEmpty, "at least one split weight required")
    require(weights.forall(_._2 > 0.0), s"weights must be positive: $weights")
    // same loud-failure convention as sampleByStrata/rebalance: a repeated
    // name would silently pool its weights into one split (and the
    // zero-width check below would report the wrong weight via find-first)
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate split names in $weights")
    Cols.requireAbsent(df, splitCol)
    val total = weights.map(_._2).sum
    // cumulative upper bucket bound per split; the last is forced to the
    // full bucket space so float rounding can't leave rows unassigned
    val bounds = weights.inits.toSeq.reverse.tail
      .map(ws => (ws.last._1, (ws.map(_._2).sum / total * Buckets).toLong))
    val withLast = bounds.init :+ (bounds.last._1, Buckets)
    // every split must own at least one bucket, or it would silently
    // never be assigned
    withLast.foldLeft(0L) { case (prev, (name, upper)) =>
      require(upper > prev,
        s"split '$name' has zero width at resolution 1/$Buckets " +
          s"(normalized weight ${weights.find(_._1 == name).get._2 / total})")
      upper
    }
    val b = hashBucket(col(idCol), seed)
    val expr = withLast.init.foldRight(lit(withLast.last._1): Column) {
      case ((name, upper), rest) => when(b < upper, lit(name)).otherwise(rest)
    }
    df.withColumn(splitCol, expr)
  }

  /**
   * LEAKAGE-SAFE split assignment: [[splitAssign]] keyed by
   * near-duplicate CLUSTER instead of document, so two near-copies of
   * one page can never land in different splits — the eval-integrity
   * failure grouped hashing exists to prevent (a val doc whose
   * near-twin sits in train is a leaked answer, and pairwise dedup
   * upstream only helps if it caught and dropped the twin). `pairs` is
   * any (id_a, id_b) link table — [[Dedup.nearDuplicates]],
   * [[Dedup.imageNearDups]]' output, SimHash pairs — closed into
   * TRANSITIVE clusters ([[Dedup.connectedComponents]]; a chain
   * a~b~c must share one split even if (a, c) never paired), each
   * document hashing on its cluster id (unpaired documents on their
   * own id — value-identical to plain [[splitAssign]] for them).
   *
   * Scale shape: the member table is PAIR-bounded, never corpus-sized
   * — one left join attaches cluster ids, then the pure-projection
   * split hash; the corpus is never shuffled.
   */
  def leakageSafeSplits(
    df: DataFrame,
    pairs: DataFrame,
    idCol: String,
    weights: Seq[(String, Double)],
    seed: String = "graft",
    splitCol: String = "split",
    maxIters: Int = 20,
    localizeEdgeLimit: Long = 2000000L
  ): DataFrame =
    leakageSafeSplitsWithClusters(df,
      Dedup.connectedComponents(pairs, maxIters, localizeEdgeLimit),
      idCol, weights, seed, splitCol)

  /** [[leakageSafeSplits]] over a PRECOMPUTED (doc_id, cluster_id)
    * member table — for callers that already hold the cluster
    * structure (e.g. the curation soft-dedup arm, whose weights derive
    * from the same clusters the splits should key on) and must not pay
    * a second pair computation. Docs absent from the member table hash
    * on their own id; members may reference docs not in `df` (a
    * cluster whose min id was dropped by a later gate still keys its
    * survivors deterministically). */
  def leakageSafeSplitsWithClusters(
    df: DataFrame,
    members: DataFrame,
    idCol: String,
    weights: Seq[(String, Double)],
    seed: String = "graft",
    splitCol: String = "split"
  ): DataFrame = {
    Cols.requireAbsent(df, "__lsf_cid", "__lsf_key")
    val m = members
      .select(col("doc_id").as(idCol), col("cluster_id").as("__lsf_cid"))
    val keyed = df.join(m, Seq(idCol), "left")
      .withColumn("__lsf_key", coalesce(col("__lsf_cid"), col(idCol)))
    splitAssign(keyed, "__lsf_key", weights, seed, splitCol)
      .drop("__lsf_cid", "__lsf_key")
  }

  /**
   * TOKEN-BUDGET selection: the maximal prefix of the corpus in
   * `orderBy` order whose cumulative `weightCol` stays ≤ `budget` —
   * "give me the best N-token training set" as one deterministic
   * operator (order by a quality score DESC with an id tiebreak and
   * weight by token count, and the result is the highest-quality
   * corpus that fits the budget; rerun-stable because the order is
   * total and the cumsum exact). Docs are kept WHOLE — the boundary
   * doc that would cross the budget is dropped, not truncated
   * (truncation is [[packSequences]]' job downstream).
   *
   * Shape: [[TrainingOrder.withRunningTotal]] (one range shuffle,
   * per-partition offsets, exact long cumsum — never a
   * single-partition window) + one pushed filter. Weights must be
   * non-negative for the prefix semantics to hold (a negative weight
   * would re-admit later rows); NULL weights count as zero and never
   * break the prefix.
   */
  /** Non-negative weight enforcement, inline in the projection (no
    * extra pass — the fail-loud doctrine): a negative weight would
    * pull the cumsum back UNDER budget and re-admit rows after the
    * boundary, so the result would be neither a prefix nor
    * budget-bounded, silently. */
  private def nonNegWeight(weightCol: String, who: String): Column =
    when(col(weightCol) < 0,
      raise_error(concat(
        lit(s"$who: negative weight breaks prefix semantics: "),
        col(weightCol).cast("string"))).cast("long"))
      .otherwise(col(weightCol).cast("long"))

  def selectByBudget(
    df: DataFrame,
    weightCol: String,
    budget: Long,
    orderBy: Seq[Column],
    numPartitions: Option[Int] = None
  ): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0: $budget")
    Cols.requireAbsent(df, "__sbb_cum", "__sbb_w")
    TrainingOrder.withRunningTotal(
        df.withColumn("__sbb_w", nonNegWeight(weightCol, "selectByBudget")),
        orderBy, "__sbb_w", "__sbb_cum", numPartitions)
      .filter(col("__sbb_cum") <= budget)
      .drop("__sbb_cum", "__sbb_w")
  }

  /**
   * PER-GROUP token budgets — [[selectByBudget]] with an independent
   * budget for every `groupCol` value ("at most N tokens per language
   * / domain / source", the mixture-shaping twin of the global
   * prefix): within each group the maximal `orderBy`-prefix whose
   * cumulative `weightCol` stays ≤ `budget` survives; groups are
   * independent, so one bloated domain exhausting its budget never
   * eats another's.
   *
   * Shape: ONE window pass PARTITIONED by group (`sum(w) OVER
   * (PARTITION BY g ORDER BY … ROWS UNBOUNDED PRECEDING)`) — a
   * partitioned running sum is shuffle-parallel (hash-partitioned on
   * the group key, nothing like the single-partition global form
   * [[TrainingOrder.withRunningTotal]] exists to avoid); a skewed
   * giant group serializes only its own partition, the usual window
   * caveat. NULL groups form their own group; NULL weights count 0.
   */
  def selectByBudgetPerGroup(
    df: DataFrame,
    weightCol: String,
    budget: Long,
    groupCol: String,
    orderBy: Seq[Column],
    ranged: Boolean = false
  ): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0: $budget")
    require(orderBy.nonEmpty, "selectByBudgetPerGroup needs an order")
    Cols.requireAbsent(df, "__sbg_cum", "__sbg_w")
    val guarded = df.withColumn("__sbg_w",
      nonNegWeight(weightCol, "selectByBudgetPerGroup"))
    val cum =
      if (ranged)
        // few-giant-groups regime: range-partitioned grouped totals
        // parallelize WITHIN each group (see withRunningTotalGrouped)
        TrainingOrder.withRunningTotalGrouped(guarded, groupCol, orderBy,
          "__sbg_w", "__sbg_cum")
      else {
        val w = Window.partitionBy(col(groupCol)).orderBy(orderBy: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        guarded.withColumn("__sbg_cum",
          sum(coalesce(col("__sbg_w"), lit(0L))).over(w))
      }
    cum.filter(col("__sbg_cum") <= budget).drop("__sbg_cum", "__sbg_w")
  }

  /**
   * Stratified deterministic sample: like [[hashSample]] but with a
   * per-stratum fraction — the knob that rebalances a corpus mix
   * (languages, domains, sources) without an RNG. Strata absent from
   * `fractions` (and NULL strata) fall back to `defaultFraction`; pass
   * 1.0 to keep them whole, 0.0 (the default) to drop them.
   *
   * The hash bucket is the SAME function of (seed, id) as
   * [[hashSample]], deliberately shared across strata: raising one
   * stratum's fraction never reshuffles another stratum's membership,
   * and per-stratum samples NEST (0.1 ⊂ 0.3) exactly like the global
   * form. Still one codegen'd filter — no shuffle, no driver state.
   */
  def sampleByStrata(
    df: DataFrame,
    idCol: String,
    strataCol: String,
    fractions: Seq[(String, Double)],
    defaultFraction: Double = 0.0,
    seed: String = "graft"
  ): DataFrame = {
    require(fractions.map(_._1).distinct.size == fractions.size,
      s"duplicate strata in $fractions")
    (defaultFraction +: fractions.map(_._2)).foreach { f =>
      require(f >= 0.0 && f <= 1.0, s"fraction must be in [0,1]: $f")
      require(f == 0.0 || (f * Buckets).toLong >= 1L,
        s"fraction $f is below the sampling resolution 1/$Buckets — " +
          "it would silently select nothing")
    }
    val b = hashBucket(col(idCol), seed)
    val threshold = fractions.foldRight(lit((defaultFraction * Buckets).toLong): Column) {
      case ((stratum, f), rest) =>
        when(col(strataCol) === stratum, lit((f * Buckets).toLong)).otherwise(rest)
    }
    df.filter(b < threshold)
  }

  /**
   * Rebalance a corpus to TARGET mixture weights (the "30% code / 50%
   * web / 20% books" knob): finds the largest total size N at which
   * every stratum can supply its share `w_s / ΣW` from the rows it has,
   * then hash-samples each stratum down to its share. Strata outside
   * `targetWeights` are dropped. Weights are INTEGERS so every
   * threshold derives in exact int64 arithmetic — an external oracle
   * can re-compute each decision bit-for-bit, with no float
   * normalization drift.
   *
   * Derivation (all integer): `N = min_s floor(count_s · ΣW / w_s)`,
   * per-stratum take `n_s = floor(N · w_s / ΣW)`, membership
   * `bucket < floor(n_s · Buckets / count_s)`. Realized sizes are
   * hash-approximate (± the usual binomial noise), like every
   * deterministic-hash sampler here.
   *
   * Scale shape: one partial-aggregated count per stratum (collected —
   * strata-cardinality rows, metadata-sized), then ONE codegen'd
   * filter. Membership inherits [[hashSample]]'s bucket function, so
   * re-running with different weights never reshuffles a stratum's
   * member identity, only its cut-off.
   */
  def rebalance(
    df: DataFrame,
    idCol: String,
    strataCol: String,
    targetWeights: Seq[(String, Long)],
    seed: String = "graft"
  ): DataFrame = {
    require(targetWeights.nonEmpty, "at least one target stratum required")
    require(targetWeights.forall(_._2 > 0L), s"weights must be positive: $targetWeights")
    require(targetWeights.map(_._1).distinct.size == targetWeights.size,
      s"duplicate strata in $targetWeights")
    val w = targetWeights.toMap
    val sumW = targetWeights.map(_._2).sum
    // strata compare in STRING space end-to-end (an int domain-id column
    // works like a string one): the cast keeps the collected keys and the
    // filter semantics aligned for any column type — getString on a
    // non-string column would throw at plan build instead
    val strata = col(strataCol).cast("string")
    val counts = df.filter(strata.isin(targetWeights.map(_._1): _*))
      .groupBy(strata.as("__stratum")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = w.keySet -- counts.keySet
    require(missing.isEmpty,
      s"target strata absent from the corpus: ${missing.mkString(", ")}")
    // BigInt: count_s·ΣW and take·Buckets overflow int64 at 100 TB row
    // counts; the final thresholds are < Buckets and always fit a Long
    val n = targetWeights
      .map { case (s, ws) => BigInt(counts(s)) * sumW / ws }.min
    val b = hashBucket(col(idCol), seed)
    val thresholds = targetWeights.map { case (s, ws) =>
      val take = n * ws / sumW
      val t = (take * Buckets / counts(s)).toLong
      // same loud-failure convention as hashSample/sampleByStrata: a
      // stratum so abundant (or a weight so small) that its cut rounds
      // to zero buckets must not silently vanish from the mix
      require(t >= 1L,
        s"stratum '$s' would be emptied: take $take of ${counts(s)} rows " +
          s"is below the sampling resolution 1/$Buckets")
      s -> t
    }
    val threshold = thresholds.foldRight(lit(0L): Column) {
      case ((s, t), rest) => when(strata === s, lit(t)).otherwise(rest)
    }
    df.filter(b < threshold)
  }

  /**
   * Temperature-based corpus mixing (the XLM-R / mT5 multilingual rule):
   * stratum s is kept in proportion to count(s)^(1/T) — T = 1 preserves
   * the natural mix, T → ∞ approaches uniform, T = 2 (the default, and
   * the common published setting) square-roots the counts so
   * low-resource strata are upsampled RELATIVELY without exhausting
   * them. The exponentiated counts become integer target weights
   * (floored, min 1) for [[rebalance]], which does the exact-arithmetic
   * membership cut — deterministic, nesting, rerun-stable.
   *
   * T = 2 computes weights via `sqrt` — exactly rounded by IEEE 754 on
   * every engine, so an oracle can re-derive the floored weights
   * bit-for-bit. Other temperatures go through `pow`, whose last-ulp
   * behavior is libm-specific; results are deterministic WITHIN a
   * deployment but a cross-engine re-derivation may flip a weight at a
   * perfect-power boundary (the gate pins T = 2).
   *
   * Cost: one metadata-sized count aggregation here plus rebalance's
   * own — two tiny jobs before the single corpus-scan filter.
   */
  def temperatureRebalance(
    df: DataFrame,
    idCol: String,
    strataCol: String,
    strata: Seq[String],
    temperature: Double = 2.0,
    seed: String = "graft"
  ): DataFrame = {
    require(strata.nonEmpty, "at least one stratum required")
    require(strata.distinct.size == strata.size, s"duplicate strata in $strata")
    require(temperature >= 1.0, s"temperature must be >= 1: $temperature")
    val strataC = col(strataCol).cast("string")
    val counts = df.filter(strataC.isin(strata: _*))
      .groupBy(strataC.as("__stratum")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = strata.toSet -- counts.keySet
    require(missing.isEmpty,
      s"strata absent from the corpus: ${missing.mkString(", ")}")
    val weights = strata.map { s =>
      val root =
        if (temperature == 2.0) math.sqrt(counts(s).toDouble) // exactly rounded
        else math.pow(counts(s).toDouble, 1.0 / temperature)
      s -> math.max(1L, math.floor(root).toLong)
    }
    rebalance(df, idCol, strataCol, weights, seed)
  }

  /**
   * Keep the top `fraction` of each group by `orderCol` — the RELATIVE
   * quality floor ("drop the worst 30% per language"), done rank-wise
   * rather than threshold-wise so the cut is exact even when scores tie
   * or cluster: rows rank with a deterministic tiebreak (desc/asc
   * `orderCol`, then ascending `idCol`) and the top
   * `floor(fraction · count_group)` survive (minimum 1 row per group,
   * so a tiny group is never emptied by rounding).
   *
   * Scale shape: one hash shuffle on `byCol`, then rank + count as two
   * window functions over the SAME window spec — a single Window node,
   * no self-join against a quantile table, no second shuffle.
   */
  def keepTopFraction(
    df: DataFrame,
    byCol: String,
    orderCol: String,
    fraction: Double,
    idCol: String,
    desc: Boolean = true
  ): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction must be in (0,1]: $fraction")
    Cols.requireAbsent(df, "__rn", "__n")
    // NULLS LAST in both directions (see topKBy)
    val ord = if (desc) col(orderCol).desc_nulls_last else col(orderCol).asc_nulls_last
    val w = Window.partitionBy(col(byCol)).orderBy(ord, col(idCol).asc)
    // the count rides the SAME ordered spec with a full frame, so rank
    // and count evaluate in one Window node over one shuffle+sort
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wFull))
      .filter(col("__rn") <= greatest(floor(lit(fraction) * col("__n")), lit(1L)))
      .drop("__rn", "__n")
  }

  /**
   * Per-group top-k selection with a deterministic total order: keeps the
   * `k` rows with the smallest (`desc = false`) or largest (`desc = true`)
   * `orderCol` per `byCol` group, ties broken by ascending `idCol` so the
   * result is unique and rerun-stable. The canonical curation uses: "top
   * k documents per source by quality" and "cap every domain at N
   * documents" (an anti-crawler-loop rule) are both this operator.
   *
   * Scale shape: one rank window = hash shuffle on `byCol` + sort. The
   * `row_number <= k` filter lets Spark insert WindowGroupLimit, which
   * prunes each map partition to its local top-k BEFORE the shuffle —
   * at 100 TB the exchange moves ~k rows per (group × input partition),
   * not the corpus (SamplingSpec asserts the plan). `rankCol` is kept in
   * the output (1-based) so downstream packing knows the order.
   */
  def topKBy(
    df: DataFrame,
    byCol: String,
    orderCol: String,
    k: Int,
    idCol: String,
    desc: Boolean = true,
    rankCol: String = "rank"
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    Cols.requireAbsent(df, rankCol)
    // explicit NULLS LAST both ways: Spark's bare asc is nulls-FIRST
    // while most SQL engines (and the DuckDB oracle) default nulls-last
    // — a NULL score must never outrank a real one
    val ord = if (desc) col(orderCol).desc_nulls_last else col(orderCol).asc_nulls_last
    val w = Window.partitionBy(col(byCol)).orderBy(ord, col(idCol).asc)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }

  /**
   * Sequence binning for sample packing: orders rows by `idCol` (within
   * `byCol` partitions when given) and assigns each a `bin_id` so that
   * consecutive rows accumulate into bins of roughly `budget` tokens —
   * bin_id = floor(exclusive-running-sum / budget). A row straddling a
   * boundary lands in the bin its prefix sum opens, so a bin's total can
   * exceed the budget by at most one row's tokens (and a row larger than
   * the whole budget occupies its own bin); bins are never built by
   * driver-side iteration.
   *
   * Scale shape: partitioned by `byCol` it is ONE window — a hash
   * shuffle + per-partition sort, the per-key form. Global (byCol =
   * None) it takes the [[TrainingOrder.withGlobalIndex]] recipe instead
   * of a global window (which would plan Exchange SinglePartition and
   * move EVERY row to one task): a range shuffle on `idCol`, local
   * prefix sums per partition, a metadata-sized collect of the
   * per-partition token totals (numPartitions longs), and broadcast
   * exclusive offsets — no single-task stage at any corpus size. The
   * shuffle files are written once and read by both jobs (one RDD
   * lineage — the second job skips the map stage).
   */
  def binByTokenBudget(
    df: DataFrame,
    tokenCol: String,
    idCol: String,
    budget: Long,
    byCol: Option[String] = None,
    binCol: String = "bin_id"
  ): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    Cols.requireAbsent(df, binCol)
    byCol match {
      case Some(c) =>
        val w = Window.partitionBy(col(c)).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
        val prefix = coalesce(sum(col(tokenCol)).over(w), lit(0L))
        df.withColumn(binCol, floor(prefix / lit(budget)))
      case None => globalBins(df, tokenCol, idCol, budget, binCol)
    }
  }

  /** The scale-safe global arm: exact corpus-wide prefix sums without a
    * total-order exchange. Same carve-out rationale as
    * [[TrainingOrder.withGlobalIndex]] — a contiguous cross-partition
    * running total has no relational spelling that avoids Exchange
    * SinglePartition, but it IS two cheap passes over one range
    * shuffle: per-partition totals (collected — numPartitions longs,
    * metadata), then a map with each partition's broadcast exclusive
    * offset. NULL tokens count 0, matching the window arm's null-
    * skipping sum. */
  private def globalBins(
    df: DataFrame,
    tokenCol: String,
    idCol: String,
    budget: Long,
    binCol: String
  ): DataFrame = {
    val spark = df.sparkSession
    // the conf's textual form may be non-numeric on AQE-managed
    // platforms ("auto") — fall back to the context default
    val n = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    val sorted = df
      .repartitionByRange(n, col(idCol).asc)
      .sortWithinPartitions(col(idCol).asc)
    val tokIdx = sorted.schema.fieldIndex(tokenCol)
    def tokOf(r: org.apache.spark.sql.Row): Long = r.get(tokIdx) match {
      case null => 0L
      case v: Number => v.longValue()
      case other => throw new IllegalArgumentException(
        s"binByTokenBudget: tokenCol '$tokenCol' must be numeric, " +
          s"got ${other.getClass.getName}")
    }
    // ONE lineage: job 1 (totals) materializes the range shuffle, job 2
    // (binning) reuses its files with the map stage skipped
    val rdd = sorted.rdd
    val totals = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += tokOf(r))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(totals.scanLeft(0L)(_ + _))
    val schema = sorted.schema
      .add(binCol, org.apache.spark.sql.types.LongType, nullable = false)
    val binned = rdd.mapPartitionsWithIndex { (pid, it) =>
      var prefix = offsets.value(pid)
      it.map { r =>
        val bin = prefix / budget // exclusive prefix opens the row's bin
        prefix += tokOf(r)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bin)
      }
    }
    spark.createDataFrame(binned, schema)
  }

  /**
   * Sequence PACKING on top of [[binByTokenBudget]]: concatenates each
   * bin's documents (in id order, `sep`-joined) into one training
   * sequence — the step that turns a curated corpus into fixed-budget
   * model inputs without padding waste. Returns one row per bin:
   * ([byCol,] bin_id, n_docs, total_tokens, packed).
   *
   * Scale shape: the binning window's shuffle (see [[binByTokenBudget]]
   * — pass `byCol` at corpus scale) feeds ONE groupBy on the same key
   * space; in-bin order is restored from the collected (id, text)
   * structs, never by a second sort of the corpus. Bins are
   * budget-bounded by construction, so the collected array is one
   * sequence's worth of text — bounded task memory.
   */
  def packSequences(
    df: DataFrame,
    textCol: String,
    idCol: String,
    tokenCol: String,
    budget: Long,
    byCol: Option[String] = None,
    sep: String = "\n\n"
  ): DataFrame = {
    val binned = binByTokenBudget(df, tokenCol, idCol, budget, byCol)
    val keys = (byCol.toSeq :+ "bin_id").map(col)
    binned
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("total_tokens"),
        concat_ws(sep,
          transform(
            array_sort(collect_list(struct(col(idCol), col(textCol)))),
            s => s(textCol))).as("packed"))
  }

  /**
   * Assign each row its quantile bucket of `valueCol`: bucket i holds
   * values in (b_i, b_{i+1}] where the boundaries are the 1/n … (n−1)/n
   * percentiles — the quality-tier / curriculum-binning primitive
   * (bucket by perplexity, length, entropy; then mix per tier). Ties at
   * a boundary fall to the LOWER bucket (strict `>`); NULL values get a
   * NULL bucket.
   *
   * Scale shape: boundaries are ONE broadcast aggregate row (kept
   * inside the plan, no eager action) and bucketing is a codegen'd
   * projection — unlike ntile there is NO global window and no
   * Exchange SinglePartition (the binByTokenBudget hazard). Exact
   * percentiles (default) sort per-group state — fine to a few hundred
   * million rows and required by the DuckDB oracle; pass
   * `approx = true` at corpus scale for the bounded
   * percentile_approx sketch (same plan shape, spec-pinned near
   * exact).
   */
  def withQuantileBucket(
    df: DataFrame,
    valueCol: String,
    nBuckets: Int = 4,
    outCol: String = "q_bucket",
    approx: Boolean = false,
    accuracy: Int = 10000
  ): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2: $nBuckets")
    Cols.requireAbsent(df, outCol, "__qb_bounds")
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val v = col(valueCol).cast("double")
    val boundsExpr =
      if (approx)
        transform(
          percentile_approx(v, array(qs.map(lit): _*), lit(accuracy)),
          x => x.cast("double"))
      else percentile(v, array(qs.map(lit): _*))
    val bounds = df.agg(boundsExpr.as("__qb_bounds"))
    df.crossJoin(broadcast(bounds))
      .withColumn(outCol,
        when(v.isNotNull,
          aggregate(col("__qb_bounds"), lit(0),
            (acc, b) => acc + when(v > b, 1).otherwise(0)))
          .otherwise(lit(null).cast("int")))
      .drop("__qb_bounds")
  }

  /**
   * Weighted sampling WITHOUT replacement, Efraimidis–Spirakis A-Res
   * (IPL 2006 — the public one-pass algorithm): each row gets the key
   * ln(u)/w with u = (md5_long60(seed:id) + 1) / 2^60 ∈ (0, 1], and the
   * k LARGEST keys are the sample — distributed exactly as u^(1/w)
   * top-k (ln is monotone; the log spelling avoids pow's cross-platform
   * non-portability). Deterministic for a (seed, id) pair — re-runs,
   * engines, and retries agree; rows with NULL/non-positive weight have
   * zero inclusion probability and drop out.
   *
   * Scale shape: the key is a pure projection on the portable hash;
   * the global arm is TakeOrderedAndProject (per-partition heaps, only
   * k rows cross the wire — never a global sort); the grouped arm is
   * one hash shuffle + a rank window (WindowGroupLimit pushes the
   * per-group heap below the exchange, the [[topKBy]] shape).
   */
  def weightedSample(
    df: DataFrame,
    weightCol: String,
    idCol: String,
    k: Int,
    seed: String = "es",
    byCol: Option[String] = None
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    Cols.requireAbsent(df, "es_key")
    val u = (Hashing.md5Long60(
      concat(lit(seed + ":"), col(idCol).cast("string"))) + 1).cast("double") /
      lit(1152921504606846976.0) // 2^60
    val w = col(weightCol).cast("double")
    val keyed = df.filter(w.isNotNull && w > 0.0)
      .withColumn("es_key", log(u) / w)
    byCol match {
      case None =>
        keyed.orderBy(col("es_key").desc, col(idCol)).limit(k)
      case Some(g) =>
        val win = Window.partitionBy(col(g))
          .orderBy(col("es_key").desc, col(idCol))
        keyed.withColumn("__rn", row_number().over(win))
          .filter(col("__rn") <= k)
          .drop("__rn")
    }
  }
}
