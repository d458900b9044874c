package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) data layout clustering — the multi-column
 * locality lever behind "OPTIMIZE ZORDER BY" in public lakehouse
 * engines (Morton 1966; public technique).
 *
 * Min-max scale each clustering column to `bits` bits, interleave the
 * bits, range-partition + sort on the interleaved value: rows close in
 * EVERY clustered dimension land in the same output file, so per-file
 * min/max stats (see [[SkipIndex]]) prune multi-dimensional predicates
 * — a single-column sort gives perfect pruning on one column and none
 * on the rest; the z-curve trades a little of each for locality on all.
 *
 * Why it scales (the 100 TB argument):
 *  - One metadata job computes per-column min/max (a single
 *    partial-aggregated row, collected driver-side — bounded by column
 *    count, never by data).
 *  - The z-value itself is a pure codegen'd projection (casts, shifts,
 *    masks — no UDF, no shuffle), then ONE range shuffle on the scalar
 *    z-value — exactly the shuffle any layout rewrite must pay, with
 *    Spark's range partitioner sampling handling skew.
 *  - Min-max scaling (not rank scaling) keeps the prep at one agg; a
 *    heavily skewed column concentrates z-prefixes — documented trade,
 *    same as public OPTIMIZE implementations; feed a pre-bucketed
 *    column when skew matters.
 */
object Layout {

  /**
   * The interleaved z-value for `cols` (all numeric/castable to double),
   * scaled by the PROVIDED per-column (min, max): floor(((v − min) / (max
   * − min)) · (2^bits − 1) + 0.5), constant column → 0, NULL → 0 (sorts
   * first, the convention for missing keys). Total interleaved width
   * `bits · cols.length` must fit a signed long.
   */
  def zorderValueWith(
    colsWithBounds: Seq[(Column, (Double, Double))],
    bits: Int
  ): Column = {
    val n = colsWithBounds.length
    require(n >= 1, "need at least one clustering column")
    require(bits >= 1 && bits * n <= 62,
      s"bits*cols must fit a signed long: bits=$bits cols=$n")
    val maxLevel = (1L << bits) - 1
    val scaled = colsWithBounds.map { case (c, (mn, mx)) =>
      if (mx == mn) lit(0L)
      else {
        val unit = (c.cast("double") - lit(mn)) / lit(mx - mn)
        // clamp: with CALLER-provided bounds (a stable layout contract
        // reused across drops), out-of-range values saturate at the
        // edge levels instead of corrupting the interleave
        coalesce(
          least(greatest(
            floor(unit * lit(maxLevel.toDouble) + lit(0.5)).cast("long"),
            lit(0L)), lit(maxLevel)),
          lit(0L))
      }
    }
    // z = OR over (bit b of column j) << (b*n + j) — pure shift/mask ops,
    // whole-stage-codegen friendly
    val pieces = for {
      b <- 0 until bits
      (s, j) <- scaled.zipWithIndex
    } yield shiftleft(shiftright(s, b).bitwiseAND(lit(1L)), b * n + j)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Collect per-column (min, max) in ONE aggregation job (a single
    * metadata-sized row). All-NULL columns get (0, 0). */
  def columnBounds(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap { c =>
      Seq(min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      val mn = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      (mn, mx)
    }
  }

  /** [[zorderValueWith]] with the bounds computed from `df` itself. */
  def withZorderValue(
    df: DataFrame,
    cols: Seq[String],
    bits: Int = 16,
    outCol: String = "z_value"
  ): DataFrame = {
    val bounds = columnBounds(df, cols)
    df.withColumn(outCol,
      zorderValueWith(cols.map(col).zip(bounds), bits))
  }

  /**
   * Cluster `df` for writing: range-partition on the z-value into
   * `numPartitions` output partitions and sort within each — every
   * output file covers one contiguous z-range, i.e. a small hyper-box
   * in the clustered dimensions. Write the result with any sink;
   * build a [[SkipIndex]] over the files to get the pruning.
   */
  def clusterByZorder(
    df: DataFrame,
    cols: Seq[String],
    numPartitions: Int,
    bits: Int = 16
  ): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1: $numPartitions")
    withZorderValue(df, cols, bits, "__z")
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  // ------------------------------------------------------- rank scaling

  /**
   * Per-column QUANTILE boundaries (2^bits − 1 cut points each) in ONE
   * aggregation job — the rank-scaling prep. Exact percentiles by
   * default (sorts per-column agg state; right up to a few hundred
   * million rows and required by the DuckDB oracle); `approx = true`
   * switches to the bounded `percentile_approx` sketch for corpus
   * scale — same single-agg plan shape, no global sort either way.
   * All-NULL columns get all-zero boundaries (every level 0, the
   * constant-column convention).
   */
  def rankBounds(
    df: DataFrame,
    cols: Seq[String],
    bits: Int,
    approx: Boolean = false,
    accuracy: Int = 10000
  ): Seq[Array[Double]] = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20]: $bits")
    val levels = 1 << bits
    val qs = (1 until levels).map(_.toDouble / levels)
    val aggs = cols.map { c =>
      val v = col(c).cast("double")
      (if (approx)
        transform(percentile_approx(v, typedlit(qs), lit(accuracy)),
          x => x.cast("double"))
      else percentile(v, typedlit(qs))).as(s"__qb_$c")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      if (row.isNullAt(i)) Array.fill(levels - 1)(0.0)
      else row.getSeq[Double](i).toArray
    }
  }

  /**
   * The RANK-SCALED z-value: each column's level is its quantile
   * bucket (count of boundaries strictly below the value, by the
   * native binary-search [[graft.functions.SortedBucketExpr]]) instead
   * of its min-max position. This is the skew-proof arm: min-max
   * scaling gives ONE extreme outlier an entire half of the level
   * range — every normal value collapses into level 0 and the
   * dimension stops contributing to the interleave, defeating
   * [[SkipIndex]] pruning on exactly the skewed columns that need
   * clustering most. Rank scaling spreads levels by POPULATION, so an
   * outlier costs one level, not the scale.
   *
   * Cost: one quantile aggregation (no global sort — the
   * [[graft.operators.Sampling.withQuantileBucket]] discipline) and
   * ~8·(2^bits − 1) bytes of plan state per column. NULL → level 0
   * (sorts first, [[zorderValueWith]]'s missing-key convention).
   */
  def withZorderValueRanked(
    df: DataFrame,
    cols: Seq[String],
    bits: Int = 8,
    outCol: String = "z_value",
    approx: Boolean = false,
    accuracy: Int = 10000
  ): DataFrame = {
    val n = cols.length
    require(n >= 1, "need at least one clustering column")
    require(bits >= 1 && bits * n <= 62,
      s"bits*cols must fit a signed long: bits=$bits cols=$n")
    Cols.requireAbsent(df, outCol)
    val bounds = rankBounds(df, cols, bits, approx, accuracy)
    val scaled = cols.zip(bounds).map { case (c, bs) =>
      coalesce(
        graft.functions.SortedBucketExpr(col(c).cast("double"), bs.toSeq),
        lit(0L))
    }
    val pieces = for {
      b <- 0 until bits
      (s, j) <- scaled.zipWithIndex
    } yield shiftleft(shiftright(s, b).bitwiseAND(lit(1L)), b * n + j)
    df.withColumn(outCol, pieces.reduce(_.bitwiseOR(_)))
  }

  /** [[clusterByZorder]] under rank scaling — the layout rewrite for
    * skewed clustering columns. */
  def clusterByZorderRanked(
    df: DataFrame,
    cols: Seq[String],
    numPartitions: Int,
    bits: Int = 8,
    approx: Boolean = false
  ): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1: $numPartitions")
    withZorderValueRanked(df, cols, bits, "__z", approx)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
