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
}
