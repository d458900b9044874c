package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality validation (the Deequ/dbt-tests niche,
 * re-expressed Spark-first): a rule set compiles to ONE aggregation
 * pass over the corpus — however many rules, the data is scanned once
 * and every metric rides the same partial-aggregate shuffle of a single
 * row. The report is metadata-sized (one row per rule), so acting on
 * it (gate a pipeline stage, alert, fail the job) costs nothing beyond
 * the scan.
 *
 * Metrics are exact (count ratios and min/max — engine-portable, so a
 * SQL oracle re-derives them bit-for-bit), with the one documented
 * exception that [[Checks.UniqueRate]] uses an exact count-distinct:
 * Spark plans multi-distinct aggregates with an Expand (input rows
 * duplicated per distinct column), so prefer ONE UniqueRate per call
 * at corpus scale, or accept the Expand cost knowingly.
 */
object Checks {

  /** A named expectation over one column. `name` defaults per type. */
  sealed trait Rule {
    def column: String
    def name: String
  }

  /** Fraction of rows with `column` non-null must be ≥ `minRate`. */
  case class NonNullRate(column: String, minRate: Double) extends Rule {
    require(minRate >= 0 && minRate <= 1, s"minRate must be in [0,1]: $minRate")
    def name = s"non_null_rate($column)"
  }

  /** Distinct non-null values / non-null rows must be ≥ `minRate`
    * (1.0 = the column is a key among non-null rows). */
  case class UniqueRate(column: String, minRate: Double) extends Rule {
    require(minRate >= 0 && minRate <= 1, s"minRate must be in [0,1]: $minRate")
    def name = s"unique_rate($column)"
  }

  /** Every non-null value must lie in [min, max] (either side optional). */
  case class ValueRange(column: String,
      min: Option[Double] = None, max: Option[Double] = None) extends Rule {
    require(min.isDefined || max.isDefined, "ValueRange needs min and/or max")
    def name = s"value_range($column)"
  }

  /** Fraction of non-null values inside `values` must be ≥ `minRate`. */
  case class AcceptedValues(column: String, values: Seq[String],
      minRate: Double = 1.0) extends Rule {
    require(values.nonEmpty, "AcceptedValues needs at least one value")
    require(minRate >= 0 && minRate <= 1, s"minRate must be in [0,1]: $minRate")
    def name = s"accepted_values($column)"
  }

  /** Fraction of non-null values matching `regex` must be ≥ `minRate`. */
  case class MatchRate(column: String, regex: String, minRate: Double) extends Rule {
    require(minRate >= 0 && minRate <= 1, s"minRate must be in [0,1]: $minRate")
    def name = s"match_rate($column)"
  }

  /** ratio with fail-closed semantics: 0 denominator → NULL metric
    * (which never satisfies ≥, so an empty corpus FAILS its checks
    * rather than vacuously passing). */
  private def rate(num: Column, den: Column): Column =
    when(den === 0, lit(null)).otherwise(num.cast("double") / den.cast("double"))

  /**
   * Evaluate every rule in one corpus scan. Returns one row per rule:
   * `(rule, column, metric, threshold, ok)` — `metric` the measured
   * value (null on an empty/all-null input where the rate is
   * undefined), `ok` 1/0 with null-metric failing closed. Row order
   * follows the input rule order.
   */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    // one aggregate expression list; each rule contributes its terms
    val exprs = scala.collection.mutable.ArrayBuffer.empty[Column]
    exprs += count(lit(1)).as("__n")
    rules.zipWithIndex.foreach { case (r, i) =>
      r match {
        case NonNullRate(c, _) =>
          exprs += count(col(c)).as(s"__m$i")
        case UniqueRate(c, _) =>
          exprs += countDistinct(col(c)).as(s"__m$i")
          exprs += count(col(c)).as(s"__d$i")
        case ValueRange(c, _, _) =>
          // try_cast, not cast: ANSI mode makes a plain cast THROW on the
          // first junk value mid-aggregate; try_cast nulls it so the scan
          // completes and the junk is counted as a violation below
          val d = expr(s"try_cast(`$c` AS DOUBLE)")
          exprs += min(d).as(s"__lo$i")
          exprs += max(d).as(s"__hi$i")
          exprs += count(col(c)).as(s"__d$i")
          // non-null values the double cast loses are VIOLATIONS, not
          // ignorable: fail-closed on junk ("abc" in a numeric column)
          exprs += count(when(col(c).isNotNull && d.isNull,
            lit(1))).as(s"__bad$i")
        case AcceptedValues(c, vs, _) =>
          exprs += count(when(col(c).isin(vs: _*), lit(1))).as(s"__m$i")
          exprs += count(col(c)).as(s"__d$i")
        case MatchRate(c, re, _) =>
          exprs += count(when(regexp_like(col(c), lit(re)), lit(1))).as(s"__m$i")
          exprs += count(col(c)).as(s"__d$i")
      }
    }
    val row = df.agg(exprs.head, exprs.tail.toSeq: _*).collect().head
    def l(n: String): Long = row.getAs[Long](n)
    def dOpt(n: String): Option[Double] =
      if (row.isNullAt(row.fieldIndex(n))) None else Some(row.getAs[Double](n))
    val n = l("__n")
    val out = rules.zipWithIndex.map { case (r, i) =>
      val (metric: Option[Double], threshold: Double) = r match {
        case NonNullRate(_, t) =>
          (if (n == 0) None else Some(l(s"__m$i").toDouble / n.toDouble), t)
        case UniqueRate(_, t) =>
          val d = l(s"__d$i")
          (if (d == 0) None else Some(l(s"__m$i").toDouble / d.toDouble), t)
        case ValueRange(_, lo, hi) =>
          val d = l(s"__d$i")
          if (d == 0) (None, 1.0)
          else if (l(s"__bad$i") > 0) (Some(0.0), 1.0) // uncastable values present
          else {
            // d > 0 with no cast-nulls ⇒ min/max are defined; a missing
            // one still fails closed rather than throwing
            val inRange = (dOpt(s"__lo$i"), dOpt(s"__hi$i")) match {
              case (Some(mn), Some(mx)) => lo.forall(mn >= _) && hi.forall(mx <= _)
              case _ => false
            }
            (Some(if (inRange) 1.0 else 0.0), 1.0)
          }
        case AcceptedValues(_, _, t) =>
          val d = l(s"__d$i")
          (if (d == 0) None else Some(l(s"__m$i").toDouble / d.toDouble), t)
        case MatchRate(_, _, t) =>
          val d = l(s"__d$i")
          (if (d == 0) None else Some(l(s"__m$i").toDouble / d.toDouble), t)
      }
      Row(r.name, r.column, metric.orNull, threshold,
        if (metric.exists(_ >= threshold)) 1 else 0)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rule",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("column",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("metric",
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("threshold",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("ok",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(out: _*), schema)
  }

  /**
   * Gate form: run [[report]], throw `IllegalStateException` naming
   * every failed rule (with measured vs required) if any `ok` = 0;
   * return the input unchanged otherwise — drop it into a pipeline
   * between stages.
   */
  def enforce(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val rep = report(df, rules).collect()
    val bad = rep.filter(_.getInt(4) == 0)
    if (bad.nonEmpty) {
      val detail = bad.map { r =>
        val m = if (r.isNullAt(2)) "undefined (empty input)" else f"${r.getDouble(2)}%.6f"
        s"${r.getString(0)}: measured $m, required >= ${r.getDouble(3)}"
      }.mkString("; ")
      throw new IllegalStateException(s"data-quality checks failed: $detail")
    }
    df
  }

  /**
   * Robust (median/MAD) outlier annotation — the data-quality screen
   * that mean/stddev z-scores can't be (one wild value drags the mean
   * toward itself; the median and the median-absolute-deviation have a
   * 50% breakdown point — Iglewicz & Hoaglin 1993, the standard
   * modified z-score):
   *
   *   robust_z = 0.6745 · (x − median) / MAD,  outlier ⇔ |z| > k
   *
   * Returns the input plus (`median`, `mad`, `robust_z`, `is_outlier`)
   * per row, optionally per `byCol` group. Degenerate groups (MAD 0 —
   * over half the values identical) flag exactly the values ≠ median
   * and leave `robust_z` NULL; NULL values are never outliers.
   *
   * Scale shape: MAD is definitionally two-pass (the deviation needs
   * the median first) — two value shuffles, each an EXACT percentile
   * aggregation, with the group-sized stats broadcast back both times.
   * Exact per-group percentiles hold the group's values in the
   * aggregation buffer; for groups past memory, screen with the KLL
   * sketch quantiles ([[Sketches.quantileSketches]]) instead.
   */
  def robustOutliers(
    df: DataFrame,
    valueCol: String,
    byCol: Option[String] = None,
    k: Double = 3.5
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    Cols.requireAbsent(df, "median", "mad", "robust_z", "is_outlier")
    val v = col(valueCol).cast("double")
    val g = byCol.map(col).getOrElse(lit(0))
    val med = df.groupBy(g.as("__g"))
      .agg(percentile(v, lit(0.5)).as("median"))
    val withMed = df.withColumn("__g", g).join(broadcast(med), "__g")
    val mad = withMed.groupBy("__g")
      .agg(percentile(abs(v - col("median")), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), "__g")
      .withColumn("robust_z",
        when(col("mad") > 0, lit(0.6745) * (v - col("median")) / col("mad")))
      .withColumn("is_outlier", coalesce(
        when(v.isNull, lit(false))
          .when(col("mad") === 0, v =!= col("median"))
          .otherwise(abs(col("robust_z")) > k),
        lit(false)))
      .drop("__g")
  }
}
