package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * One-scan corpus profiler (the Deequ-profiler / pandas-profiling
 * niche at corpus scale): for every requested column, null rates,
 * HLL approximate distincts, and — where the values cast to double —
 * min/max/mean and KLL quantiles, ALL computed in ONE aggregation pass
 * over the corpus ([[Checks]]' one-scan argument: however many columns,
 * the data moves once through a single partial-aggregated single-row
 * shuffle). The report is metadata-sized (a few rows per column) and
 * returns as a driver-local relation.
 *
 * Exactness contract: `n_rows`/`n_null`/`null_rate`/`min`/`max`/`mean`
 * are exact; `distinct_est` is the HLL estimate (~1.6% RSE at the
 * default precision) and `p25`/`p50`/`p75` are KLL rank-band values
 * (~1.65% rank error; exact below the sketch capacity) — the same
 * band contracts [[Sketches]] documents. Uncastable columns carry NULL
 * numeric metrics (a junk-polluted numeric column is [[Checks]]'
 * ValueRange job, not the profiler's).
 */
object Profile {

  private val QuantileMetrics = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75")

  /** Profile `columns` (default: every column) in one corpus scan.
    * Returns `(column, metric, value)` — long format, driver-local,
    * metric ∈ n_rows | n_null | null_rate | distinct_est | min | max |
    * mean | p25 | p50 | p75. */
  def profile(df: DataFrame, columns: Seq[String] = Seq.empty): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "no columns to profile")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val exprs = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Column]
    exprs += count(lit(1)).as("__n")
    cols.zipWithIndex.foreach { case (c, i) =>
      val d = expr(s"try_cast(`$c` AS DOUBLE)")
      exprs += count(col(c)).as(s"__nn$i")
      exprs += hll_sketch_estimate(hll_sketch_agg(col(c).cast("string")))
        .cast("double").as(s"__dist$i")
      exprs += min(d).as(s"__min$i")
      exprs += max(d).as(s"__max$i")
      exprs += avg(d).as(s"__mean$i")
      exprs += graft.functions.KllBuildAgg(d, 200).as(s"__kll$i")
    }
    val row = df.agg(exprs.head, exprs.tail.toSeq: _*).collect().head
    val n = row.getAs[Long]("__n")
    def dOpt(name: String): Any =
      if (row.isNullAt(row.fieldIndex(name))) null else row.getAs[Double](name)
    val out = new java.util.ArrayList[Row]()
    cols.zipWithIndex.foreach { case (c, i) =>
      val nn = row.getAs[Long](s"__nn$i")
      out.add(Row(c, "n_rows", n.toDouble))
      out.add(Row(c, "n_null", (n - nn).toDouble))
      out.add(Row(c, "null_rate",
        if (n == 0) null else (n - nn).toDouble / n.toDouble))
      out.add(Row(c, "distinct_est", dOpt(s"__dist$i")))
      out.add(Row(c, "min", dOpt(s"__min$i")))
      out.add(Row(c, "max", dOpt(s"__max$i")))
      out.add(Row(c, "mean", dOpt(s"__mean$i")))
      val kllBytes =
        if (row.isNullAt(row.fieldIndex(s"__kll$i"))) null
        else row.getAs[Array[Byte]](s"__kll$i")
      QuantileMetrics.foreach { case (q, name) =>
        val v: Any =
          if (kllBytes == null) null
          else {
            val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
              org.apache.datasketches.memory.Memory.wrap(kllBytes))
            if (sk.isEmpty) null else sk.getQuantile(q)
          }
        out.add(Row(c, name, v))
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("column",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("metric",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    df.sparkSession.createDataFrame(out, schema)
  }

  /**
   * Snapshot drift report — the schema-contract + distribution-shift
   * check between two corpus versions (a refresh vs. its predecessor,
   * a new drop vs. the standing corpus): schema changes from the
   * catalogs (NO job), plus exact metric drift (row count; per-common-
   * column null rate and mean) from ONE aggregation pass per side.
   * Metadata-sized, driver-local (the [[profile]] conventions).
   *
   * Rows: (`kind`, `column`, `old_type`, `new_type`, `old_val`,
   * `new_val`, `delta`) with kind ∈ column_added | column_removed |
   * type_changed | row_count | null_rate | mean; type columns carry
   * Catalyst simpleStrings for schema kinds and NULL otherwise;
   * numeric kinds carry old/new/delta (delta = new − old, NULL when a
   * side is undefined, e.g. an uncastable mean). Wire it into [[Checks]]
   * as a fail-fast by thresholding `delta` downstream.
   */
  /**
   * Pairwise Pearson correlation / sample covariance of numeric
   * columns in ONE aggregation pass — the feature-redundancy and
   * drift-debug companion to [[profile]] (k columns = k·(k−1)/2
   * pairs, but the DATA still moves exactly once: every co-moment is
   * a partial-aggregable expression in the same single-row agg, so
   * the corpus-of-record cost is one scan + one 1-row shuffle however
   * many pairs are requested; a per-pair loop would scan k²/2 times).
   *
   * Per unordered pair (column order as given): `n_pairs` counts rows
   * where BOTH cast to non-null double (pairwise-complete semantics —
   * exactly what the co-moments aggregate over), `covar` is sample
   * covariance, `corr` Pearson correlation (NULL when either side is
   * constant — 0/0, via try_divide; Spark's own `corr` agg THROWS
   * DIVIDE_BY_ZERO there under ANSI mode, so corr derives from the
   * covariance and PAIR-COMPLETE stddevs — each side masked to rows
   * where the other is present, so the normalization covers exactly
   * the rows the covariance saw and the value equals textbook
   * pairwise Pearson, which is also what DuckDB's corr computes).
   * Values cast via try_cast (uncastable → NULL → excluded), the
   * [[profile]] convention. Output is pair-count-sized, in-plan
   * (explode of the agg row), no driver collect.
   */
  def correlations(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.length >= 2, s"need >= 2 columns: $columns")
    columns.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    require(columns.distinct.length == columns.length,
      s"duplicate columns: $columns")
    val pairs = for {
      i <- columns.indices
      j <- (i + 1) until columns.length
    } yield (i, j)
    def d(c: String) = expr(s"try_cast(`$c` AS DOUBLE)")
    val aggs = pairs.flatMap { case (i, j) =>
      val (ca, cb) = (d(columns(i)), d(columns(j)))
      Seq(
        count(when(ca.isNotNull && cb.isNotNull, 1)).as(s"__n_${i}_$j"),
        covar_samp(ca, cb).as(s"__cov_${i}_$j"),
        // pair-complete stddevs: each side restricted to rows where the
        // OTHER side is present, so corr normalizes over exactly the
        // rows the covariance saw
        stddev_samp(when(cb.isNotNull, ca)).as(s"__sa_${i}_$j"),
        stddev_samp(when(ca.isNotNull, cb)).as(s"__sb_${i}_$j"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs.map { case (i, j) =>
        struct(
          lit(columns(i)).as("col_a"),
          lit(columns(j)).as("col_b"),
          col(s"__n_${i}_$j").as("n_pairs"),
          col(s"__cov_${i}_$j").as("covar"),
          try_divide(col(s"__cov_${i}_$j"),
            col(s"__sa_${i}_$j") * col(s"__sb_${i}_$j")).as("corr"))
      }: _*)).as("p"))
      .select("p.*")
  }

  def drift(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val oldTypes = oldDf.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val newTypes = newDf.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val out = new java.util.ArrayList[Row]()
    (newTypes.keySet -- oldTypes.keySet).toSeq.sorted.foreach { c =>
      out.add(Row("column_added", c, null, newTypes(c), null, null, null))
    }
    (oldTypes.keySet -- newTypes.keySet).toSeq.sorted.foreach { c =>
      out.add(Row("column_removed", c, oldTypes(c), null, null, null, null))
    }
    val common = (oldTypes.keySet & newTypes.keySet).toSeq.sorted
    common.filter(c => oldTypes(c) != newTypes(c)).foreach { c =>
      out.add(Row("type_changed", c, oldTypes(c), newTypes(c), null, null, null))
    }

    def sideRow(df: DataFrame): Row = {
      val exprs = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Column]
      exprs += count(lit(1)).as("__n")
      common.zipWithIndex.foreach { case (c, i) =>
        exprs += count(col(c)).as(s"__nn$i")
        exprs += avg(expr(s"try_cast(`$c` AS DOUBLE)")).as(s"__mean$i")
      }
      df.agg(exprs.head, exprs.tail.toSeq: _*).collect().head
    }
    val o = sideRow(oldDf)
    val nw = sideRow(newDf)
    val nOld = o.getAs[Long]("__n")
    val nNew = nw.getAs[Long]("__n")
    def delta(a: Any, b: Any): Any = (a, b) match {
      case (x: java.lang.Double, y: java.lang.Double) => y - x
      case _ => null
    }
    out.add(Row("row_count", "*", null, null, nOld.toDouble, nNew.toDouble,
      nNew.toDouble - nOld.toDouble))
    common.zipWithIndex.foreach { case (c, i) =>
      val nrOld: Any =
        if (nOld == 0) null
        else Double.box((nOld - o.getAs[Long](s"__nn$i")).toDouble / nOld)
      val nrNew: Any =
        if (nNew == 0) null
        else Double.box((nNew - nw.getAs[Long](s"__nn$i")).toDouble / nNew)
      out.add(Row("null_rate", c, null, null, nrOld, nrNew, delta(nrOld, nrNew)))
      val mOld: Any = if (o.isNullAt(o.fieldIndex(s"__mean$i"))) null
        else Double.box(o.getAs[Double](s"__mean$i"))
      val mNew: Any = if (nw.isNullAt(nw.fieldIndex(s"__mean$i"))) null
        else Double.box(nw.getAs[Double](s"__mean$i"))
      out.add(Row("mean", c, null, null, mOld, mNew, delta(mOld, mNew)))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("column",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("old_type",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("new_type",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("old_val",
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("new_val",
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("delta",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    oldDf.sparkSession.createDataFrame(out, schema)
  }
}
