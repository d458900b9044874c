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
}
