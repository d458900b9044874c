package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Option("en"), Option(10.0)),
    (2L, Option("en"), Option(20.0)),
    (3L, Option("de"), Option(30.0)),
    (4L, Option.empty[String], Option(40.0)),
    (5L, Option("fr"), Option.empty[Double])
  ).toDF("id", "lang", "score")

  private def metrics(colName: String): Map[String, Option[Double]] =
    Profile.profile(fixture).filter(col("column") === colName)
      .select("metric", "value").as[(String, Option[Double])]
      .collect().toMap

  test("exact metrics: counts, null rates, min/max/mean") {
    val score = metrics("score")
    assert(score("n_rows") === Some(5.0))
    assert(score("n_null") === Some(1.0))
    assert(score("null_rate") === Some(0.2))
    assert(score("min") === Some(10.0))
    assert(score("max") === Some(40.0))
    assert(score("mean") === Some(25.0))
    // small-cardinality HLL is exact
    assert(math.abs(score("distinct_est").get - 4.0) < 0.2)
    val lang = metrics("lang")
    assert(lang("null_rate") === Some(0.2))
    assert(math.abs(lang("distinct_est").get - 3.0) < 0.2)
    // non-numeric column: numeric metrics are NULL, not junk
    assert(lang("min") === None && lang("mean") === None && lang("p50") === None)
  }

  test("quantiles: exact under capacity, one aggregation job") {
    val big = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val m = Profile.profile(big, Seq("v"))
      .select("metric", "value").as[(String, Option[Double])].collect().toMap
    assert(math.abs(m("p50").get - 500.0) <= 10.0)
    assert(math.abs(m("p25").get - 250.0) <= 10.0)
    assert(math.abs(m("p75").get - 750.0) <= 10.0)
    // selected-columns arm + guard
    intercept[IllegalArgumentException] { Profile.profile(big, Seq("absent")) }
  }

  test("empty input: counts zero, rates undefined (null)") {
    val m = Profile.profile(fixture.filter(col("id") < 0), Seq("score"))
      .select("metric", "value").as[(String, Option[Double])].collect().toMap
    assert(m("n_rows") === Some(0.0))
    assert(m("null_rate") === None)
    assert(m("min") === None && m("p50") === None)
  }

  test("drift: schema changes, row count, null-rate and mean deltas") {
    import spark.implicits._
    val old = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 20L), (3L, Some("c"), 30L),
      (4L, Some("d"), 40L)).toDF("id", "tag", "v")
    val neu = Seq(
      (1L, Option.empty[String], 1.5, true), (2L, Some("b"), 2.5, false))
      .toDF("id", "tag", "v", "flag")
    val rows = Profile.drift(old, neu)
      .as[(String, String, Option[String], Option[String],
        Option[Double], Option[Double], Option[Double])].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(rows(("column_added", "flag"))._4 === Some("boolean"))
    assert(rows(("type_changed", "v"))._3 === Some("bigint"))
    assert(rows(("type_changed", "v"))._4 === Some("double"))
    assert(!rows.contains(("column_removed", "tag")))
    assert(rows(("row_count", "*"))._5 === Some(4.0))
    assert(rows(("row_count", "*"))._7 === Some(-2.0))
    assert(rows(("null_rate", "tag"))._6 === Some(0.5))
    assert(rows(("null_rate", "tag"))._7 === Some(0.5))
    assert(rows(("mean", "v"))._5 === Some(25.0))
    assert(rows(("mean", "v"))._6 === Some(2.0))
    assert(rows(("mean", "tag"))._5 === None) // uncastable: undefined
    assert(rows(("mean", "tag"))._7 === None)
  }

  test("drift: removed columns and empty sides stay defined") {
    import spark.implicits._
    val old = Seq((1L, "x")).toDF("id", "gone")
    val neu = Seq(2L).toDF("id").filter(col("id") < 0)
    val rows = Profile.drift(old, neu)
      .as[(String, String, Option[String], Option[String],
        Option[Double], Option[Double], Option[Double])].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(rows(("column_removed", "gone"))._3 === Some("string"))
    assert(rows(("row_count", "*"))._6 === Some(0.0))
    assert(rows(("null_rate", "id"))._6 === None) // empty side: undefined
  }

  test("correlations: exact hand-derived co-moments, pairwise-complete nulls") {
    import spark.implicits._
    // y = 2x exactly (corr 1); z anti-correlates with x except where NULL
    val df = Seq[(java.lang.Double, java.lang.Double, java.lang.Double)](
      (1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0), (4.0, 8.0, null))
      .toDF("x", "y", "z")
    val got = Profile.correlations(df, Seq("x", "y", "z"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // x over 4 rows: mean 2.5, covar(x, 2x) = 2*var(x) = 2*(5/3)
    val (nXy, covXy, corXy) = got(("x", "y"))
    assert(nXy === 4L)
    assert(math.abs(covXy - 10.0 / 3.0) < 1e-12)
    assert(math.abs(corXy - 1.0) < 1e-12)
    // (x, z) pairwise-complete: rows 1..3 only — covar = -1, corr = -1
    val (nXz, covXz, corXz) = got(("x", "z"))
    assert(nXz === 3L)
    assert(math.abs(covXz - (-1.0)) < 1e-12)
    assert(math.abs(corXz - (-1.0)) < 1e-12)
  }

  test("correlations: constant column yields NULL corr, non-null covar 0") {
    import spark.implicits._
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "c")
    val r = Profile.correlations(df, Seq("x", "c")).head()
    assert(r.getLong(2) === 3L)
    assert(r.getDouble(3) === 0.0)
    assert(r.isNullAt(4), "corr with a constant column is 0/0 -> NULL")
    intercept[IllegalArgumentException] {
      Profile.correlations(df, Seq("x"))
    }
    intercept[IllegalArgumentException] {
      Profile.correlations(df, Seq("x", "x"))
    }
  }

  test("correlations: one aggregate however many pairs (single-pass plan)") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 3.0, 4.0)).toDF("a", "b", "c", "d")
    val plan = Profile.correlations(df, Seq("a", "b", "c", "d"))
      .queryExecution.executedPlan.toString
    // exactly one partial+final HashAggregate pair -> 2 occurrences
    assert("HashAggregate".r.findAllIn(plan).size <= 2,
      s"expected one aggregation pass:\n$plan")
  }
}
