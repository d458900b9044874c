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
}
