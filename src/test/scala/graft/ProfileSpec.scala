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
}
