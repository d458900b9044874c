package graft

import org.apache.spark.sql.functions._
import graft.operators.Privacy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    // (id, zip, age_band, disease)
    (1L, "02139", "30-40", "flu"),
    (2L, "02139", "30-40", "flu"),
    (3L, "02139", "30-40", "cold"),
    (4L, "94110", "20-30", "flu"),
    (5L, "94110", "20-30", "flu"),
    (6L, "10001", "50-60", "asthma"), // singleton class
    (7L, null.asInstanceOf[String], "50-60", "flu"),
    (8L, null.asInstanceOf[String], "50-60", "cold")
  ).toDF("id", "zip", "age", "disease")

  test("kAnonymity classes, flags, and summary are exact") {
    val rep = Privacy.kAnonymity(people, Seq("zip", "age"), k = 2)
      .as[(String, String, Long, Boolean)].collect()
      .map(r => (Option(r._1), r._2) -> (r._3, r._4)).toMap
    assert(rep((Some("02139"), "30-40")) === ((3L, false)))
    assert(rep((Some("94110"), "20-30")) === ((2L, false)))
    assert(rep((Some("10001"), "50-60")) === ((1L, true)))
    assert(rep((None, "50-60")) === ((2L, false))) // NULL zip is a class
    val s = Privacy.kAnonymitySummary(people, Seq("zip", "age"), k = 2)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(s === ((8L, 4L, 1L, 1L, 1L)))
  }

  test("lDiversity counts distinct sensitive values per class") {
    val rep = Privacy.lDiversity(people, Seq("zip", "age"), "disease", l = 2)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (Option(r._1), r._2) -> (r._4, r._5)).toMap
    assert(rep((Some("02139"), "30-40")) === ((2L, true)))
    assert(rep((Some("94110"), "20-30")) === ((1L, false))) // all flu: leaks
    assert(rep((None, "50-60")) === ((2L, true)))
  }

  test("suppressSmallClasses drops only at-risk rows, keeps NULL classes") {
    val kept = Privacy.suppressSmallClasses(people, Seq("zip", "age"), k = 2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L)) // only the singleton 6 goes
  }

  test("guards") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymity(people, Seq.empty, k = 2)
    }
    intercept[IllegalArgumentException] {
      Privacy.lDiversity(people, Seq("zip"), "disease", l = 0)
    }
  }
}
