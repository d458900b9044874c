package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // 90% of left rows share one hot key
    val left = spark.range(10000).select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("v"))
    val right = (0L to 20L).map(k => (k, s"r$k")).toDF("k", "payload")

    val plain = left.join(right, Seq("k"))
      .select("k", "v", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(left, right, "k", saltN = 8)
      .select("k", "v", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedJoin left join null-extends unmatched keys exactly once") {
    val left = spark.range(1000).select(
      (col("id") % 30).as("k"), col("id").as("v"))
    val right = (0L to 19L).map(k => (k, s"r$k")).toDF("k", "payload")

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2))
    val plain = left.join(right, Seq("k"), "left")
      .select("k", "v", "payload").collect().map(key).sortBy(_.toString).toSeq
    val salted = Skew.saltedJoin(left, right, "k", saltN = 8, joinType = "left")
      .select("k", "v", "payload").collect().map(key).sortBy(_.toString).toSeq
    assert(salted == plain && plain.exists(_._3 == null))
  }

  test("saltedJoin rejects right/full outer joins (they would multiply rows)") {
    val df = Seq((1L, "a")).toDF("k", "v")
    assertThrows[IllegalArgumentException] {
      Skew.saltedJoin(df, df.select(col("k"), col("v").as("w")), "k", joinType = "right")
    }
    assertThrows[IllegalArgumentException] {
      Skew.saltedJoin(df, df.select(col("k"), col("v").as("w")), "k", joinType = "full_outer")
    }
  }

  test("saltedAgg matches direct aggregation (count + sum over a hot key)") {
    val df = spark.range(20000).select(
      when(col("id") % 5 =!= 0, lit(3L)).otherwise(col("id") % 100).as("k"),
      lit(1.0).as("x"))
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("x").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedAgg(df, "k", saltN = 8)(
        partial = Seq(count(lit(1)).as("n"), sum(col("x")).as("s")),
        combine = Seq(sum(col("n")).as("n"), sum(col("s")).as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }
}
