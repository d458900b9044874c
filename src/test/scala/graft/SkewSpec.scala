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

  test("saltedJoin tolerates hash-unsupported (map) columns on the left") {
    // xxhash64 rejects MapType; the salt must hash the remaining columns
    val left = spark.range(100).select(
      (col("id") % 5).as("k"),
      map(lit("a"), col("id")).as("m"))
    val right = (0L to 4L).map(k => (k, s"r$k")).toDF("k", "payload")
    val out = Skew.saltedJoin(left, right, "k", saltN = 4)
    assert(out.count() == 100)
  }

  test("salting spreads a zipf-hot key across tasks (max task ~ hot/saltN)") {
    // the equality gates prove salting is CORRECT; this proves it HELPS:
    // one key carries 50% of rows, and the salted shuffle's largest task
    // must shrink to roughly hot/saltN where the plain join funnels the
    // whole hot key through one task
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "false") // no coalescing: raw task sizes
      conf.set("spark.sql.shuffle.partitions", "16")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ: observable shuffle
      val n = 20000
      val hot = n / 2
      val left = spark.range(n).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id") % 64 + 1).as("k"),
        col("id").as("v"))
      val right = (0L to 64L).map(k => (k, s"r$k")).toDF("k", "payload")
      def maxPart(df: org.apache.spark.sql.DataFrame): Int =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().max
      val plainMax = maxPart(left.join(right, Seq("k")))
      val saltedMax = maxPart(Skew.saltedJoin(left, right, "k", saltN = 8))
      assert(plainMax >= hot, s"plain join should funnel the hot key, got $plainMax")
      assert(saltedMax <= hot * 2 / 8 + (n - hot) / 4,
        s"salted max task $saltedMax is not ~hot/saltN (plain was $plainMax)")
      assert(saltedMax * 2 < plainMax,
        s"expected >=2x spread: salted $saltedMax vs plain $plainMax")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
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
