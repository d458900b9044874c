package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Cdc, Checks, Privacy}

/**
 * Correctness gates for the governance operators (SURVEY.md §2 rows
 * 119 and 121): k-anonymity / l-diversity risk reports and CDC
 * changelog application. All exact relational math — the oracles
 * re-derive every row (the CDC oracle definitionally, via CASE
 * priority over the formula-built changelog, a different spelling
 * from the engine's union + last-writer-wins window).
 */
object PrivacyGates {

  private def cust(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/customer.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2 row 119a — per-class k-anonymity over (nation, segment)
    "q_k_anonymity" -> { (s, dir) =>
      Privacy.kAnonymity(cust(s, dir), Seq("c_nationkey", "c_mktsegment"), k = 10)
    },
    // §2 row 119b — l-diversity with a banded sensitive attribute
    "q_l_diversity" -> { (s, dir) =>
      Privacy.lDiversity(
        cust(s, dir).withColumn("bal_band", floor(col("c_acctbal") / 1000)),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 3)
    },
    // §2 row 132 — robust median/MAD outliers per segment: planted
    // 1e8-scale extremes must flag, the uniform bulk must not; the
    // oracle re-derives medians, MADs, and every modified z-score
    "q_robust_outliers" -> { (s, dir) =>
      import s.implicits._
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      val planted = segs.zipWithIndex
        .map { case (g, i) => (9000001L + i, g, 1.0e8 + i) }
        .toDF("c_custkey", "c_mktsegment", "c_acctbal")
      val base = cust(s, dir).select("c_custkey", "c_mktsegment", "c_acctbal")
        .unionByName(planted)
      Checks.robustOutliers(base, "c_acctbal", byCol = Some("c_mktsegment"))
        .filter(col("is_outlier"))
        .select(col("c_custkey"), col("c_mktsegment"),
          round(col("median"), 6).as("median"),
          round(col("mad"), 6).as("mad"),
          round(col("robust_z"), 6).as("robust_z"))
    },
    // §2 row 121 — CDC changelog apply: updates (7), re-updates (21),
    // deletes (13), inserts (9000001..5), all formula-derived so the
    // oracle re-derives the merged table definitionally
    "q_cdc_apply" -> { (s, dir) =>
      val (snap, u1, u2, del, ins) = cdcParts(s, dir)
      Cdc.applyChangelog(snap,
        u1.unionByName(u2).unionByName(del).unionByName(ins), Seq("c_custkey"))
    },
    // §2 row 131 — the STREAMING materialized table: the same changelog
    // arrives as THREE out-of-order micro-batches (the seq-2 re-updates
    // land AFTER the seq-3 deletes — the tombstones must reject them),
    // folded by materializedSink into the versioned snapshot; the live
    // readCurrent must equal the one-shot apply, so the SAME oracle
    "q_cdc_stream" -> { (s, dir) =>
      val (snap, u1, u2, del, ins) = cdcParts(s, dir)
      val out = java.nio.file.Files.createTempDirectory("graft-cdcmat-gate").toString
      val sink = Cdc.materializedSink(out, Seq("c_custkey"))
      val seed = snap.withColumn("seq", lit(0L)).withColumn("op", lit("I"))
      sink(seed, 0)
      sink(u1.unionByName(del), 1)
      sink(u2.unionByName(ins), 2)
      Cdc.readCurrent(s, out)
    }
  )

  /** The shared formula-built CDC fixture: snapshot + changelog parts
    * (seq-1 updates at keys %7, seq-2 re-updates at %21, seq-3 deletes
    * at %13, seq-1 inserts at 9000001..5). */
  private def cdcParts(s: SparkSession, dir: String) = {
    import s.implicits._
    val snap = cust(s, dir).select("c_custkey", "c_name", "c_acctbal")
    val key = col("c_custkey")
    val u1 = snap.filter(key % 7 === 0).select(key,
      concat(lit("upd_"), key.cast("string")).as("c_name"),
      (key * 1.5).as("c_acctbal"), lit(1L).as("seq"), lit("U").as("op"))
    val u2 = snap.filter(key % 21 === 0).select(key,
      concat(lit("upd2_"), key.cast("string")).as("c_name"),
      (key * 2.5).as("c_acctbal"), lit(2L).as("seq"), lit("U").as("op"))
    val del = snap.filter(key % 13 === 0).select(key,
      lit(null).cast("string").as("c_name"),
      lit(null).cast("double").as("c_acctbal"),
      lit(3L).as("seq"), lit("D").as("op"))
    val ins = (1 to 5).map(i => (9000000L + i, s"new_$i", i * 0.5))
      .toDF("c_custkey", "c_name", "c_acctbal")
      .withColumn("seq", lit(1L)).withColumn("op", lit("I"))
    (snap, u1, u2, del, ins)
  }

  val oracleSql: Map[String, String] = Map(
    "q_robust_outliers" ->
      """WITH base AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |  UNION ALL
        |  SELECT 9000001 + i, seg, 1e8 + i FROM (VALUES
        |    (0, 'AUTOMOBILE'), (1, 'BUILDING'), (2, 'FURNITURE'),
        |    (3, 'HOUSEHOLD'), (4, 'MACHINERY')) v(i, seg)),
        |m AS (SELECT c_mktsegment, median(c_acctbal) AS med
        |      FROM base GROUP BY 1),
        |d AS (SELECT b.*, m.med FROM base b JOIN m USING (c_mktsegment)),
        |a AS (SELECT c_mktsegment, median(abs(c_acctbal - med)) AS mad
        |      FROM d GROUP BY 1),
        |j AS (
        |  SELECT d.c_custkey, d.c_mktsegment, d.med, a.mad,
        |         0.6745 * (d.c_acctbal - d.med) / a.mad AS z
        |  FROM d JOIN a USING (c_mktsegment))
        |SELECT c_custkey, c_mktsegment, round(med, 6) AS median,
        |       round(mad, 6) AS mad, round(z, 6) AS robust_z
        |FROM j WHERE abs(z) > 3.5""".stripMargin,
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |       count(*) AS class_size,
        |       count(*) < 10 AS at_risk
        |FROM customer GROUP BY 1, 2""".stripMargin,
    "q_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment,
        |       count(*) AS class_size,
        |       count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS diversity,
        |       count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= 3 AS diverse
        |FROM customer GROUP BY 1, 2""".stripMargin,
    "q_cdc_apply" ->
      """SELECT c_custkey,
        |       CASE WHEN c_custkey % 21 = 0 THEN 'upd2_' || c_custkey
        |            WHEN c_custkey % 7 = 0 THEN 'upd_' || c_custkey
        |            ELSE c_name END AS c_name,
        |       CASE WHEN c_custkey % 21 = 0 THEN c_custkey * 2.5
        |            WHEN c_custkey % 7 = 0 THEN c_custkey * 1.5
        |            ELSE c_acctbal END AS c_acctbal
        |FROM customer WHERE c_custkey % 13 <> 0
        |UNION ALL
        |SELECT 9000000 + i, 'new_' || i, i * 0.5 FROM range(1, 6) t(i)""".stripMargin,
    // identical expectation: the stream of out-of-order batches must
    // land exactly where the one-shot apply does
    "q_cdc_stream" ->
      """SELECT c_custkey,
        |       CASE WHEN c_custkey % 21 = 0 THEN 'upd2_' || c_custkey
        |            WHEN c_custkey % 7 = 0 THEN 'upd_' || c_custkey
        |            ELSE c_name END AS c_name,
        |       CASE WHEN c_custkey % 21 = 0 THEN c_custkey * 2.5
        |            WHEN c_custkey % 7 = 0 THEN c_custkey * 1.5
        |            ELSE c_acctbal END AS c_acctbal
        |FROM customer WHERE c_custkey % 13 <> 0
        |UNION ALL
        |SELECT 9000000 + i, 'new_' || i, i * 0.5 FROM range(1, 6) t(i)""".stripMargin
  )
}
