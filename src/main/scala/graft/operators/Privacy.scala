package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Re-identification risk analytics over quasi-identifier columns —
 * k-anonymity (Sweeney 2002) and l-diversity (Machanavalli et al.
 * 2007), the standard published privacy models — plus the suppression
 * arm that enforces them. Sits next to the PII scrub
 * ([[TextAnalysis.scrubPii]]): scrubbing removes direct identifiers,
 * these measure whether the REMAINING attribute combinations still
 * single people out.
 *
 * Scale shape: every report is ONE map-side-combined aggregation on
 * the quasi-identifier tuple (classes ≪ rows by construction — that's
 * what makes them classes); suppression joins the class sizes back on
 * the same key (same shuffle key, AQE broadcasts the class table when
 * small). NULL quasi-values form their own class (SQL GROUP BY
 * semantics) — a NULL combination is still a distinguishable
 * fingerprint, so it must be counted, not dropped.
 */
object Privacy {

  /**
   * Per-equivalence-class k-anonymity report: one row per distinct
   * quasi-identifier combination with its `class_size` and an
   * `at_risk` flag (`class_size < k` — fewer than k records share the
   * combination, so each is re-identifiable to better than 1-in-k).
   */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** One-row corpus summary of [[kAnonymity]]: row/class counts, their
    * at-risk parts, and the achieved k (smallest class). */
  def kAnonymitySummary(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    kAnonymity(df, quasiCols, k).agg(
      sum(col("class_size")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      coalesce(sum(when(col("at_risk"), col("class_size"))), lit(0L))
        .as("n_rows_at_risk"),
      coalesce(sum(when(col("at_risk"), lit(1L))), lit(0L))
        .as("n_classes_at_risk"),
      min(col("class_size")).as("achieved_k"))

  /**
   * Per-class l-diversity report: distinct sensitive values per
   * quasi-identifier class (`diversity`) and the `diverse` flag
   * (`diversity >= l` — k-anonymous classes whose sensitive value is
   * constant still leak it; this catches that). NULL sensitive values
   * don't count as a distinct value.
   */
  def lDiversity(
    df: DataFrame,
    quasiCols: Seq[String],
    sensitiveCol: String,
    l: Long
  ): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1: $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("diversity"))
      .withColumn("diverse", col("diversity") >= l)
  }

  /**
   * Suppression enforcement: keep only rows whose quasi-identifier
   * class has at least `k` members — the generalization-free way to
   * make a release k-anonymous (rows are dropped, never blurred).
   */
  def suppressSmallClasses(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    // null-safe (<=>) semi join: a NULL quasi-value class that reaches k
    // members is releasable like any other — plain equality would drop it
    val classes = kAnonymity(df, quasiCols, k)
      .filter(!col("at_risk"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.join(classes, cond, "left_semi")
  }
}
