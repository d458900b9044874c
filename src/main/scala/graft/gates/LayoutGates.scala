package graft.gates

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Layout, SkipIndex}

/**
 * Correctness gates for the data-layout operators (SURVEY.md §2 rows
 * 115-116): z-order clustering values and the per-file skipping index.
 *
 * q_zorder is value-exact: the scaling is IEEE double arithmetic with
 * the identical op order on both engines ((v − min) / (max − min) ·
 * (2^bits − 1) + 0.5, floor), and the interleave is integer math —
 * DuckDB re-derives every z-value bit-for-bit (the engine uses
 * shift/mask, the oracle `//`/`%`/`*` — equal on the non-negative
 * scaled levels by construction).
 *
 * q_skip_index is the warc-roundtrip pattern: the gate materializes a
 * range-clustered copy of `documents` in a temp dir, builds the index,
 * and reads through the pruned path; the oracle re-derives the expected
 * rows from the ORIGINAL table (pruning must never change results —
 * bloom false positives are removed by the residual predicate, false
 * negatives don't exist). Pruning effectiveness is asserted in-gate
 * (point probe on the clustered key touches exactly one file) and in
 * SkipIndexSpec.
 */
object LayoutGates {

  private val ZBits = 8

  /** The oracle's interleave arm for 2 columns at [[ZBits]] bits:
    * Σ_b ((sp // 2^b) % 2)·2^(2b) + ((ss // 2^b) % 2)·2^(2b+1). */
  private val InterleaveSql: String =
    (0 until ZBits).flatMap { b =>
      Seq(
        s"((sp // ${1L << b}) % 2) * ${1L << (2 * b)}",
        s"((ss // ${1L << b}) % 2) * ${1L << (2 * b + 1)}")
    }.mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2 row 115 — z-order values over (l_partkey, l_suppkey) at 8 bits
    "q_zorder" -> { (s, dir) =>
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      Layout.withZorderValue(li, Seq("l_partkey", "l_suppkey"), bits = ZBits)
        .select("l_orderkey", "l_linenumber", "z_value")
    },
    // §2 row 116 — skipping index over a range-clustered copy of
    // documents: point probes through the pruned read path (absent key
    // 987654 must read zero files and contribute zero rows)
    "q_skip_index" -> { (s, dir) =>
      val out = Files.createTempDirectory("graft-skipidx-gate").toString
      s.read.parquet(s"$dir/documents.parquet")
        .repartitionByRange(8, col("doc_id"))
        .write.mode("overwrite").parquet(out)
      // the 8-row index is metadata: localize it (no cached blocks to
      // leak — the gate is reused 7× across asserts and probes)
      val built = SkipIndex.build(s, out, Seq("doc_id"))
      val index = s.createDataFrame(
        java.util.Arrays.asList(built.collect(): _*), built.schema)
      // the clustered key must actually prune: one file per point probe
      assert(SkipIndex.prunedFiles(index, "doc_id", 7L).size == 1,
        "range-clustered point probe did not prune to one file")
      assert(SkipIndex.prunedFiles(index, "doc_id", 987654L).isEmpty,
        "absent key must prune every file")
      Seq(7L, 37L, 137L, 444L, 987654L).map { p =>
        SkipIndex.readPruned(s, out, index, "doc_id", p)
          .select(lit(p).as("probe"), col("doc_id"), col("lang"), col("n_chars"))
      }.reduce(_.unionByName(_))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_zorder" ->
      s"""WITH b AS (
         |  SELECT min(l_partkey)::DOUBLE pmn, max(l_partkey)::DOUBLE pmx,
         |         min(l_suppkey)::DOUBLE smn, max(l_suppkey)::DOUBLE smx
         |  FROM lineitem),
         |s AS (
         |  SELECT l_orderkey, l_linenumber,
         |         CASE WHEN pmx = pmn THEN 0
         |              ELSE CAST(floor((l_partkey - pmn) / (pmx - pmn) * 255.0 + 0.5) AS BIGINT)
         |         END AS sp,
         |         CASE WHEN smx = smn THEN 0
         |              ELSE CAST(floor((l_suppkey - smn) / (smx - smn) * 255.0 + 0.5) AS BIGINT)
         |         END AS ss
         |  FROM lineitem, b)
         |SELECT l_orderkey, l_linenumber,
         |       CAST($InterleaveSql AS BIGINT) AS z_value
         |FROM s""".stripMargin,
    "q_skip_index" ->
      """SELECT doc_id AS probe, doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (7, 37, 137, 444, 987654)""".stripMargin
  )
}
