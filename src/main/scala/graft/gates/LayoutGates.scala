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

  /** The oracle's interleave arm for 2 columns (`sp`, `ss`) at `bits`:
    * Σ_b ((sp // 2^b) % 2)·2^(2b) + ((ss // 2^b) % 2)·2^(2b+1). */
  private def interleaveSql(bits: Int): String =
    (0 until bits).flatMap { b =>
      Seq(
        s"((sp // ${1L << b}) % 2) * ${1L << (2 * b)}",
        s"((ss // ${1L << b}) % 2) * ${1L << (2 * b + 1)}")
    }.mkString(" + ")

  private val InterleaveSql: String = interleaveSql(ZBits)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2 row 115 — z-order values over (l_partkey, l_suppkey) at 8 bits
    "q_zorder" -> { (s, dir) =>
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      Layout.withZorderValue(li, Seq("l_partkey", "l_suppkey"), bits = ZBits)
        .select("l_orderkey", "l_linenumber", "z_value")
    },
    // §2 row 140 — RANK-scaled z-order values on a skewed fixture: a
    // planted 10^9 outlier that would collapse the min-max arm's y
    // dimension to one level. 97 rows with 8 levels put every exact
    // quantile at integer rank 12k — both engines return exact data
    // values as boundaries, no interpolation drift (the oracle
    // re-derives levels as counts of boundaries strictly below)
    "q_zorder_rank" -> { (s, dir) =>
      val f = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < 97)
        .select(col("doc_id"),
          col("doc_id").cast("double").as("x"),
          when(col("doc_id") === 0, lit(1.0e9))
            .otherwise(col("n_chars").cast("double")).as("y"))
      Layout.withZorderValueRanked(f, Seq("x", "y"), bits = 3)
        .select("doc_id", "z_value")
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
    },
    // §2 row 141 — incremental skip-index maintenance over a
    // HIVE-PARTITIONED layout (lang=*/part-*): base files are indexed
    // once, a later drop appends files into nested partition dirs,
    // SkipIndex.append's recursive listing indexes ONLY the new files —
    // asserted in-gate to equal the full rebuild field-for-field
    // (bloom bytes compared via base64), then probed through the
    // pruned read path like q_skip_index (basePath keeps the lang
    // partition column populated)
    "q_skip_append" -> { (s, dir) =>
      val out = Files.createTempDirectory("graft-skipappend-gate").toString
      val d = s.read.parquet(s"$dir/documents.parquet")
      d.filter(col("doc_id") < 250)
        .repartitionByRange(4, col("doc_id"))
        .write.partitionBy("lang").mode("overwrite").parquet(out)
      val base = SkipIndex.build(s, out, Seq("doc_id"))
      val baseLocal = s.createDataFrame(
        java.util.Arrays.asList(base.collect(): _*), base.schema)
      d.filter(col("doc_id") >= 250)
        .repartitionByRange(4, col("doc_id"))
        .write.partitionBy("lang").mode("append").parquet(out)
      val appended = SkipIndex.append(s, out, baseLocal, Seq("doc_id"))
      // localize FIRST, assert on the local frame: fields() + the
      // localization each collect, and collecting the distributed
      // `appended` twice re-ran its new-file index scan per consumer
      // (one full pass of the cell's dominant cost for a parity check
      // that only needs the rows)
      val local = s.createDataFrame(
        java.util.Arrays.asList(appended.collect(): _*), appended.schema)
      def fields(ix: org.apache.spark.sql.DataFrame) = ix.select(
          col("file"), col("n_rows"), col("doc_id_min"), col("doc_id_max"),
          col("doc_id_nulls"), base64(col("doc_id_bloom")).as("b"))
        .collect().map(_.toSeq).toSet
      assert(fields(local) == fields(SkipIndex.build(s, out, Seq("doc_id"))),
        "append-built index must equal the full rebuild over the grown dir")
      assert(SkipIndex.append(s, out, local, Seq("doc_id")) eq local,
        "append with no new files must return the existing index unchanged")
      Seq(7L, 300L, 987654L).map { p =>
        SkipIndex.readPruned(s, out, local, "doc_id", p)
          .select(lit(p).as("probe"), col("doc_id"), col("lang"), col("n_chars"))
      }.reduce(_.unionByName(_))
    },
    // §2 row 141b — index maintenance for DELETED files: the lang=de
    // partition is removed from a Hive-partitioned copy of documents
    // (the compaction/retention/takedown shape), SkipIndex.prune drops
    // exactly its rows — asserted in-gate to equal a full rebuild over
    // the shrunken dir — and probes through the pruned read stay exact
    // for surviving rows while the removed partition's keys read empty
    "q_skip_prune" -> { (s, dir) =>
      val out = Files.createTempDirectory("graft-skipprune-gate").toString
      val d = s.read.parquet(s"$dir/documents.parquet")
      d.repartitionByRange(4, col("doc_id"))
        .write.partitionBy("lang").mode("overwrite").parquet(out)
      val built = SkipIndex.build(s, out, Seq("doc_id"))
      val full = s.createDataFrame(
        java.util.Arrays.asList(built.collect(): _*), built.schema)
      // delete the lang=de partition directory (file-level takedown)
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      require(fs.delete(new org.apache.hadoop.fs.Path(s"$out/lang=de"), true),
        "fixture partition delete failed")
      val pruned = SkipIndex.prune(s, out, full)
      def fields(ix: org.apache.spark.sql.DataFrame) = ix.select(
          col("file"), col("n_rows"), col("doc_id_min"), col("doc_id_max"),
          col("doc_id_nulls"), base64(col("doc_id_bloom")).as("b"))
        .collect().map(_.toSeq).toSet
      assert(fields(pruned) == fields(SkipIndex.build(s, out, Seq("doc_id"))),
        "pruned index must equal the full rebuild over the shrunken dir")
      val local = s.createDataFrame(
        java.util.Arrays.asList(pruned.collect(): _*), pruned.schema)
      assert(SkipIndex.prune(s, out, local) eq local,
        "prune with nothing vanished must return the existing index unchanged")
      // probe every doc id that was German (now gone) plus two known
      // survivors: German probes contribute zero rows
      val deIds = d.filter(col("lang") === "de")
        .select("doc_id").collect().map(_.getLong(0)).sorted.take(3)
      (deIds.toSeq :+ 7L :+ 37L).map { p =>
        SkipIndex.readPruned(s, out, local, "doc_id", p)
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
    "q_zorder_rank" ->
      s"""WITH f AS (
         |  SELECT doc_id, doc_id::DOUBLE AS x,
         |         CASE WHEN doc_id = 0 THEN 1000000000.0
         |              ELSE n_chars::DOUBLE END AS y
         |  FROM documents WHERE doc_id < 97),
         |b AS (
         |  SELECT quantile_cont(x, [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bx,
         |         quantile_cont(y, [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS by
         |  FROM f),
         |lv AS (
         |  SELECT doc_id,
         |         len(list_filter(bx, t -> x > t))::BIGINT AS sp,
         |         len(list_filter(by, t -> y > t))::BIGINT AS ss
         |  FROM f, b)
         |SELECT doc_id, CAST(${interleaveSql(3)} AS BIGINT) AS z_value
         |FROM lv""".stripMargin,
    "q_skip_index" ->
      """SELECT doc_id AS probe, doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (7, 37, 137, 444, 987654)""".stripMargin,
    "q_skip_append" ->
      """SELECT doc_id AS probe, doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (7, 300, 987654)""".stripMargin,
    // probes = the three lowest German ids (whose partition was
    // deleted → zero rows) plus 7 and 37; the de-filter drops exactly
    // what the file deletion dropped
    "q_skip_prune" ->
      """WITH de3 AS (
        |  SELECT doc_id FROM documents WHERE lang = 'de'
        |  ORDER BY doc_id LIMIT 3),
        |probes AS (
        |  SELECT doc_id AS probe FROM de3
        |  UNION ALL SELECT 7 UNION ALL SELECT 37)
        |SELECT p.probe, d.doc_id, d.lang, d.n_chars
        |FROM probes p
        |JOIN documents d ON d.doc_id = p.probe AND d.lang <> 'de'""".stripMargin
  )
}
