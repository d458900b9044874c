package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{BloomExprs, Hashing}

/**
 * Per-file data-skipping index: min/max + bloom filter per (file, key
 * column) — the metadata layer public lakehouse formats (Delta, Iceberg,
 * Hudi — all public designs) use to prune file scans, built here as a
 * plain DataFrame over any parquet directory and applied by
 * [[readPruned]].
 *
 * Why it scales (the 100 TB argument):
 *  - Building is ONE distributed scan: group by `input_file_name()`,
 *    aggregate native min/max plus a [[BloomExprs.bloomAgg]] per key
 *    column (TypedImperativeAggregate — partials merge map-side, one
 *    ~bloom-sized row per file crosses the wire, never the values).
 *  - The index is per-FILE metadata: at 128 MiB files, 100 TB ≈ 800k
 *    rows — persist it as parquet next to the data and re-read it, the
 *    build never reruns per query.
 *  - Pruning reads the INDEX, not the data: min/max range checks AND
 *    the bloom probes run as plan-side filters over the index
 *    ([[graft.functions.BloomExprs.mightContainCol]]); only surviving
 *    FILE NAMES reach the driver — never bloom bytes, whatever the
 *    probe's selectivity.
 *  - A growing corpus maintains the index INCREMENTALLY: [[append]]
 *    lists the directory (metadata), indexes only files absent from
 *    the manifest, and unions — indexed files are never rescanned.
 *  - The pruned read opens ONLY the surviving files; the residual
 *    predicate still applies (bloom false positives possible, false
 *    negatives not — so results are exact).
 *  - Combine with [[Layout.clusterByZorder]]: clustering makes per-file
 *    min/max ranges tight, which is what makes pruning bite.
 */
object SkipIndex {

  /** Bloom sizing per FILE (files hold ≲ a few M distinct keys;
    * 1M/8Mbit ⇒ ~3% fpp — [[BloomExprs]] defaults). */
  val DefaultExpectedItems: Long = BloomExprs.DefaultExpectedItems
  val DefaultNumBits: Long = BloomExprs.DefaultNumBits

  /** The portable probe hash: md5_long60 of the key's string form —
    * identical at build and probe time (same engine, same cast). */
  private def keyHash(c: Column): Column =
    Hashing.md5Long60(c.cast("string"))

  /**
   * Build the index over a parquet directory in one scan: one row per
   * file with, per key column `c`: `<c>_min`, `<c>_max` (native type),
   * `<c>_nulls`, and `<c>_bloom` (serialized filter over the non-null
   * key hashes). Persist the result (parquet) and pass it to
   * [[readPruned]].
   */
  def build(
    spark: SparkSession,
    tableDir: String,
    keyCols: Seq[String],
    expectedItems: Long = DefaultExpectedItems,
    numBits: Long = DefaultNumBits
  ): DataFrame =
    buildOver(spark.read.parquet(tableDir), keyCols, expectedItems, numBits)

  private def buildOver(
    df: DataFrame,
    keyCols: Seq[String],
    expectedItems: Long,
    numBits: Long
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ keyCols.flatMap { c =>
      Seq(
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        count(when(col(c).isNull, lit(1))).as(s"${c}_nulls"),
        BloomExprs.bloomAgg(keyHash(col(c)), expectedItems, numBits)
          .as(s"${c}_bloom"))
    }
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Scheme-and-encoding-insensitive file identity: `input_file_name()`
    * yields a URL-encoded URI ("file:///a%20b/part-0.parquet"), Hadoop
    * listings yield Path strings ("file:/a b/part-0.parquet") — compare
    * both through the decoded URI path. */
  private def canonical(name: String): String = {
    val u = java.net.URI.create(
      new org.apache.hadoop.fs.Path(name).toUri.toString)
    Option(u.getPath).getOrElse(name)
  }

  /**
   * INCREMENTAL index maintenance: scan only the data files of
   * `tableDir` that are absent from `existing`'s manifest, index them
   * with the same per-file aggregation, and union the result onto the
   * existing rows — a growing corpus indexes each append once, never
   * rescanning indexed files (a full [[build]] over 100 TB re-reads
   * 100 TB; an append after a 1 TB drop reads 1 TB).
   *
   * New files are discovered by a RECURSIVE filesystem LISTING (a
   * metadata operation — partitioned layouts like `dt=.../part-*` nest
   * data files in subdirectories exactly as `build`'s partition
   * discovery reads them; a non-recursive listing would see only
   * directories and silently append nothing, leaving growth unindexed
   * and readPruned dropping the new files' rows) diffed against the
   * manifest on decoded URI paths, so the same file never indexes
   * twice whether it was named by `input_file_name()` or a Hadoop
   * listing. Files under hidden/metadata path segments (`_`/`.`
   * prefixed, e.g. `_SUCCESS`, `.crc`, `_delta_log/`) are skipped at
   * EVERY depth, matching what Spark's own file index ignores. New
   * files read with `basePath = tableDir` so Hive-partition columns
   * keep their values (an explicit file list alone would lose them).
   * Returns `existing` unchanged when nothing is new. Callers pass
   * the SAME keyCols and bloom sizing as the original build (per-file
   * stats must be homogeneous — a mixed index would probe
   * inconsistently; the gate proves append ≡ full rebuild over the
   * grown directory, and the spec pins the partitioned layout).
   */
  def append(
    spark: SparkSession,
    tableDir: String,
    existing: DataFrame,
    keyCols: Seq[String],
    expectedItems: Long = DefaultExpectedItems,
    numBits: Long = DefaultNumBits
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val listed = listDataFiles(spark, tableDir)
    val known = existing.select("file").collect()
      .map(r => canonical(r.getString(0))).toSet
    val fresh = listed.filterNot(p => known.contains(canonical(p.toString)))
    if (fresh.isEmpty) existing
    else existing.unionByName(
      buildOver(
        spark.read.option("basePath", tableDir)
          .parquet(fresh.map(_.toString): _*),
        keyCols, expectedItems, numBits))
  }

  /** RECURSIVE data-file listing under `tableDir` (metadata only):
    * every file whose path segments below the root are all visible —
    * a visible file under `_delta_log/` is still metadata. Shared by
    * [[append]] (diff for NEW files) and [[prune]] (diff for VANISHED
    * ones). */
  private def listDataFiles(
    spark: SparkSession, tableDir: String
  ): Seq[org.apache.hadoop.fs.Path] = {
    val dirPath = new org.apache.hadoop.fs.Path(tableDir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val basePath = canonical(fs.makeQualified(dirPath).toString)
    val buf = Seq.newBuilder[org.apache.hadoop.fs.Path]
    val it = fs.listFiles(dirPath, /* recursive = */ true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile) buf += st.getPath
    }
    buf.result().filter { p =>
      val cp = canonical(p.toString)
      val rel =
        if (cp.startsWith(basePath)) cp.stripPrefix(basePath) else p.getName
      rel.split('/').filter(_.nonEmpty)
        .forall(s => !s.startsWith("_") && !s.startsWith("."))
    }
  }

  /**
   * Index maintenance for DELETED files — the other half of the
   * [[append]] lifecycle: compaction rewrites, retention expiry, and
   * file-level takedown all REMOVE data files, and an index row for a
   * vanished file must go with it (readPruned would pass its name to
   * the parquet reader, which fails on a missing path — and a stale
   * row is a lie about what the corpus contains). Diffs the index
   * manifest against the recursive listing on decoded URI paths and
   * drops rows whose files are gone; rows for surviving files are
   * UNTOUCHED (never rescanned — this is a metadata operation end to
   * end, file-count-sized, no data read). Returns `existing` unchanged
   * when nothing vanished. Gate-pinned: prune ≡ a full rebuild over
   * the shrunken directory, field-for-field, and composes with
   * [[graft.operators.Forget.rewriteVersioned]] for atomic publication.
   */
  def prune(
    spark: SparkSession,
    tableDir: String,
    existing: DataFrame
  ): DataFrame = {
    val live = listDataFiles(spark, tableDir)
      .map(p => canonical(p.toString)).toSet
    val stale = existing.select("file").collect()
      .map(_.getString(0)).filterNot(f => live.contains(canonical(f)))
    if (stale.isEmpty) existing
    else existing.filter(!col("file").isin(stale.toIndexedSeq: _*))
  }

  /**
   * Files that may contain `keyCol = value`: min/max range check AND
   * the bloom probe both run as plan-side filters over the index
   * ([[BloomExprs.mightContainCol]] — the bloom side is a column, so
   * each candidate's filter deserializes where its index row lives),
   * and ONLY the surviving file names are collected — driver traffic
   * is the answer, never the bloom bytes (a low-selectivity probe over
   * an 800k-file corpus would otherwise pull hundreds of GB of filters
   * to one machine). A NULL bloom (all-NULL keys in that file) cannot
   * match an equality probe and is filtered with the ranges.
   * NULL-valued probes match nothing (SQL equality semantics).
   */
  def prunedFiles(index: DataFrame, keyCol: String, value: Any): Seq[String] = {
    if (value == null) return Seq.empty
    index
      .filter(col(s"${keyCol}_min") <= lit(value) &&
        col(s"${keyCol}_max") >= lit(value) &&
        col(s"${keyCol}_bloom").isNotNull &&
        BloomExprs.mightContainCol(col(s"${keyCol}_bloom"), keyHash(lit(value))))
      .select("file")
      .collect()
      .map(_.getString(0))
      .toSeq
  }

  /**
   * Read only the files that may satisfy `keyCol = value`, re-applying
   * the exact predicate (bloom false positives removed here). Zero
   * surviving files → an empty frame with the table's schema. The
   * surviving-files read passes `basePath = tableDir` so
   * Hive-partition columns keep their directory-derived values.
   */
  def readPruned(
    spark: SparkSession,
    tableDir: String,
    index: DataFrame,
    keyCol: String,
    value: Any
  ): DataFrame = {
    val files = prunedFiles(index, keyCol, value)
    val full = spark.read.parquet(tableDir)
    if (files.isEmpty) full.limit(0).filter(lit(false))
    else
      spark.read.option("basePath", tableDir).schema(full.schema)
        .parquet(files: _*)
        .filter(col(keyCol) === lit(value))
  }
}
