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
 *  - Pruning reads the INDEX, not the data: min/max range checks run as
 *    a Spark filter over the index; bloom probes deserialize each
 *    candidate file's filter driver-side (bounded by the pruned
 *    candidate count — bloom bytes for files already excluded by
 *    min/max are never collected... the index projection keeps only
 *    candidates).
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
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val df = spark.read.parquet(tableDir)
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

  /**
   * Files that may contain `keyCol = value`: min/max range check as a
   * Spark filter over the index, then a driver-side bloom probe on the
   * surviving candidates only. NULL-valued probes match nothing (SQL
   * equality semantics).
   */
  def prunedFiles(index: DataFrame, keyCol: String, value: Any): Seq[String] = {
    if (value == null) return Seq.empty
    val cand = index
      .filter(col(s"${keyCol}_min") <= lit(value) &&
        col(s"${keyCol}_max") >= lit(value))
      .select(col("file"), col(s"${keyCol}_bloom").as("__bloom"),
        keyHash(lit(value)).as("__h"))
      .collect()
    cand.iterator.flatMap { r =>
      val bytes = r.getAs[Array[Byte]]("__bloom")
      if (bytes == null) None // all-NULL keys in this file: no match possible
      else {
        val bf = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bytes))
        if (bf.mightContainLong(r.getAs[Long]("__h"))) Some(r.getAs[String]("file"))
        else None
      }
    }.toSeq
  }

  /**
   * Read only the files that may satisfy `keyCol = value`, re-applying
   * the exact predicate (bloom false positives removed here). Zero
   * surviving files → an empty frame with the table's schema.
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
      spark.read.schema(full.schema).parquet(files: _*)
        .filter(col(keyCol) === lit(value))
  }
}
