package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Derives the 10× "sf1" benchmark directory used for the scale-trend
 * tables in BASELINE.md. Committed so the method is reproducible instead
 * of living in a throwaway shell session (rounds 10's tables were built
 * with an ad-hoc copy of this logic).
 *
 * Method (documented in BASELINE.md "Round-10 sf1 scale trend"):
 *  - documents: 10 copies of sf0.1's table. Copy i offsets doc_id by
 *    i·10⁷ and suffixes EVERY word with `_ci` (copy 0 is unchanged), so
 *    copies are mutually DISSIMILAR — the corpus duplication *rate* is
 *    preserved rather than manufacturing an all-duplicates corpus that
 *    would flatter near-dup benchmarks. n_chars is recomputed.
 *  - embeddings: 10 copies, vec_id offset per copy, each copy's vectors
 *    dimension-ROTATED by the copy index — norm and per-dimension
 *    distribution preserved, cross-copy cosine decorrelated, so copies
 *    are not planted duplicates. Above `dim` copies rotation alone
 *    would repeat (copy c ≡ copy c+dim), so copies > 0 additionally
 *    flip each dimension's sign by a murmur3 hash of (copy, dim) —
 *    still norm-preserving, decorrelated at any copy count.
 *  - every other table: symlinked at sf0.1 (the scale story under test
 *    is the documents/embeddings operator families).
 *
 * Usage: sbt "runMain graft.DeriveSf1 [outDir] [copies]"
 * (defaults target/sf1, 10; copies=100 builds the sf10 decade)
 */
object DeriveSf1 {
  val CopyIdOffset: Long = 10_000_000L

  def deriveDocuments(spark: SparkSession, srcDir: String, copies: Int): DataFrame = {
    val base = spark.read.parquet(s"$srcDir/documents.parquet")
    base
      .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn("doc_id", col("doc_id") + col("copy") * lit(CopyIdOffset))
      .withColumn(
        "text",
        when(col("copy") === 0, col("text")).otherwise(
          // Suffix each whitespace-delimited word; single regex pass so the
          // derivation itself stays a projection.
          regexp_replace(col("text"), lit("(\\S+)"), concat(lit("$1_c"), col("copy")))))
      .withColumn("n_chars", length(col("text")))
      .drop("copy")
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  def deriveEmbeddings(spark: SparkSession, srcDir: String, copies: Int): DataFrame = {
    val base = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val dim = size(col("embedding"))
    base
      .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn("vec_id", col("vec_id") + col("copy") * lit(CopyIdOffset))
      .withColumn(
        "embedding",
        // rotate left by the copy index (element j of the output is input
        // element (j + copy) mod dim); for copies past 0, also flip signs
        // by hash(copy, j) parity so the scheme stays decorrelated when
        // copies exceeds dim
        transform(sequence(lit(0), dim - 1), j =>
          when(col("copy") > 0 && pmod(hash(col("copy"), j), lit(2)) === 1,
            -element_at(col("embedding"), ((j + col("copy")) % dim) + 1))
            .otherwise(
              element_at(col("embedding"), ((j + col("copy")) % dim) + 1))))
      .drop("copy")
      .select("vec_id", "embedding", "label")
  }

  /** 10× events: copy i offsets event_id by i·10⁷ and user_id by i·10⁶ —
    * new user COHORTS, not denser per-user streams, so per-key history
    * length (what the as-of window walks) is preserved and growth adds
    * parallel keys, the shape real event-volume growth has. Timestamps
    * are unchanged: interval density per wall-clock window grows 10×,
    * which is exactly the stress a range join should absorb via its bin
    * key staying balanced. */
  def deriveEvents(spark: SparkSession, srcDir: String, copies: Int): DataFrame = {
    // normalized read (nanos-long / NTZ → TimestampType) so the derived
    // table is uniform regardless of the source's physical ts encoding
    val base = graft.streaming.Events.readEventsParquet(spark, s"$srcDir/events.parquet")
    base
      .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn("event_id", col("event_id") + col("copy") * lit(CopyIdOffset))
      .withColumn("user_id", col("user_id") + col("copy") * lit(1_000_000L))
      .drop("copy")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** 10× lineitem (r14, for the numeric-profile trend cells —
    * q_corr_matrix needs a lineitem that actually grows): copy i
    * offsets l_orderkey by i·10⁹ (divisible by 1000, so the gates'
    * `l_orderkey % 1000` NULL-stripe rate is preserved per copy);
    * every numeric column unchanged — duplicated data has IDENTICAL
    * per-pair correlations, so the oracle's expected values are stable
    * while the one-pass aggregation scans 10× the rows, which is
    * exactly the scaling term under test. */
  def deriveLineitem(spark: SparkSession, srcDir: String, copies: Int): DataFrame = {
    val base = spark.read.parquet(s"$srcDir/lineitem.parquet")
    base
      .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn("l_orderkey", col("l_orderkey") + col("copy") * lit(1_000_000_000L))
      .drop("copy")
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/sf1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SRC_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-derive-sf1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = new java.io.File(outDir)
    out.mkdirs()

    deriveDocuments(spark, srcDir, copies)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    deriveEmbeddings(spark, srcDir, copies)
      .repartition(math.max(8, copies * 4 / 5))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    deriveEvents(spark, srcDir, copies)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    deriveLineitem(spark, srcDir, copies)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    val others = Seq("region", "nation", "customer", "supplier", "part",
      "orders")
    for (t <- others) {
      val link = java.nio.file.Paths.get(outDir, s"$t.parquet")
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(srcDir, s"$t.parquet"))
    }

    val nd = spark.read.parquet(s"$outDir/documents.parquet").count()
    val ne = spark.read.parquet(s"$outDir/embeddings.parquet").count()
    println(s"derived $outDir: documents=$nd embeddings=$ne (others symlinked from $srcDir)")
    spark.stop()
  }
}
