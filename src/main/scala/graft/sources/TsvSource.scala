package graft.sources

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Header-TSV ingestion as a distributed Spark scan.
 *
 * Spark-native re-expression of the reference's TSV reader
 * (reference: v2f/src/main/scala/.../V2FUtils.scala:33-76): every cell is
 * read as a string, trimmed, and empty-after-trim cells become NULL (the
 * columnar equivalent of the reference dropping the key from the record).
 * The originating file path travels along as a metadata column, the
 * distributed analogue of Beam's `ReadableFile` path.
 *
 * Scale note: this is a plain `spark.read.csv` scan — files split across
 * executors, no driver-side file loop; column pruning and (string)
 * predicate pushdown apply as usual.
 */
object TsvSource {

  /** Default name of the appended file-path column. */
  val PathCol = "source_file"

  private def hasGlob(pattern: String): Boolean =
    pattern.exists("*?[{".contains(_))

  /**
   * Read header TSVs matching a path/glob pattern.
   *
   * @param withPath append the source-file path as column [[PathCol]]
   *                 (reference keeps the file path alongside each record,
   *                 V2FUtils.scala:71-72)
   */
  def read(
    spark: SparkSession,
    pattern: String,
    withPath: Boolean = true,
    sep: String = "\t",
    recursive: Boolean = false,
    globFilter: Option[String] = None
  ): DataFrame = {
    val reader = spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("inferSchema", "false")
      // Beam's `**` file patterns recurse into subdirectories
      // (V2FExtractionsAndTransforms.scala:25 uses "**.csv"); Spark's
      // equivalent is recursiveFileLookup + a glob filter on leaf names.
      .option("recursiveFileLookup", recursive.toString)
    val raw = globFilter
      .fold(reader)(g => reader.option("pathGlobFilter", g))
      .csv(pattern)
    // Trim every cell; empty-after-trim -> NULL (missing), matching
    // V2FUtils.scala:66-69.
    val trimmed = raw.columns.foldLeft(raw) { (df, c) =>
      df.withColumn(c, when(trim(col(c)) === "", lit(null)).otherwise(trim(col(c))))
    }
    if (withPath) trimmed.withColumn(PathCol, col("_metadata.file_path"))
    else trimmed
  }

  /**
   * Read header TSVs with the reference's `ALLOW_IF_WILDCARD` empty-match
   * behavior (V2FUtils.scala:42): a glob pattern matching nothing yields an
   * empty (zero-column) DataFrame instead of erroring; a non-glob path that
   * does not exist still errors.
   */
  def readGlob(
    spark: SparkSession,
    pattern: String,
    withPath: Boolean = true,
    sep: String = "\t",
    recursive: Boolean = false,
    globFilter: Option[String] = None
  ): DataFrame =
    try read(spark, pattern, withPath, sep, recursive, globFilter)
    catch {
      case e: AnalysisException
          if (hasGlob(pattern) || globFilter.nonEmpty) &&
            (e.getErrorClass == "PATH_NOT_FOUND" ||
              e.getErrorClass == "UNABLE_TO_INFER_SCHEMA") =>
        spark.emptyDataFrame
    }
}
