package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SaveMode, SparkSession}

/**
 * JSON-lines source/sink.
 *
 * Spark-native re-expression of the reference's JSON-lines IO
 * (reference: common/src/main/scala/.../MsgIO.scala:83-133).
 *
 *  - Read: `spark.read.json` is a distributed line-per-record scan whose
 *    schema inference preserves the long-vs-double distinction the
 *    reference's custom circe visitor exists for (MsgIO.scala:27-63):
 *    integral literals infer BIGINT, decimal literals DOUBLE.
 *  - Write: Spark's JSON sink is compact (no extra whitespace). Null
 *    handling is the caller's choice because a DataFrame NULL stands in
 *    for BOTH of the reference's distinct states (absent key vs explicit
 *    JSON null): the TSV pipelines' NULLs are absent keys (empty cells
 *    were dropped), so they write with `ignoreNullFields=true`; the JSON
 *    passthrough pipeline's NULLs are explicit input nulls, which the
 *    reference's unmodeled `StringRenderer` writer preserves verbatim
 *    (MsgIO.scala:106-115), so it writes with `ignoreNullFields=false`.
 *    A dataset mixing absent and explicit-null for the same key is the
 *    one case Spark's column model cannot reproduce row-by-row.
 *
 * Scale note: both directions are per-partition file IO — no driver-side
 * serialization loop, part-file-per-partition output like the reference's
 * Beam `saveAsTextFile`.
 */
object JsonLines {

  /**
   * Read JSON-lines files matching a glob into a DataFrame (schema inferred).
   *
   * @param recursive descend into subdirectories, matching Beam's
   *                  double-star patterns (reference:
   *                  DatasetSpecificPipeline.scala:64 reads the whole
   *                  dataset-specific tree recursively)
   * @param globFilter optional leaf-name glob applied with [[recursive]]
   */
  def read(
    spark: SparkSession,
    pattern: String,
    recursive: Boolean = false,
    globFilter: Option[String] = None
  ): DataFrame = {
    val reader = spark.read.option("recursiveFileLookup", recursive.toString)
    globFilter.fold(reader)(g => reader.option("pathGlobFilter", g)).json(pattern)
  }

  /**
   * Read with the primitivesAsString escape hatch off but dates kept as
   * strings, mirroring the reference's "everything is a message" model where
   * only null/bool/long/double/string/array/object exist.
   */
  def readUntyped(spark: SparkSession, pattern: String): DataFrame =
    spark.read
      .option("inferTimestamp", "false")
      .json(pattern)

  /**
   * Write unmodeled rows as compact JSON lines
   * (reference: MsgIO.scala:106-115); see the class doc for the
   * ignoreNullFields contract.
   */
  def write(
    df: DataFrame,
    outputPrefix: String,
    mode: SaveMode = SaveMode.Overwrite,
    ignoreNullFields: Boolean = true
  ): Unit =
    df.write
      .mode(mode)
      .option("ignoreNullFields", ignoreNullFields.toString)
      .json(outputPrefix)

  /**
   * Write modeled (typed) records as compact drop-null JSON lines
   * (reference: MsgIO.scala:123-132 — the `Encoder`-based overload).
   */
  def writeTyped[T: Encoder](ds: Dataset[T], outputPrefix: String,
                             mode: SaveMode = SaveMode.Overwrite): Unit =
    ds.toDF().write.mode(mode).json(outputPrefix)
}
