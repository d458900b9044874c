package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Partition keys derived from file paths.
 *
 * Spark-native re-expression of the reference's ancestry-ID extraction
 * (reference: v2f/src/main/scala/.../V2FUtils.scala:78-107): the key is an
 * `ancestry=<id>` segment of the input file path, pulled out with a regex
 * and attached to every record of that file.
 *
 * Scale note: expressed as a column over the metadata path — per-row
 * codegen'd regex on an already-present value, no filename collect. When
 * inputs are laid out as `.../ancestry=<id>/...`, prefer Spark's native
 * partition discovery (the directory becomes a real partition column and
 * filters on it prune whole directories before any read).
 */
object PathKeys {

  /** Pattern locating the ancestry ID in a path (V2FUtils.scala:80). */
  val AncestryIdPattern: String = "/ancestry=([^/]+)/"

  /**
   * Extract a regex group from a path column, raising a runtime error on
   * rows whose path does not match — the reference throws in that case
   * (V2FUtils.scala:96-101).
   */
  def extractOrFail(pathCol: Column, pattern: String, errLabel: String): Column = {
    val m = regexp_extract(pathCol, pattern, 1)
    when(
      m === "",
      raise_error(
        concat(
          lit(s"$errLabel: no match for pattern $pattern in path "),
          pathCol
        )
      )
    ).otherwise(m)
  }

  /**
   * Add the ancestry ID parsed from `pathColName` as column `ancestry`
   * (reference: V2FUtils.scala:87-107).
   */
  def withAncestryId(
    pathColName: String = TsvSource.PathCol,
    outputCol: String = "ancestry"
  )(df: DataFrame): DataFrame =
    df.withColumn(
      outputCol,
      extractOrFail(col(pathColName), AncestryIdPattern, "addAncestryID")
    )
}
