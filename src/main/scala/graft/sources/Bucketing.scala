package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed table IO for co-located joins.
 *
 * At 100 TB the dominant cost of a repeated large-large join is the
 * shuffle. Writing both sides bucketed (and sorted) on the join key with
 * the same bucket count lets Spark's scan report a compatible hash
 * partitioning, so the sort-merge join runs with NO exchange on either
 * side — the shuffle is paid once at write time and amortized over every
 * subsequent join, aggregation, or dedup on that key. BucketingSpec
 * asserts the exchange-free plan.
 */
object Bucketing {

  /**
   * Write `df` as a bucketed+sorted parquet table registered in the
   * session catalog (bucketing metadata lives in the catalog — a plain
   * path write cannot carry it).
   */
  def writeBucketed(
    df: DataFrame,
    table: String,
    key: String,
    buckets: Int,
    mode: SaveMode = SaveMode.Overwrite
  ): Unit =
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata applied from the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /**
   * Drop a managed table AND its warehouse location. With the default
   * in-memory catalog the table registration dies with the session but
   * the warehouse directory survives, and the next session's saveAsTable
   * fails with LOCATION_ALREADY_EXISTS — so a plain DROP TABLE is not
   * enough for rerunnable jobs.
   */
  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
  }
}
