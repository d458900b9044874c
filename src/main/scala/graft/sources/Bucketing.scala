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
   * Drop a table AND, for managed tables, its data directory. With the
   * default in-memory catalog the table registration dies with the
   * session but the warehouse directory survives, and the next session's
   * saveAsTable fails with LOCATION_ALREADY_EXISTS — so a plain DROP
   * TABLE is not enough for rerunnable jobs.
   *
   * Deletion targets the table's CATALOG-RESOLVED location, not a
   * guessed <warehouse>/<table> path: an EXTERNAL table's data is left
   * intact (drop removes metadata only), and a table living outside the
   * default warehouse layout never causes an unrelated path to vanish.
   * Only when the catalog has no entry at all (the dead-session orphan
   * this function exists for) does it fall back to clearing the default
   * warehouse directory for the name. Unqualified (current-database)
   * names only.
   */
  def dropTable(spark: SparkSession, table: String): Unit = {
    require(!table.contains("."),
      s"dropTable supports unqualified table names only, got '$table'")
    val meta =
      if (!spark.catalog.tableExists(table)) None
      else {
        val rows = spark.sql(s"DESCRIBE TABLE EXTENDED `$table`").collect()
        def field(n: String): Option[String] =
          rows.find(_.getString(0) == n).map(_.getString(1))
        Some((field("Type").getOrElse(""), field("Location")))
      }
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val toDelete = meta match {
      // managed: DROP already removed the data; deleting the resolved
      // location again is an idempotent no-op that also covers catalogs
      // configured to keep dropped-table data
      case Some((tpe, Some(loc))) if tpe.equalsIgnoreCase("MANAGED") =>
        Some(new org.apache.hadoop.fs.Path(loc))
      case Some(_) => None // external (or location-less view): keep the data
      case None => // no catalog entry: a prior session's orphaned dir
        Some(new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), table))
    }
    toDelete.foreach { p =>
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
