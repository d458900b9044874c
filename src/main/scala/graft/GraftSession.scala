package graft

import org.apache.spark.sql.SparkSession

/**
 * SparkSession factory carrying the engine's scale defaults.
 *
 * Every graft entry point (pipeline mains, Verify, Bench) builds its
 * session here so the 100-TB posture is uniform:
 *
 *  - AQE on, with skew-join splitting and partition coalescing — runtime
 *    re-planning is the first line of defense against skewed keys and
 *    over-partitioned shuffles at cluster scale.
 *  - Shuffle partitions sized to the local core count for local runs
 *    (Spark's 200 default is wrong in both directions: too many locally,
 *    far too few on a 1000-executor cluster — cluster deployments override
 *    via spark-submit conf, which takes precedence).
 *  - UTC session timezone, so timestamp windows are reproducible across
 *    driver environments.
 *
 * The master is only defaulted (to local[cores]) when none was provided by
 * the launcher — a spark-submit-provided cluster master always wins.
 */
object GraftSession {

  /** Core count for local sizing; SPARK_GRAFT_CPUS overrides for tests. */
  def localCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  def builder(appName: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", localCores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP(NANOS) parquet columns surface as raw longs instead of
      // being refused outright (streaming.Events.readEventsParquet
      // truncates them to microseconds). Session-level because the scan
      // captures conf at planning time; the flag has no effect on any
      // column Spark could otherwise read, and setting it HERE keeps
      // operators from mutating shared session conf mid-flight.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (sys.props.contains("spark.master")) b
    else b.master(s"local[$localCores]")
  }

  def create(appName: String): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark) // SQL surface for the native expressions
    registerBucketCapLogger(spark)
    spark
  }

  // ------------------------------------------- observed-metric reporting

  /** Sessions that already carry the bucket-cap listener (register runs on
    * every create/getOrCreate; the listener must attach once). */
  private val capLoggerSessions =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /**
   * WARN-log any `graft.*.bucket_cap#*` observed metric with a nonzero
   * drop count (see Dedup.capBuckets): capping a degenerate LSH bucket is
   * a deliberate recall-for-boundedness trade, and this listener is what
   * keeps it from being a SILENT one. Plan-side metrics + a driver-side
   * listener cost nothing per row — no second pass over the data.
   */
  def registerBucketCapLogger(spark: SparkSession): Unit =
    if (capLoggerSessions.add(spark)) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        private val log = org.slf4j.LoggerFactory.getLogger("graft.BucketCap")
        override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long
        ): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft.") && name.contains(".bucket_cap#")) {
              val buckets = row.getAs[Long]("dropped_buckets")
              if (buckets > 0)
                log.warn(
                  s"$name: dropped $buckets oversized bucket(s) covering " +
                    s"${row.getAs[Long]("dropped_rows")} rows — raise maxBucket " +
                    "or run exact dedup first if those clusters matter")
            }
          }
        override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception
        ): Unit = ()
      })
    }
}
