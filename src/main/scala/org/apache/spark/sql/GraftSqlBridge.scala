package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into Spark's `private[sql]` Column ↔ Expression
 * converters, so graft's native Catalyst expressions can be exposed as
 * ordinary `Column`s from the public DataFrame API. This is the standard
 * extension-library technique; nothing else from the private surface is
 * touched.
 */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The exact error ANSI `CAST(x AS <numeric>)` raises on malformed
    * input (`QueryExecutionErrors` is `private[sql]`), so graft's fused
    * parse expressions fail identically to the Cast they replace. */
  def invalidCastToNumberError(
    to: org.apache.spark.sql.types.DataType,
    s: org.apache.spark.unsafe.types.UTF8String
  ): Throwable =
    org.apache.spark.sql.errors.QueryExecutionErrors
      .invalidInputInCastToNumberError(to, s, null)

  /** Flush the async listener bus (bounded wait), so
    * `QueryExecutionListener` callbacks for actions that already finished
    * have been delivered. Returns false on timeout. The bus handle is
    * `private[spark]`, hence bridged here. */
  def flushListenerBus(spark: SparkSession, timeoutMs: Long): Boolean =
    try {
      spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
      true
    } catch { case _: java.util.concurrent.TimeoutException => false }

  /** Unpersist the cached blocks behind a `localCheckpoint()`ed frame —
    * the caller-visible FREE HANDLE for operators whose result is backed
    * by checkpoint blocks (e.g. the distributed arm of
    * `Dedup.connectedComponents`). A checkpointed Dataset's plan is a
    * `LogicalRDD` over an RDD cached outside the cache manager, so
    * `Dataset.unpersist()` (which routes through
    * `CacheManager.uncacheQuery`) silently no-ops on it; the blocks
    * otherwise linger until ContextCleaner GC. Walks the WHOLE analyzed
    * plan, freeing every checkpoint leaf under it, so it also works on
    * frames DERIVED from a checkpoint (a select/filter over the
    * returned labels). Safe no-op for any other plan shape. NEVER call
    * this on a checkpoint still in use — the cached blocks are the only
    * copy (lineage is truncated). */
  def unpersistLocalCheckpoint(df: Dataset[_]): Unit = df match {
    case cd: org.apache.spark.sql.classic.Dataset[_] =>
      cd.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
    case _ => ()
  }

  /** Register a SQL function on an EXISTING session (the extensions path
    * only applies at session construction). */
  def registerFunction(
    spark: SparkSession,
    name: String,
    builder: Seq[Expression] => Expression
  ): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
