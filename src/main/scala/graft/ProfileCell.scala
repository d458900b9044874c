package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev-side measurement aid (guide §1: measure first): runs ONE declared
 * query end-to-end through the same noop-sink methodology as
 * [[Bench]], with a QueryExecutionListener attached so every ACTION the
 * cell triggers (gate-side asserts, index builds, artifact writes, the
 * final noop save) reports its wall time and a one-line plan tag. This
 * is how a cell's seconds get attributed to operators before touching
 * anything — the Spark UI is disabled in bench runs, and a cell like
 * q_bm25_sidecar_merge runs dozens of actions whose relative cost is
 * invisible from the one steady number.
 *
 * Usage: SPARK_GRAFT_PROFILE=q_x,q_y sbt "runMain graft.ProfileCell"
 * Not part of any pipeline or gate; adds no dependency and changes no
 * query.
 */
object ProfileCell {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROFILE", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "set SPARK_GRAFT_PROFILE=q_name[,q_name...]")
    val spark = GraftSession.builder("graft-profile")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val actions = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
        funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long
      ): Unit = {
        val plan = qe.executedPlan.toString
        val tag = plan.linesIterator.take(3).mkString(" | ").take(220)
        actions.add((s"$funcName :: $tag", durationNs / 1e9))
      }
      override def onFailure(
        funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception
      ): Unit =
        actions.add((s"FAILED $funcName: ${exception.getMessage}", -1.0))
    })

    val qs = SparkEntry.queries
    names.foreach { name =>
      require(qs.contains(name), s"unknown query $name")
      // warm (cold pass absorbs codegen/scan caches), then profile one
      // steady pass with a drained action log
      qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      GraftSession.sweepPersistedState(spark)
      org.apache.spark.sql.GraftSqlBridge.flushListenerBus(spark, 10000)
      actions.clear()
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      GraftSession.sweepPersistedState(spark)
      org.apache.spark.sql.GraftSqlBridge.flushListenerBus(spark, 10000)
      println(f"\n===== $name steady=$dt%.3f s, per-action breakdown =====")
      val snap = actions.toArray(Array.empty[(String, Double)])
      snap.foreach { case (tag, s) => println(f"  $s%8.3f  $tag") }
      println(f"  sum of actions: ${snap.map(_._2).filter(_ > 0).sum}%.3f s " +
        s"(${snap.length} actions)")
    }
    spark.stop()
  }
}
