package graft

/**
 * Dev-side deliverable aid: dump `.explain("formatted")` for named
 * declared queries to files (plans/r21/<query>_<tag>.txt), so plan-shape
 * claims in optimization notes are checkable without running Spark.
 *
 * Usage: SPARK_GRAFT_PLANS=q_a,q_b SPARK_GRAFT_PLAN_TAG=after \
 *          sbt "runMain graft.PlanDump"
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "after")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r21")
    val names = sys.env.getOrElse("SPARK_GRAFT_PLANS", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "set SPARK_GRAFT_PLANS=q_name[,q_name...]")
    val spark = GraftSession.builder("graft-plandump")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val qs = SparkEntry.queries
    names.foreach { name =>
      require(qs.contains(name), s"unknown query $name")
      val df = qs(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // the runtime-executed plan is where AQE decisions live
      // (ReusedExchange/AQEShuffleRead/join rewrites) — run the query
      // through the bench's noop sink and capture the WRITE's final
      // plan via a listener (the save builds its own QueryExecution;
      // df.queryExecution stays unexecuted), so exchange-reuse and AQE
      // claims are checkable from the dump
      val captured = new java.util.concurrent.atomic.AtomicReference[String]("")
      val l = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
          captured.set(qe.executedPlan.toString)
        override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
      }
      spark.listenerManager.register(l)
      df.write.format("noop").mode("overwrite").save()
      org.apache.spark.sql.GraftSqlBridge.flushListenerBus(spark, 10000)
      spark.listenerManager.unregister(l)
      val executed = captured.get
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        plan + "\n\n== runtime-executed plan (after noop save) ==\n" + executed)
      GraftSession.sweepPersistedState(spark)
      println(s"wrote $outDir/${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
