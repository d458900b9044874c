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
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
      println(s"wrote $outDir/${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
