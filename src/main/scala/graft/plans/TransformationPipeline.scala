package graft.plans

import graft.GraftSession
import org.apache.spark.sql.SparkSession

/**
 * Base harness for graft's batch pipelines — the Spark-native
 * re-expression of the reference's pipeline composition API
 * (common/.../TransformationPipeline.scala:14-34): parse command-line
 * args, stand up the engine session with scale defaults, run the
 * pipeline's transforms, tear down.
 *
 * Beam builds a deferred pipeline graph in `buildPipeline` and executes
 * it with `context.run()`; in Spark the write actions inside
 * `buildPipeline` ARE the execution, so no separate run step exists.
 */
abstract class TransformationPipeline {

  /** App name shown in the Spark UI; defaults to the concrete class name. */
  def appName: String = getClass.getSimpleName.stripSuffix("$")

  /** Arg keys (without `--`) that must be present, e.g. "input-dir". */
  def requiredArgs: Seq[String]

  /** Register and execute the pipeline's transforms. */
  def buildPipeline(spark: SparkSession, args: Map[String, String]): Unit

  final def main(rawArgs: Array[String]): Unit = {
    val args = TransformationPipeline.parseArgs(rawArgs)
    val missing = requiredArgs.filterNot(args.contains)
    require(
      missing.isEmpty,
      s"missing required args: ${missing.map("--" + _).mkString(", ")}")
    val spark = GraftSession.create(appName)
    try buildPipeline(spark, args)
    finally spark.stop()
  }
}

object TransformationPipeline {

  /** `--key value` pairs; later occurrences of a key win. */
  def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
}

/** CLI main for the V2F extraction pipeline (TSV → typed JSON-lines). */
object ExtractionPipelineMain extends TransformationPipeline {
  override def requiredArgs: Seq[String] = Seq("input-dir", "output-dir")

  override def buildPipeline(spark: SparkSession, args: Map[String, String]): Unit =
    ExtractionPipeline.run(spark, args("input-dir"), args("output-dir"))
}

/** CLI main for the dataset-specific pipeline (JSON → renamed JSON). */
object DatasetSpecificPipelineMain extends TransformationPipeline {
  override def requiredArgs: Seq[String] = Seq("input-dir", "output-dir")

  override def buildPipeline(spark: SparkSession, args: Map[String, String]): Unit =
    DatasetSpecificPipeline.run(spark, args("input-dir"), args("output-dir"))
}
