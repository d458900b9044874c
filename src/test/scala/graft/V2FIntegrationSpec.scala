package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.{DatasetSpecificPipeline, ExtractionPipeline, V2FTables}

/**
 * End-to-end fidelity against the reference implementation's own
 * integration fixtures (v2f/src/it/test-files): graft's pipelines run
 * over the reference's INPUT files and every output table must equal the
 * reference's committed TRUTH files value-for-value.
 *
 * Comparison detail: the reference serializes its `Str("nan")` sentinel
 * as the JSON string "nan" inside double arrays while Spark spells NaN
 * "NaN", so both sides' configured double-array columns are cast
 * element-wise to double (Spark's string→double cast accepts both
 * spellings) before the row-set diff; everything else must match as
 * parsed.
 */
class V2FIntegrationSpec extends SparkSpec {

  private val inputs = "/root/reference/v2f/src/it/test-files/inputs"
  private val truthDir = "/root/reference/v2f/src/it/test-files/outputs"

  /** Run both pipelines once; all table tests share the output. */
  private lazy val outDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-integ").toString
    ExtractionPipeline.run(spark, inputs, d)
    DatasetSpecificPipeline.run(spark, inputs, d)
    d
  }

  private val numericArrayCols: Set[String] =
    V2FTables.all.flatMap(_.fieldsToConvertToDoubleArray.values.flatten).toSet

  private def canon(df: DataFrame): DataFrame =
    numericArrayCols.intersect(df.columns.toSet).foldLeft(df)((d, c) =>
      d.withColumn(c, transform(col(c), x => x.cast("double"))))

  private def assertMatchesTruth(rel: String): Unit = {
    val truth = canon(spark.read.json(s"$truthDir/$rel"))
    val ours = canon(spark.read.json(s"$outDir/$rel"))
    assert(truth.columns.sorted.toSeq == ours.columns.sorted.toSeq,
      s"$rel: column sets differ")
    val cols = truth.columns.sorted.map(col).toSeq
    val t = truth.select(cols: _*)
    val o = ours.select(cols: _*)
    assert(t.count() == o.count(), s"$rel: row counts differ")
    assert(t.exceptAll(o).count() == 0, s"$rel: truth rows missing from ours")
    assert(o.exceptAll(t).count() == 0, s"$rel: rows not present in truth")
  }

  for (
    rel <- Seq(
      "frequency-analysis",
      "meta-analysis/ancestry-specific",
      "meta-analysis/trans-ethnic",
      "variant-effect/regulatory-feature-consequences",
      "variant-effect/transcript-consequences",
      "variants",
      "dataset-specific"
    )
  ) test(s"reproduces the reference truth output: $rel") {
    assertMatchesTruth(rel)
  }
}
