package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gates.{BpeGates, CorpusGates, ForgetGates, InfraGates, KernelGates, LayoutGates, LlmGates, PipelineGates, PrivacyGates, SimJoinGates, SourceGates, V2FGates, VectorGates, WinnowGates}
import graft.operators.Transformations

/**
 * Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
 *
 * `queries` / `oracleSql` are assembled from per-area gate modules
 * (graft.gates.*): one gated query per implemented SURVEY.md §2 row, each
 * with a DuckDB oracle re-deriving the same result.
 */
object SparkEntry {

  /**
   * Flagship query on /root/testdata/sf0.001: the full V2F-style transform
   * chain (snake-case → rename → typed parse) over lineitem.
   */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(
        col("l_orderkey").cast("string").as("orderKey"),
        col("l_linenumber").cast("string").as("line-Number"),
        col("l_quantity").cast("string").as("qty"),
        col("l_returnflag").as("returnFlag")
      )
    val chain =
      Transformations.keysToSnakeCase _ andThen
        Transformations.renameFields(Map("return_flag" -> "rf")) andThen
        Transformations.parseLongs(Set("order_key")) andThen
        Transformations.parseDoubles(Set("qty"))
    chain(li)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    KernelGates.queries ++ SourceGates.queries ++ V2FGates.queries ++
      LlmGates.queries ++ InfraGates.queries ++ PipelineGates.queries ++
      VectorGates.queries ++ CorpusGates.queries ++ BpeGates.queries ++
      SimJoinGates.queries ++ LayoutGates.queries ++ PrivacyGates.queries ++
      ForgetGates.queries ++ WinnowGates.queries

  /**
   * DuckDB-runnable oracle SQL per queries key. Column names must match the
   * Spark result (the driver sorts columns by name before hashing values);
   * queries absent from this map get the weaker rows-only check.
   */
  def oracleSql: Map[String, String] =
    KernelGates.oracleSql ++ SourceGates.oracleSql ++ V2FGates.oracleSql ++
      LlmGates.oracleSql ++ InfraGates.oracleSql ++ PipelineGates.oracleSql ++
      VectorGates.oracleSql ++ CorpusGates.oracleSql ++ BpeGates.oracleSql ++
      SimJoinGates.oracleSql ++ LayoutGates.oracleSql ++ PrivacyGates.oracleSql ++
      ForgetGates.oracleSql ++ WinnowGates.oracleSql
}
