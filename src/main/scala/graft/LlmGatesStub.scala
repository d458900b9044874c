package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Placeholder wiring for the §2.4 gate module while it is built this
  * round; replaced by graft.gates.LlmGates. */
object LlmGates {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  val oracleSql: Map[String, String] = Map.empty
}
