package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Guard for operators that stage temp or output columns via
 * `withColumn`: Spark's `withColumn` silently OVERWRITES an existing
 * column of the same name, so a caller column that happens to collide
 * with an operator's staging name (`__rn`, `__ln`, a default `rank`
 * output, …) would be corrupted rather than rejected. Fail loudly at
 * plan build instead — the same convention as the samplers' zero-width
 * checks.
 */
private[graft] object Cols {

  /** Require that none of `names` already exist in `df` (case-insensitive,
    * matching Spark's default resolution). */
  def requireAbsent(df: DataFrame, names: String*): Unit = {
    val existing = df.columns.map(_.toLowerCase)
    val clash = names.filter(n => existing.contains(n.toLowerCase))
    require(clash.isEmpty,
      s"column(s) ${clash.mkString(", ")} already exist in the input — " +
        "withColumn would silently overwrite caller data; rename the " +
        "input column or pass a different temp/output column name")
  }
}
