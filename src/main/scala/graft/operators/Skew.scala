package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Key-skew mitigation.
 *
 * AQE's skew-join splitting (enabled in GraftSession) handles most skew
 * at runtime, but it only applies to sort-merge joins after materialized
 * shuffle statistics exist. Salting is the explicit tool for the rest: a
 * hot key's rows are spread across `saltN` synthetic sub-keys, so no
 * single task receives the whole key.
 */
object Skew {

  /**
   * Skew-safe equi-join: the (big, skewed) left side gets a uniform
   * random salt per ROW, the right side is exploded `saltN`× with every
   * salt value, and the join runs on (key, salt) — a hot left key's rows
   * land on saltN different tasks instead of one.
   *
   * Output equals `left.join(right, key)` exactly (inner join). Cost:
   * the right side is replicated saltN× — use for joins whose right side
   * is too big to broadcast but far smaller than the skewed left.
   */
  def saltedJoin(
    left: DataFrame,
    right: DataFrame,
    key: String,
    saltN: Int = 16
  ): DataFrame = {
    require(saltN > 0, s"saltN must be positive, got $saltN")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "input frames must not carry a __salt column (it would be clobbered)")
    val salted = left.withColumn("__salt", (rand() * saltN).cast("int"))
    val exploded = right.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(saltN - 1))))
    salted
      .join(exploded, Seq(key, "__salt"))
      .drop("__salt")
  }

  /**
   * Two-phase aggregation for skewed group keys: aggregate partials per
   * (key, salt) first — spreading a hot key over saltN reducers — then
   * combine partials per key. For algebraic aggregates Spark's own
   * map-side partial aggregation usually makes this unnecessary; it
   * matters when per-group state is large (collect-like aggregations)
   * and a hot key would overwhelm one task.
   *
   * The caller owns the decomposition's correctness: the aggregate must
   * compose across salts. count/sum/min/max do (combine with sum/sum/
   * min/max); a DISTINCT aggregate does NOT — the same value lands under
   * several salts and a summed combine overcounts it. For distincts,
   * partial with collect_set and combine with
   * size(array_distinct(flatten(collect_list(...)))).
   *
   * @param partial per-(key,salt) aggregate columns
   * @param combine per-key recombination of the partial columns
   */
  def saltedAgg(
    df: DataFrame,
    key: String,
    saltN: Int
  )(partial: Seq[Column], combine: Seq[Column]): DataFrame = {
    require(!df.columns.contains("__salt"),
      "input frame must not carry a __salt column (it would be clobbered)")
    df.withColumn("__salt", (rand() * saltN).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(combine.head, combine.tail: _*)
  }
}
