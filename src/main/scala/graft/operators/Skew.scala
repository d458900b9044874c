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

  /** Join types saltedJoin supports: every LEFT-side row carries exactly
    * one salt while the right side carries all of them, so a left row's
    * (key, salt) matches iff its key matches — inner and the left-family
    * joins are exact. Right/full outer are NOT: an unmatched right key
    * appears saltN times after the explode and would null-extend saltN×. */
  private val SaltableJoinTypes =
    Set("inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi",
      "leftanti", "left_anti")

  /** Whether xxhash64 accepts a column of this type (Spark's hash
    * expressions reject any type containing a MapType — map iteration
    * order is undefined, so map hashes wouldn't be deterministic). */
  private def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => false
    case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
    case _ => true
  }

  /** Deterministic per-row salt: xxhash64 over every hash-supported
    * column. Map-typed columns are EXCLUDED (xxhash64 rejects them), so
    * rows differing only in a map column share a salt — the same
    * documented limitation as byte-identical duplicates. */
  private[operators] def rowSalt(df: DataFrame, saltN: Int): Column = {
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(cols.nonEmpty,
      "salting needs at least one non-map column to hash deterministically")
    pmod(xxhash64(cols.toIndexedSeq: _*), lit(saltN)).cast("int")
  }

  /**
   * Skew-safe equi-join: the (big, skewed) left side gets a deterministic
   * per-row salt, the right side is exploded `saltN`× with every salt
   * value, and the join runs on (key, salt) — a hot left key's rows land
   * on saltN different tasks instead of one.
   *
   * Output equals `left.join(right, Seq(key), joinType)` exactly for
   * inner and left/left_semi/left_anti joins; right/full outer are
   * rejected (see [[SaltableJoinTypes]]). Cost: the right side is
   * replicated saltN× — use for joins whose right side is too big to
   * broadcast but far smaller than the skewed left.
   *
   * The salt is a hash of the full left row, NOT rand(): a
   * nondeterministic salt feeding a shuffle key re-salts rows differently
   * when a task is recomputed after a fetch failure, losing or
   * duplicating rows (the SPARK-23207 correctness class). The tradeoff:
   * byte-identical duplicate left rows share a salt, so a hot key made
   * entirely of EXACT duplicate rows still lands on one task — add any
   * distinguishing column (offset, file path) to `left` to spread those.
   */
  def saltedJoin(
    left: DataFrame,
    right: DataFrame,
    key: String,
    saltN: Int = 16,
    joinType: String = "inner"
  ): DataFrame = {
    require(saltN > 0, s"saltN must be positive, got $saltN")
    require(SaltableJoinTypes(joinType.toLowerCase),
      s"saltedJoin supports inner and left/left_semi/left_anti joins, got " +
        s"'$joinType' — right/full outer would null-extend every unmatched " +
        "right row saltN times")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "input frames must not carry a __salt column (it would be clobbered)")
    val salted = left.withColumn("__salt", rowSalt(left, saltN))
    val exploded = right.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(saltN - 1))))
    salted
      .join(exploded, Seq(key, "__salt"), joinType)
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
   * The salt hashes the full row (deterministic under task retry — see
   * [[saltedJoin]]); byte-identical duplicate rows share a salt, so a hot
   * key of EXACT duplicates won't spread — include a distinguishing
   * column in `df` for those.
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
    df.withColumn("__salt", rowSalt(df, saltN))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(combine.head, combine.tail: _*)
  }
}
