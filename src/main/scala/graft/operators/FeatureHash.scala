package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/**
 * Feature hashing ("the hashing trick", Weinberger et al., ICML 2009 —
 * public algorithm): fixed-dimension term-frequency vectors with no
 * vocabulary pass — bucket = hash(token) mod dim, optionally signed by
 * a second hash bit so collisions cancel in expectation (the property
 * that makes inner products unbiased).
 *
 * The vocabulary-free part is the 100 TB argument: unlike
 * CountVectorizer-style featurization there is NO global dictionary to
 * fit, broadcast, or keep consistent across corpus drops — two engines
 * (or two drops, or train vs. serve) produce identical features from
 * the hash alone. The plan is one explode + ONE map-side-combined
 * (id, bucket) aggregation; hashes ride the native
 * [[graft.functions.Md5Long60Expr]] (portable: DuckDB re-derives every
 * bucket and sign).
 */
object FeatureHash {

  /** Bucket index for a token: pmod(md5_long60(token), dim). */
  private def bucketOf(tok: Column, dim: Int): Column =
    pmod(Hashing.md5Long60(tok), lit(dim.toLong))

  /** ±1 sign for a token: parity of md5_long60("sign:" + token). */
  private def signOf(tok: Column): Column =
    when(pmod(Hashing.md5Long60(concat(lit("sign:"), tok)), lit(2L)) === 0, lit(1L))
      .otherwise(lit(-1L))

  /**
   * Sparse long-format hashed TF: one row per (id, bucket) with nonzero
   * weight `w` = Σ over token occurrences of sign(token) (or of 1 when
   * `signed = false`). Exactly-cancelled signed buckets are dropped
   * (indistinguishable from absent in any inner product).
   */
  def hashedTf(
    df: DataFrame,
    textCol: String,
    idCol: String,
    dim: Int,
    signed: Boolean = true
  ): DataFrame = {
    require(dim >= 1, s"dim must be positive: $dim")
    val toks = df.select(col(idCol).as("__id"),
        explode(Hashing.normalizedWords(col(textCol))).as("__tok"))
    val contrib = if (signed) signOf(col("__tok")) else lit(1L)
    toks
      .select(col("__id"), bucketOf(col("__tok"), dim).as("j"), contrib.as("__c"))
      .groupBy("__id", "j").agg(sum(col("__c")).as("w"))
      .filter(col("w") =!= 0)
      .select(col("__id").as(idCol), col("j"), col("w"))
  }

  /** Densify [[hashedTf]] output: one row per id with a dim-length
    * double array (absent buckets 0.0) — the shape ANN/classifier
    * operators consume. One (small) per-id aggregation. */
  def toDense(longFormat: DataFrame, idCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be positive: $dim")
    longFormat
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("j"), col("w")))).as("__m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("__m"), i), lit(0L)).cast("double"))
          .as("features"))
  }
}
