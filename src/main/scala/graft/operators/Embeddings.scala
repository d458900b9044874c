package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding-column utilities: L2 normalization and symmetric int8
 * quantization — the storage/compute halvers every vector pipeline at
 * scale runs before ANN or semantic dedup (normalized vectors turn
 * cosine into a dot product; int8 cuts the embedding table to ~1/4 of
 * float32, which at 100 TB is the difference between an index that
 * fits executor memory and one that doesn't).
 *
 * All math is double-precision elementwise expression work with a
 * deterministic op order, so an external engine (the DuckDB oracle)
 * reproduces every output bit-for-bit. Pure projections — no shuffle,
 * no UDFs; everything stays inside whole-stage codegen except the
 * per-element lambdas, which are bound-attribute slices like the rest
 * of the vector family.
 */
object Embeddings {

  /** L2 norm of a numeric array (cast-safe for float inputs). */
  def l2Norm(vec: Column): Column = sqrt(Similarity.dot(vec, vec))

  /**
   * The unit-length vector (array<double>), or NULL for zero-norm /
   * NULL inputs — a zero embedding has no direction, and downstream
   * cosine math treats NULL as "not a neighbor" (the
   * [[Similarity.bruteForceTopK]] convention).
   *
   * The norm must NOT appear inside the per-element lambda: there is no
   * codegen CSE across HOF lambda iterations, so `transform(vec, _ / n)`
   * re-evaluates the O(dim) norm for every element — O(dim²) per row.
   * Instead the norm is evaluated once per row (array_repeat argument)
   * and zipped alongside the elements; same arithmetic, same bits.
   */
  def l2Normalize(vec: Column): Column = {
    val n = l2Norm(vec)
    when(n > 0.0,
      zip_with(vec, array_repeat(n, size(vec)), (x, nn) => x.cast("double") / nn))
      .otherwise(lit(null))
  }

  /**
   * Symmetric per-vector int8 quantization: scale = max |x_i|, each
   * element rounds to x_i / scale · 127 in [−127, 127] (a true byte —
   * 4× smaller than float32). An all-zero vector quantizes to zeros
   * with scale 0. Returns (idCol, scale DOUBLE, q ARRAY<TINYINT>).
   *
   * Half-way values round away from zero on every engine involved
   * (Spark HALF_UP on positives and negatives alike, same as DuckDB's
   * round), so the oracle re-derives each byte exactly.
   */
  def quantizeInt8(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df.select(
        col(idCol),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .select(
        col(idCol),
        array_max(transform(col("v"), x => abs(x))).as("scale"),
        col("v"))
      .select(
        col(idCol),
        col("scale"),
        when(col("scale") === 0.0, transform(col("v"), _ => lit(0).cast("byte")))
          .otherwise(
            transform(col("v"),
              x => round(x / col("scale") * lit(127.0)).cast("byte")))
          .as("q"))

  /** Reconstruct approximate doubles from a quantized vector: q·scale/127.
    * Max absolute reconstruction error is scale/254 (half a quantization
    * step) — spec-pinned. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale / lit(127.0))
}
