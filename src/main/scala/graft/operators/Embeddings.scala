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
   * Johnson–Lindenstrauss random projection with a RADEMACHER sign
   * matrix (Achlioptas 2003, "Database-friendly random projections"):
   * out_j = (1/√outDim) · Σ_i sign(j,i) · x_i, where sign(j,i) = ±1
   * derives from the portable 60-bit MD5 hash of "seed:j:i" — fully
   * deterministic, engine-re-derivable (the DuckDB oracle rebuilds the
   * same matrix from the same hashes), and distance-preserving in
   * expectation like the Gaussian form (JL holds for ±1 entries).
   *
   * The scale lever this buys: project 768-d float corpora to 64-d
   * BEFORE brute-force/IVF/PQ ANN and the cosine/L2 work drops ~12×
   * with JL-bounded distortion. Pure zero-shuffle projection (one
   * native [[graft.functions.MatVecExpr]] per row — a tight
   * outDim×inDim primitive loop, no per-element lambda frames);
   * streaming-safe. Wrong-length vectors project to NULL (the
   * L2DistSqExpr convention); inDim reads from the first row.
   */
  def randomProject(
    df: DataFrame,
    vecCol: String,
    outDim: Int,
    seed: String = "jl",
    outCol: String = "proj"
  ): DataFrame = {
    require(outDim > 0, s"outDim must be positive: $outDim")
    Cols.requireAbsent(df, outCol)
    val head = df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol)).as("d")).head(1)
    require(head.nonEmpty,
      "cannot infer vector dim: frame has no non-null vectors")
    val inDim = head.head.getInt(0)
    require(inDim > 0, s"input vectors are empty (dim $inDim)")
    val s = 1.0 / math.sqrt(outDim.toDouble)
    val matrix = new Array[Double](outDim * inDim)
    var j = 0
    while (j < outDim) {
      var i = 0
      while (i < inDim) {
        val h = graft.functions.Md5Long60Expr.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"$seed:$j:$i"))
        matrix(j * inDim + i) = if (h % 2 == 0) s else -s
        i += 1
      }
      j += 1
    }
    df.withColumn(outCol,
      graft.functions.MatVecExpr(col(vecCol), matrix.toSeq, outDim))
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
