package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995 — the
 * classic published entity-resolution candidate generator): sort the
 * corpus by a blocking key and emit every pair within a sliding window
 * of `windowSize` consecutive rows — O(n·w) candidates instead of
 * O(n²), catching near-matches that share a key PREFIX even when no
 * token or variant is exactly equal (the case [[SetSim]]'s and
 * [[EditSim]]'s equality-based filters can miss). Run several passes
 * with different keys (rotated tokens, phonetic forms) and union the
 * pairs — each pass is one call.
 *
 * Scale shape: the global order comes from [[TrainingOrder
 * .withGlobalIndex]] (range shuffle + per-partition prefix sums — NO
 * single-partition stage); the window pairs are an explode of the
 * 1..w−1 offsets and ONE equi-join on the computed neighbor rank
 * (co-partitioned by construction) — no cartesian, no per-row scan.
 * Pair verification (edit distance, Jaccard, a trained matcher) is the
 * caller's next stage, as in the published design.
 */
object Blocking {

  /**
   * Candidate pairs from one sorted-neighborhood pass.
   *
   * @param df         input; `idCol` unique per row
   * @param blockKeyCol the sort key (ties broken by `idCol` — the
   *                    total order is fully deterministic)
   * @param idCol      unique orderable id
   * @param windowSize rows per sliding window (>= 2); every pair at
   *                   rank distance < windowSize is emitted
   * @return (id_a, id_b, rank_dist) with id_a/id_b the key-order pair
   */
  def sortedNeighborhoodPairs(
    df: DataFrame,
    blockKeyCol: String,
    idCol: String,
    windowSize: Int
  ): DataFrame = {
    require(windowSize >= 2, s"windowSize must be >= 2: $windowSize")
    val ranked = TrainingOrder.withGlobalIndex(
        df.select(col(idCol).as("__id"), col(blockKeyCol).as("__key")),
        Seq("__key", "__id"), idxCol = "__rank")
      .select(col("__id"), col("__rank"))
    val probes = ranked.select(col("__id").as("id_a"),
        explode(sequence(lit(1L), lit(windowSize - 1L))).as("__d"),
        col("__rank"))
      .select(col("id_a"), col("__d"), (col("__rank") + col("__d")).as("__rank"))
    probes.join(ranked, "__rank")
      .select(col("id_a"), col("__id").as("id_b"), col("__d").as("rank_dist"))
  }
}
