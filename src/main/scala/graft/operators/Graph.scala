package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph centrality for corpus curation. Common-Crawl-derived
 * corpora weight documents by the standing of their DOMAIN in the web
 * link graph (the harmonic/PageRank centrality lists published with the
 * CC web graphs); this module computes that prior from an edge list so
 * a curation pipeline can join it back onto documents as a quality
 * feature (compose with [[Web.withUrlParts]] → domain →
 * [[Sampling.quantileBucket]] for a per-domain quality tier).
 *
 * Scale shape (the reason this is joins, not GraphX): the edge list is
 * the only corpus-scale table. Out-degree weights are folded into the
 * edges ONCE ([[weightedEdges]], persisted hash-partitioned on src by
 * the fold join itself), so every power-iteration round is exactly one
 * equi-join (ranks ⋈ edges on src — the persisted edge partitioning is
 * reused, only the rank table moves) plus one sum-by-dst aggregation.
 * Ranks are node-sized (domains, not documents). Per-round
 * `localCheckpoint` truncates the otherwise-doubling lineage and
 * superseded checkpoints are freed eagerly — the same discipline as
 * [[Dedup.connectedComponents]]'s distributed arm.
 */
object Graph {

  /**
   * PageRank over a directed edge list, fixed-`iterations` synchronous
   * power iteration (deterministic — no convergence-dependent result):
   *
   *   rank'(v) = (1−d)/N + d · ( Σ_{u→v} rank(u)/outdeg(u) + dangling/N )
   *
   * where `dangling` is the total rank mass on nodes with no out-edges,
   * redistributed uniformly (the standard correction; rank mass sums to
   * 1 every round). Node set = distinct src ∪ dst. Self-loops count
   * like any edge; pass `dedupEdges = false` only if the input is
   * already distinct (parallel edges would double-count mass).
   *
   * Returns (`node`, `rank`). Output is node-sized; at web scale that
   * is domains — metadata next to the corpus. When the node count is at
   * most `localizeNodeLimit` (the common case: domains, not documents),
   * the result is LOCALIZED — the loop's checkpoints are all freed
   * before returning and the frame is a driver-local relation with
   * exact stats, so a downstream rank-onto-documents join broadcasts
   * statically. Above the limit the frame stays checkpoint-backed:
   * free it via `GraftSqlBridge.unpersistLocalCheckpoint` once consumed
   * (the [[Dedup.connectedComponents]] ownership contract).
   */
  def pageRank(
    edges: DataFrame,
    srcCol: String,
    dstCol: String,
    iterations: Int = 10,
    damping: Double = 0.85,
    dedupEdges: Boolean = true,
    localizeNodeLimit: Long = 200000L
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1): $damping")
    val raw = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = (if (dedupEdges) raw.distinct() else raw).persist()
    try {
      val nodes = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node")))
        .distinct()
        .persist()
      try {
        val n = nodes.count().toDouble // metadata-sized job (node count)
        // fold 1/outdeg into the edges once; the join hash-partitions the
        // persisted result on src, which every round's rank join reuses
        val outDeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
        val weighted = e.join(outDeg, "src")
          .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
          .persist()
        // nodes with no out-edges: their rank mass re-spreads uniformly
        val dangling = nodes.join(outDeg.select(col("src").as("node")),
            Seq("node"), "left_anti")
          .persist()
        try {
          // node-sized rank state under the localize limit is broadcast-
          // sized by the same argument (domains ≪ edges): broadcasting it
          // into the contribution join keeps the persisted edge list
          // STATIONARY every round — the per-round bill drops to one scan
          // of the edges + a map-side-combined sum, no edge-side shuffle
          val smallState = n <= localizeNodeLimit
          def asRanks(df: DataFrame): DataFrame =
            if (smallState) broadcast(df) else df
          var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
          var prev = ranks
          var i = 0
          while (i < iterations) {
            // both aggregates read the SAME checkpointed rank blocks; the
            // dangling sum is one scalar row cross-joined into the plan —
            // no per-round driver collect
            val dm = ranks.join(dangling, "node")
              .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
            val contribs = weighted
              .join(asRanks(ranks.withColumnRenamed("node", "src")), "src")
              .groupBy(col("dst").as("node"))
              .agg(sum(col("w") * col("rank")).as("contrib"))
            val next = nodes
              .join(asRanks(contribs), Seq("node"), "left")
              .crossJoin(dm)
              .select(col("node"),
                (lit((1.0 - damping) / n) + lit(damping) *
                  (coalesce(col("contrib"), lit(0.0)) + col("dm") / lit(n)))
                  .as("rank"))
              .localCheckpoint()
            org.apache.spark.sql.GraftSqlBridge.unpersistLocalCheckpoint(prev)
            prev = next
            ranks = next
            i += 1
          }
          if (n <= localizeNodeLimit) {
            // node-sized = metadata-sized (the same argument as k-means
            // centroid localization): free the final checkpoint and hand
            // back a local relation with exact stats
            val rows = ranks.collect()
            org.apache.spark.sql.GraftSqlBridge.unpersistLocalCheckpoint(ranks)
            edges.sparkSession.createDataFrame(
              java.util.Arrays.asList(rows: _*), ranks.schema)
          } else ranks
        } finally { weighted.unpersist(); dangling.unpersist() }
      } finally nodes.unpersist()
    } finally e.unpersist()
  }
}
