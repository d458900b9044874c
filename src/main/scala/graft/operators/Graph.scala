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
   * Two arms, chosen by edge count (the [[Dedup.connectedComponents]]
   * convention): at or below `localizeEdgeLimit` the (deduped) edge
   * list collects and iterates on the DRIVER — metadata-scale flops,
   * ZERO per-round jobs or cached blocks; above it, the distributed
   * join-shaped loop below runs. Both arms evaluate the same formula
   * in the same per-term order (GraphSpec pins agreement to 1e-12).
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
    localizeNodeLimit: Long = 200000L,
    localizeEdgeLimit: Long = 2000000L
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1): $damping")
    val raw = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = (if (dedupEdges) raw.distinct() else raw).persist()
    try {
      // localized arm (the connectedComponents convention): a small edge
      // list iterates on the DRIVER — metadata-scale flops, zero
      // per-round jobs — instead of paying 2·iterations Spark jobs of
      // fixed scheduling cost. Same formula, same (ts-free) determinism;
      // GraphSpec pins arm agreement to 1e-12.
      val edgeCount = e.count()
      if (edgeCount <= localizeEdgeLimit)
        return localizedPageRank(e, iterations, damping)
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
        try {
          // node-sized rank state under the localize limit is broadcast-
          // sized by the same argument (domains ≪ edges): broadcasting it
          // into the contribution join keeps the persisted edge list
          // STATIONARY every round — the per-round bill drops to one scan
          // of the edges + a map-side-combined sum, no edge-side shuffle
          val smallState = n <= localizeNodeLimit
          def asRanks(df: DataFrame): DataFrame =
            if (smallState) broadcast(df) else df

          // r12 loop restructure (the r11-verdict round-cost item): the
          // per-round materialization is CONTRIBS, not ranks, and two
          // whole sub-plans of the old loop are gone —
          //  - the dangling-node table and its per-round join: every
          //    non-dangling node's rank lands in some contrib and total
          //    mass is 1 by induction, so dm = 1 − Σ contrib (one
          //    single-row aggregate over the checkpointed blocks);
          //  - the per-round `nodes` join: a node absent from contribs
          //    has the CONSTANT rank base + d·dm/n, so the rank formula
          //    folds into the edge join as
          //    rank(src) = base + d·(coalesce(contrib, 0) + dm/n)
          //    via a LEFT join — only the FINAL round rebuilds the full
          //    node-sized rank table.
          // Per round: one action, one node-sized shuffle (contribs to
          // src — skipped entirely when the state broadcasts), one scan
          // of the stationary edges, one map-side-combined dst sum.
          val base = (1.0 - damping) / n
          // the dangling-mass scalar: ONE single-row aggregate over the
          // checkpointed contrib blocks, cross-joined onto every row
          // (a 1-row broadcast — attached AFTER the left join so
          // unmatched rows carry it too)
          def dmOf(contribs: DataFrame): DataFrame =
            contribs.agg(
              (lit(1.0) - coalesce(sum(col("contrib")), lit(0.0))).as("__dm"))
          def rankExpr = lit(base) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("__dm") / lit(n))
          def nextContribs(contribs: DataFrame): DataFrame =
            weighted
              .join(asRanks(contribs.withColumnRenamed("node", "src")),
                Seq("src"), "left")
              .crossJoin(dmOf(contribs))
              .groupBy(col("dst").as("node"))
              .agg(sum(col("w") * rankExpr).as("contrib"))
          def ranksOf(contribs: DataFrame): DataFrame =
            nodes
              .join(asRanks(contribs), Seq("node"), "left")
              .crossJoin(dmOf(contribs))
              .select(col("node"), rankExpr.as("rank"))

          // round 1 from the uniform seed: rank ≡ 1/n, no join needed
          var contribs = weighted
            .groupBy(col("dst").as("node"))
            .agg(sum(col("w") / lit(n)).as("contrib"))
            .localCheckpoint()
          var i = 1
          while (i < iterations) {
            val next = nextContribs(contribs).localCheckpoint()
            org.apache.spark.sql.GraftSqlBridge.unpersistLocalCheckpoint(contribs)
            contribs = next
            i += 1
          }
          if (n <= localizeNodeLimit) {
            // node-sized = metadata-sized (the same argument as k-means
            // centroid localization): free the final checkpoint and hand
            // back a local relation with exact stats
            val finalRanks = ranksOf(contribs)
            val rows = finalRanks.collect()
            org.apache.spark.sql.GraftSqlBridge.unpersistLocalCheckpoint(contribs)
            edges.sparkSession.createDataFrame(
              java.util.Arrays.asList(rows: _*), finalRanks.schema)
          } else {
            val res = ranksOf(contribs).localCheckpoint()
            org.apache.spark.sql.GraftSqlBridge.unpersistLocalCheckpoint(contribs)
            res
          }
        } finally weighted.unpersist()
      } finally nodes.unpersist()
    } finally e.unpersist()
  }

  /**
   * Label-propagation community detection (Raghavan et al. 2007 —
   * public algorithm) over an UNDIRECTED edge list: every node starts
   * labeled with itself; each synchronous round relabels every node
   * with its neighbors' most frequent label, ties broken by the
   * SMALLEST label — a fixed `iterations` count, so the result is
   * deterministic (the asynchronous/convergence variants are not, and a
   * non-deterministic operator can't be gated). Self-loops are dropped
   * (a node seconding its own vote distorts the neighborhood count),
   * parallel edges are deduplicated, and the graph is symmetrized
   * internally — pass each undirected edge once in either direction.
   *
   * Near-duplicate clusters ([[Dedup.connectedComponents]]) answer
   * "what is transitively linked"; LPA answers the finer "which dense
   * groups exist inside the link graph" — the domain-community feature
   * next to [[pageRank]]'s centrality prior.
   *
   * Two arms by edge count (the [[pageRank]] convention): a bounded
   * edge list iterates driver-side (zero per-round jobs); above the
   * limit, each round is one labels⋈edges equi-join + one (dst, label)
   * count + one per-dst argmax window, with per-round localCheckpoint
   * truncating the lineage and superseded checkpoints freed eagerly.
   * Labels are node-sized state, edges stay stationary and persisted.
   *
   * Returns (`node`, `label`). Ordering note: the distributed tie-break
   * uses Spark's native ordering (strings: binary UTF-8); the localized
   * arm matches it for numeric and ASCII-string nodes (GraphSpec pins
   * arm agreement).
   */
  def labelPropagation(
    edges: DataFrame,
    srcCol: String,
    dstCol: String,
    iterations: Int = 5,
    localizeNodeLimit: Long = 200000L,
    localizeEdgeLimit: Long = 2000000L
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val raw = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sym = raw
      .unionByName(raw.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    try {
      val edgeCount = sym.count()
      if (edgeCount <= localizeEdgeLimit)
        return localizedLabelPropagation(sym, iterations)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dst")).orderBy(col("cnt").desc, col("label").asc)
      def round(labels: DataFrame): DataFrame =
        sym.join(labels.withColumnRenamed("node", "src"), "src")
          .groupBy("dst", "label").agg(count(lit(1)).as("cnt"))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(col("dst").as("node"), col("label"))

      var labels = sym.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
        .localCheckpoint()
      var i = 0
      while (i < iterations) {
        val next = round(labels).localCheckpoint()
        org.apache.spark.sql.GraftSqlBridge.unpersistLocalCheckpoint(labels)
        labels = next
        i += 1
      }
      // node-sized = metadata-sized under the limit (the pageRank result
      // discipline): free the final checkpoint and hand back a local
      // relation with exact stats; above it the checkpoint-backed frame
      // is the caller's to free (the connectedComponents contract)
      val nodeCount = labels.count()
      if (nodeCount <= localizeNodeLimit) {
        val rows = labels.collect()
        org.apache.spark.sql.GraftSqlBridge.unpersistLocalCheckpoint(labels)
        edges.sparkSession.createDataFrame(
          java.util.Arrays.asList(rows: _*), labels.schema)
      } else labels
    } finally sym.unpersist()
  }

  /** Driver-side LPA over a collected symmetrized edge list: the same
    * synchronous most-frequent/min-label rule, per-round O(E). */
  private def localizedLabelPropagation(sym: DataFrame, iterations: Int): DataFrame = {
    val spark = sym.sparkSession
    val rows = sym.collect()
    // integral ids order via longValue — exact for 64-bit ids (a double
    // conversion loses precision above 2^53 and could diverge from the
    // distributed arm's native ordering); fractional types via doubleValue
    val ord: Ordering[Any] = sym.schema("src").dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        Ordering.by((x: Any) => x.asInstanceOf[Number].longValue)
      case _: org.apache.spark.sql.types.NumericType =>
        Ordering.by((x: Any) => x.asInstanceOf[Number].doubleValue)
      case _ => Ordering.by((x: Any) => x.toString)
    }
    val idx = new java.util.LinkedHashMap[Any, Integer]()
    def id(x: Any): Int = {
      var i = idx.get(x)
      if (i == null) { i = Integer.valueOf(idx.size()); idx.put(x, i) }
      i.intValue
    }
    val srcs = new Array[Int](rows.length)
    val dsts = new Array[Int](rows.length)
    var i = 0
    while (i < rows.length) {
      srcs(i) = id(rows(i).get(0)); dsts(i) = id(rows(i).get(1)); i += 1
    }
    val n = idx.size()
    val values = new Array[Any](n)
    val it0 = idx.keySet().iterator()
    i = 0
    while (it0.hasNext) { values(i) = it0.next(); i += 1 }
    var labels = Array.tabulate[Any](n)(v => values(v))
    var round = 0
    while (round < iterations) {
      val counts = Array.fill(n)(
        new java.util.HashMap[Any, Integer]())
      i = 0
      while (i < rows.length) {
        val m = counts(dsts(i))
        val l = labels(srcs(i))
        val c = m.get(l)
        m.put(l, if (c == null) 1 else c.intValue + 1)
        i += 1
      }
      val next = new Array[Any](n)
      var v = 0
      while (v < n) {
        val m = counts(v)
        var bestLabel: Any = null
        var bestCnt = -1
        val eIt = m.entrySet().iterator()
        while (eIt.hasNext) {
          val e = eIt.next()
          val c = e.getValue.intValue
          if (c > bestCnt ||
            (c == bestCnt && ord.lt(e.getKey, bestLabel))) {
            bestLabel = e.getKey; bestCnt = c
          }
        }
        next(v) = if (bestLabel == null) labels(v) else bestLabel
        v += 1
      }
      labels = next
      round += 1
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", sym.schema("src").dataType),
      org.apache.spark.sql.types.StructField("label", sym.schema("src").dataType)))
    val outRows = new java.util.ArrayList[org.apache.spark.sql.Row](n)
    var v = 0
    while (v < n) { outRows.add(org.apache.spark.sql.Row(values(v), labels(v))); v += 1 }
    spark.createDataFrame(outRows, schema)
  }

  /**
   * Driver-side power iteration over a collected (bounded) edge list:
   * index-mapped arrays, the SAME per-round formula as the distributed
   * arm in the same evaluation order per term. Zero per-round jobs,
   * zero cached blocks; the labels return as a local relation (or a
   * parallelized flat plan past 200k nodes, the localizedComponents
   * convention).
   */
  private def localizedPageRank(
    e: DataFrame, iterations: Int, damping: Double): DataFrame = {
    val spark = e.sparkSession
    val rows = e.collect()
    val idx = new java.util.LinkedHashMap[Any, Integer]()
    def id(x: Any): Int = {
      var i = idx.get(x)
      if (i == null) { i = Integer.valueOf(idx.size()); idx.put(x, i) }
      i.intValue
    }
    val srcs = new Array[Int](rows.length)
    val dsts = new Array[Int](rows.length)
    var i = 0
    while (i < rows.length) {
      srcs(i) = id(rows(i).get(0)); dsts(i) = id(rows(i).get(1)); i += 1
    }
    val n = idx.size()
    val out = new Array[Double](n)
    i = 0
    while (i < rows.length) { out(srcs(i)) += 1.0; i += 1 }
    var rank = Array.fill(n)(1.0 / n)
    val base = (1.0 - damping) / n
    var it = 0
    while (it < iterations) {
      val contrib = new Array[Double](n)
      i = 0
      while (i < rows.length) {
        contrib(dsts(i)) += (1.0 / out(srcs(i))) * rank(srcs(i)); i += 1
      }
      var dm = 0.0
      var v = 0
      while (v < n) { if (out(v) == 0.0) dm += rank(v); v += 1 }
      val next = new Array[Double](n)
      v = 0
      while (v < n) { next(v) = base + damping * (contrib(v) + dm / n); v += 1 }
      rank = next
      it += 1
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", e.schema("src").dataType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val outRows = new java.util.ArrayList[org.apache.spark.sql.Row](n)
    val nodeIt = idx.keySet().iterator()
    var v = 0
    while (nodeIt.hasNext) {
      outRows.add(org.apache.spark.sql.Row(nodeIt.next(), rank(v))); v += 1
    }
    if (n <= 200000) spark.createDataFrame(outRows, schema)
    else {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          outRows.asScala.toIndexedSeq, math.max(1, n / 500000)),
        schema)
    }
  }
}
