package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Embeddings}

/**
 * Correctness gates for the embedding-column utilities and semantic
 * dedup (SURVEY.md §2.4 rows 64-65).
 *
 * Everything here is deterministic double-precision math with a fixed
 * op order, so the DuckDB oracles re-derive the outputs bit-for-bit
 * (cosine rounding at 4, scalars at 6 — the q_embed_neardup precedent).
 * The semantic-dedup gates run the DEGENERATE single-cluster config
 * (every vector lands in the one cluster, in-cluster pairing becomes
 * all-pairs, cap disabled) — the same oracle strategy as
 * q_ann_ivf_exact, which DuckDB can re-derive without replicating
 * k-means; the multi-cluster behavior is spec-pinned (planted
 * identical vectors always share a centroid; multi-cluster pairs are a
 * subset of the degenerate pairs).
 */
object VectorGates {

  private def embs(s: SparkSession, dir: String): DataFrame =
    LlmGates.embs(s, dir)

  /** The first 500 embeddings ∪ re-keyed copies of every 25th — planted
    * cosine-1.0 semantic duplicates (the LlmGates fixture). The id cut
    * (the whole table at sf≤0.01) bounds the DEGENERATE single-cluster
    * gate config: all-pairs in one cluster is one task's sequential
    * work, and an uncut sf0.1 run put 2.16M pairs on that task (13 s in
    * the bench) for no extra gate power. */
  private def embsWithDups(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select("vec_id", "embedding")
      .filter(col("vec_id") < 500)
    e.unionByName(
      e.filter(col("vec_id") % 25 === 0)
        .withColumn("vec_id", col("vec_id") + 100000))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 row 64a — L2 normalization: norm + the first 4 unit-vector
    // elements (zero-norm → NULL semantics has no corpus fixture; the
    // spec covers it)
    "q_embed_normalize" -> { (s, dir) =>
      val nv = Embeddings.l2Normalize(col("embedding"))
      embs(s, dir).select(
        col("vec_id"),
        round(Embeddings.l2Norm(col("embedding")), 6).as("norm"),
        round(element_at(nv, 1), 6).as("e0"),
        round(element_at(nv, 2), 6).as("e1"),
        round(element_at(nv, 3), 6).as("e2"),
        round(element_at(nv, 4), 6).as("e3"))
    },
    // §2.4 row 64b — symmetric int8 quantization: scale + every byte
    // (JSON-serialized array, the q_minhash_signature precedent)
    "q_embed_quantize" -> { (s, dir) =>
      Embeddings.quantizeInt8(embs(s, dir), "embedding", "vec_id")
        .select(
          col("vec_id"),
          round(col("scale"), 6).as("scale"),
          to_json(col("q")).as("q_json"))
    },
    // §2.4 row 65a — semantic near-dup pairs, degenerate single-cluster
    // config ≡ all-pairs cosine (planted dups must appear at 1.0)
    "q_semdedup_pairs" -> { (s, dir) =>
      Dedup.semanticNearDups(embsWithDups(s, dir), "embedding", "vec_id",
          threshold = 0.9, nCentroids = 1, kmeansIters = 1, maxCluster = None)
        .withColumn("cosine", round(col("cosine"), 4))
    },
    // §2.4 row 65c — the MULTI-cluster (production) config, gated the
    // q_ann_ivf_recall way: identical vectors share an argmax centroid
    // deterministically, so the real clustered search must find every
    // planted duplicate pair — a constant-table oracle checks the
    // summary (20 planted copies at every sf under the id cut)
    "q_semdedup_planted" -> { (s, dir) =>
      val pairs = Dedup.semanticNearDups(embsWithDups(s, dir), "embedding", "vec_id",
          threshold = 0.999, nCentroids = 8, kmeansIters = 2)
        .select(col("id_a"), col("id_b"), lit(1).as("hit"))
      val planted = embs(s, dir)
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("id_a"), (col("vec_id") + 100000).as("id_b"))
      planted
        .join(pairs, Seq("id_a", "id_b"), "left")
        .agg(
          count(lit(1)).as("n_planted"),
          coalesce(sum(col("hit")), lit(0)).cast("long").as("n_found"))
        .select(
          col("n_planted"), col("n_found"),
          (col("n_planted") === col("n_found")).cast("int").as("all_found"))
    },
    // §2.4 row 65b — the semantically deduplicated corpus (lowest-id
    // keeper): every planted copy must vanish, its original survive
    "q_semdedup_rows" -> { (s, dir) =>
      Dedup.dropSemanticDuplicates(embsWithDups(s, dir), "embedding", "vec_id",
          threshold = 0.9, nCentroids = 1, kmeansIters = 1, maxCluster = None)
        .select("vec_id")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_embed_normalize" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, ve, sqrt(list_dot_product(ve, ve)) AS nrm FROM v)
        |SELECT vec_id,
        |       round(nrm, 6) AS norm,
        |       round(ve[1] / nrm, 6) AS e0,
        |       round(ve[2] / nrm, 6) AS e1,
        |       round(ve[3] / nrm, 6) AS e2,
        |       round(ve[4] / nrm, 6) AS e3
        |FROM n""".stripMargin,
    "q_embed_quantize" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, ve,
        |         list_max(list_transform(ve, x -> abs(x))) AS scale
        |  FROM v)
        |SELECT vec_id,
        |       round(scale, 6) AS scale,
        |       CASE WHEN scale = 0
        |            THEN to_json(list_transform(ve, x -> 0))::VARCHAR
        |            ELSE to_json(list_transform(ve,
        |                   x -> round(x / scale * 127)::TINYINT))::VARCHAR
        |       END AS q_json
        |FROM s""".stripMargin,
    "q_semdedup_pairs" ->
      """WITH all_e AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding FROM embeddings
        |  WHERE vec_id % 25 = 0 AND vec_id < 500),
        |v AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve
        |  FROM all_e)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_dot_product(a.ve, b.ve) /
        |             (sqrt(list_dot_product(a.ve, a.ve)) *
        |              sqrt(list_dot_product(b.ve, b.ve))), 4) AS cosine
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.ve, b.ve) /
        |      (sqrt(list_dot_product(a.ve, a.ve)) *
        |       sqrt(list_dot_product(b.ve, b.ve))) >= 0.9""".stripMargin,
    // 20 = count of vec_id % 25 == 0 under the vec_id < 500 cut — fixed
    // at every sf (the embeddings table ids are 0..N with N >= 499)
    "q_semdedup_planted" ->
      "SELECT 20::BIGINT AS n_planted, 20::BIGINT AS n_found, 1 AS all_found",
    "q_semdedup_rows" ->
      """WITH all_e AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding FROM embeddings
        |  WHERE vec_id % 25 = 0 AND vec_id < 500),
        |v AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve
        |  FROM all_e),
        |losers AS (
        |  SELECT DISTINCT greatest(a.vec_id, b.vec_id) AS id_b
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.ve, b.ve) /
        |        (sqrt(list_dot_product(a.ve, a.ve)) *
        |         sqrt(list_dot_product(b.ve, b.ve))) >= 0.9)
        |SELECT vec_id FROM all_e
        |WHERE vec_id NOT IN (SELECT id_b FROM losers)""".stripMargin
  )
}
