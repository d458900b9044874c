package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Embeddings, Pq}

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
    // §2.4 row 112 — JL random projection: every projected coordinate of
    // every vector re-derived by the oracle from the SAME portable
    // md5-hash Rademacher sign matrix (64-d → 16-d over the embeddings
    // table; round(6) absorbs the sum-order double noise)
    "q_embed_project" -> { (s, dir) =>
      Embeddings.randomProject(embs(s, dir), "embedding", outDim = 16)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "p")))
        .select(col("vec_id"), col("j"), round(col("p"), 6).as("p"))
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
    },
    // §2.4 row 92a — PQ encode against a PLANTED codebook (constant
    // codewords, asymmetric levels so no data value sits on a decision
    // midpoint): every code re-derived value-exactly in DuckDB — the
    // argmin agrees bit-for-bit because both engines run the same
    // element-order double arithmetic
    "q_pq_encode" -> { (s, dir) =>
      Pq.encode(embs(s, dir).select("vec_id", "embedding"),
          "embedding", plantedPqCodebook(s))
        .select(col("vec_id"),
          element_at(col("pq_code"), 1).as("c0"),
          element_at(col("pq_code"), 2).as("c1"))
    },
    // §2.4 row 92b — ADC top-k with the planted codebook: per-query
    // distance TABLES + m positional lookups per corpus row; the oracle
    // re-derives tables, lookups, and the id-tiebroken rank
    "q_pq_topk" -> { (s, dir) =>
      val e = embs(s, dir).select("vec_id", "embedding")
      val cb = plantedPqCodebook(s)
      Pq.adcTopK(Pq.encode(e, "embedding", cb),
          e.filter(col("vec_id") < 10), "embedding", "vec_id", cb, k = 5)
        .withColumn("adc_dist", round(col("adc_dist"), 6))
    },
    // §2 row 153 (IVF arm) — forget over the persisted IVF artifacts:
    // centroids are DOC-FREE (they stay), the assignment table is
    // per-doc rows, so Forget.removeIds ≡ a re-assignment of the
    // reduced corpus under the same centroids; probing the forgotten
    // table in the EXACT degenerate mode (nProbe = nCentroids) must
    // reproduce brute-force top-k over the reduced corpus — the
    // q_ann_ivf_exact strategy, independent of centroid placement, so
    // DuckDB re-derives it without replicating k-means. A removed
    // vector appearing in any top-5 hash-mismatches
    "q_forget_ivf" -> { (s, dir) =>
      val prior = embs(s, dir).select("vec_id", "embedding")
        .filter(col("vec_id") < 400)
      val cDir = java.nio.file.Files
        .createTempDirectory("graft-ivf-cent").toString
      graft.operators.Similarity.saveCentroids(
        graft.operators.Similarity.kmeansCentroids(
          prior, "embedding", "vec_id", nCentroids = 16, iters = 2), cDir)
      val cents = graft.operators.Similarity.loadCentroids(s, cDir)
      val aDir = java.nio.file.Files
        .createTempDirectory("graft-ivf-assign").toString
      graft.operators.Similarity.ivfAssignWith(prior, "embedding", cents)
        .write.mode("overwrite").parquet(aDir)
      val kept = graft.operators.Forget.removeIds(
        s.read.parquet(aDir), "vec_id",
        prior.filter(col("vec_id") % 6 === 0), "vec_id")
      graft.operators.Similarity.ivfTopKAssigned(
          kept, embs(s, dir).filter(col("vec_id") < 10),
          "embedding", "vec_id", cents, k = 5, nProbe = 16)
        .withColumn("score", round(col("score"), 4))
    },
    // §2 row 153 (PQ arm) — forget over the persisted PQ codes table:
    // the codebook is doc-free, codes are per-doc rows (removeIds ≡
    // re-encode of the reduced corpus); the post-forget ADC probe with
    // the PLANTED codebook is pinned value-exactly against the oracle's
    // rebuild from the reduced embedding set — a removed vector
    // surfacing in any top-5, or a survivor's rank shifting, mismatches
    "q_forget_pq" -> { (s, dir) =>
      val prior = embs(s, dir).select("vec_id", "embedding")
        .filter(col("vec_id") < 400)
      val cb = plantedPqCodebook(s)
      val out = java.nio.file.Files
        .createTempDirectory("graft-pq-codes").toString
      Pq.encode(prior, "embedding", cb)
        .write.mode("overwrite").parquet(out)
      val kept = graft.operators.Forget.removeIds(
        s.read.parquet(out), "vec_id",
        prior.filter(col("vec_id") % 6 === 0), "vec_id")
      Pq.adcTopK(kept, embs(s, dir).filter(col("vec_id") < 10),
          "embedding", "vec_id", cb, k = 5)
        .withColumn("adc_dist", round(col("adc_dist"), 6))
    },
    // §2.4 row 92c — the REAL trained pipeline (fused per-subspace L2
    // k-means → encode → ADC candidates → exact re-rank) as recall@5
    // against exact L2 top-k: every stage deterministic, so the
    // thresholded summary is a constant the oracle compares value-
    // exactly (the q_ann_ivf_recall strategy). Measured recall:
    // 1.0 (sf0.001) / 1.0 (sf0.01) / 0.94 (sf0.1) at m=16, kc=150.
    "q_pq_recall" -> { (s, dir) =>
      val e = embs(s, dir).select("vec_id", "embedding")
      Pq.adcRecallSummary(e, e.filter(col("vec_id") < 10), "embedding", "vec_id",
          k = 5, kCandidates = 150, subspaces = 16, codebookSize = 16,
          iters = 2, minRecall = 0.9)
        .select("n_queries", "n_truth", "recall_ok")
    },
    // §2 row 167 — IVF drift report, the retrain-now signal: PLANTED
    // centroids (the first 16 embeddings — DuckDB re-derives argmax-
    // cosine assignment without replicating k-means), the build-time
    // reference persisted alongside them via saveCentroids, then a
    // planted drifted drop (50 clones of vector 7) concentrated into
    // bucket 7 — its occupancy_ratio must rise above 1 and its
    // mean_cos_drop go negative (clones sit AT the centroid), both
    // re-derived exactly by the oracle
    "q_ivf_drift" -> { (s, dir) =>
      import graft.operators.Similarity
      val e = embs(s, dir).select("vec_id", "embedding")
      val cents = e.filter(col("vec_id") < 16).select(
        col("vec_id").as("centroid_id"),
        transform(col("embedding"), x => x.cast("double")).as("cv"))
      val build = e.filter(col("vec_id") < 400)
      val cDir = java.nio.file.Files
        .createTempDirectory("graft-ivf-drift").toString
      Similarity.saveCentroids(cents, cDir, Some(
        Similarity.ivfAssignmentStats(
          Similarity.ivfAssignWith(build, "embedding", cents),
          "embedding", cents)))
      val loaded = Similarity.loadCentroids(s, cDir)
      val clones = s.range(900000L, 900050L).select(col("id").as("vec_id"))
        .crossJoin(e.filter(col("vec_id") === 7).select("embedding"))
      val now = build.unionByName(clones)
      val report = Similarity.ivfDriftReport(
        Similarity.ivfAssignWith(now, "embedding", loaded),
        "embedding", loaded, Similarity.loadIvfReference(s, cDir))
      val b7 = report.filter(col("centroid_id") === 7)
        .select("occupancy_ratio", "mean_cos_drop").collect().head
      require(b7.getDouble(0) > 1.0 && b7.getDouble(1) < 0.0,
        s"q_ivf_drift: planted drift did not move bucket 7's metrics ($b7)")
      report.select(
        col("centroid_id"), col("n_ref"), col("n_now"),
        round(col("occupancy_ratio"), 6).as("occupancy_ratio"),
        round(col("mean_cos_ref"), 6).as("mean_cos_ref"),
        round(col("mean_cos_now"), 6).as("mean_cos_now"),
        (round(col("mean_cos_drop"), 6) + lit(0.0)).as("mean_cos_drop"))
    },
    // §2 row 171 (r18) — PQ drift report, q_ivf_drift's codebook twin:
    // the PLANTED 2×4 constant codebook (DuckDB re-derives the argmin
    // encode), the build-time pqCodeStats reference persisted alongside
    // the codebooks, then the same planted drifted drop (50 clones of
    // vector 7) — vector 7's codeword in EACH subspace must gain
    // occupancy above 1, all metrics re-derived exactly by the oracle
    "q_pq_drift" -> { (s, dir) =>
      val e = embs(s, dir).select("vec_id", "embedding")
      val cb = plantedPqCodebook(s)
      val build = e.filter(col("vec_id") < 400)
      val cbDir = java.nio.file.Files
        .createTempDirectory("graft-pq-drift").toString
      Pq.saveCodebooks(cb, cbDir, Some(
        Pq.pqCodeStats(Pq.encode(build, "embedding", cb), "embedding", cb)))
      val loaded = Pq.loadCodebooks(s, cbDir)
      // the drifted drop: 50 constant-0.5 vectors (0.5 is float-exact,
      // so the oracle's 0.5::DOUBLE matches the float->double cast
      // bit-for-bit); they encode to the 0.55-level codeword, NOT the
      // mean-nearest code that dominates the natural embeddings
      val cloneVec = array((0 until 64).map(_ => lit(0.5f)): _*)
      val clones = s.range(900000L, 900050L)
        .select(col("id").as("vec_id"), cloneVec.as("embedding"))
      val now = build.unionByName(clones)
      // the report is codebook-sized (m × k ≤ 8 rows) but its plan is a
      // full encode + stats pass over the corpus — COLLECT it once and
      // run every assert below on the local rows (the q_skip_append
      // collect-once convention; the r20 spelling re-ran the drift pass
      // per assert consumer: 2 clone-code probes + the occupancy count
      // + the returned frame = 4 corpus passes). Localized by hand with
      // a nullability-RELAXED schema: report columns like
      // occupancy_ratio are NULL for codes with no reference members,
      // and Similarity.localize would reject those rows against the
      // plan's non-nullable arithmetic types.
      val rep0 = Pq.pqDriftReport(
        Pq.encode(now, "embedding", loaded), "embedding", loaded,
        Pq.loadPqReference(s, cbDir))
      val localRows = rep0.collect()
      val report = s.createDataFrame(
        s.sparkContext.parallelize(localRows.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(
          rep0.schema.map(_.copy(nullable = true))))
      val fi = rep0.schema.fieldIndex _
      val repRows = localRows.map(r =>
        (r.getInt(fi("subspace")), r.getLong(fi("code"))) -> r).toMap
      // planted drift visible two ways, robust at every sf: the clone
      // codeword gains exactly the 50 clones (encode is per-row
      // deterministic, build rows unchanged), and some previously
      // dominant codeword's occupancy dilutes below 1
      val cloneCodes = Pq.encode(
          clones.limit(1), "embedding", cb)
        .select(col("pq_code")).collect().head.getSeq[Long](0)
      cloneCodes.zipWithIndex.foreach { case (c, j) =>
        val r = repRows((j, c))
        val gain = r.getLong(fi("n_now")) - r.getLong(fi("n_ref"))
        require(gain == 50L,
          s"q_pq_drift: clone codeword subspace=$j code=$c did not gain " +
            s"50 ($gain)")
      }
      // SQL `< 1.0` semantics: a NULL ratio never satisfies the filter
      require(localRows.exists(r =>
          Option(r.getAs[java.lang.Double](fi("occupancy_ratio")))
            .exists(_ < 1.0)),
        "q_pq_drift: planted drift diluted no codeword below build share")
      report.select(
        col("subspace"), col("code"), col("n_ref"), col("n_now"),
        round(col("occupancy_ratio"), 6).as("occupancy_ratio"),
        round(col("mean_err_ref"), 6).as("mean_err_ref"),
        round(col("mean_err_now"), 6).as("mean_err_now"),
        (round(col("mean_err_rise"), 6) + lit(0.0)).as("mean_err_rise"))
    }
  )

  /** Constant-codeword planted codebook for the value-exact PQ gates:
    * m=2 subspaces × k=4 codes over the 64-dim embeddings; levels are
    * deliberately NOT symmetric around 0 (subvector means cluster at 0,
    * which would sit exactly on a symmetric decision midpoint). */
  private[gates] val PqGateLevels = Seq(-0.75, -0.25, 0.1, 0.55)

  private[gates] def plantedPqCodebook(s: SparkSession): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("subspace",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("code",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false),
        nullable = false)))
    val rows = for {
      j <- 0 until 2
      (a, c) <- PqGateLevels.zipWithIndex
    } yield org.apache.spark.sql.Row(j, c.toLong, Seq.fill(32)(a))
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

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
    "q_embed_project" ->
      """WITH m AS (
        |  SELECT j, i,
        |         CASE WHEN (('0x' || substr(md5('jl:' || j || ':' || i), 1, 15))::BIGINT
        |                    % 2) = 0
        |              THEN 1.0 / sqrt(16.0) ELSE -1.0 / sqrt(16.0) END AS w
        |  FROM range(0, 16) t1(j) CROSS JOIN range(0, 64) t2(i)
        |)
        |SELECT e.vec_id, CAST(m.j AS INT) AS j,
        |       round(sum(m.w * e.embedding[m.i + 1]), 6) AS p
        |FROM embeddings e CROSS JOIN m
        |GROUP BY e.vec_id, m.j""".stripMargin,
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
        |WHERE vec_id NOT IN (SELECT id_b FROM losers)""".stripMargin,
    "q_pq_encode" -> s"""$pqEncodeCtes
        |SELECT vec_id, c0, c1 FROM enc""".stripMargin,
    "q_pq_topk" -> s"""$pqEncodeCtes,
        |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |      WHERE vec_id < 10),
        |qt AS MATERIALIZED (
        |  SELECT query_id, code,
        |         list_sum(list_transform(range(1, 33),
        |           i -> (qv[i]::DOUBLE - a) * (qv[i]::DOUBLE - a))) AS dlo,
        |         list_sum(list_transform(range(33, 65),
        |           i -> (qv[i]::DOUBLE - a) * (qv[i]::DOUBLE - a))) AS dhi
        |  FROM q CROSS JOIN cb),
        |s AS (
        |  SELECT t0.query_id, enc.vec_id AS neighbor_id,
        |         t0.dlo + t1.dhi AS adc_dist
        |  FROM enc
        |  JOIN qt t0 ON t0.code = enc.c0
        |  JOIN qt t1 ON t1.query_id = t0.query_id AND t1.code = enc.c1),
        |r AS (
        |  SELECT query_id, neighbor_id, adc_dist,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY adc_dist ASC, neighbor_id) AS rn
        |  FROM s)
        |SELECT query_id, neighbor_id, round(adc_dist, 6) AS adc_dist
        |FROM r WHERE rn <= 5""".stripMargin,
    // recall threshold holds at every sf dir (see the queries entry)
    "q_pq_recall" ->
      "SELECT 10::BIGINT AS n_queries, 50::BIGINT AS n_truth, 1 AS recall_ok",
    // exact-degenerate probe of the FORGOTTEN assignment table ≡ brute
    // force over the reduced corpus (queries stay the full <10 set)
    "q_forget_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings WHERE vec_id < 400 AND vec_id % 6 <> 0),
        |q AS (
        |  SELECT vec_id AS query_id, list_transform(embedding, x -> x::DOUBLE) AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |s AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |         list_dot_product(qv, v) /
        |         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS score
        |  FROM q, e),
        |r AS (
        |  SELECT query_id, neighbor_id, score,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY score DESC, neighbor_id) AS rn
        |  FROM s)
        |SELECT query_id, neighbor_id, round(score, 4) AS score
        |FROM r WHERE rn <= 5""".stripMargin,
    // ADC top-k over codes re-derived from the REDUCED embedding set
    // (the forget ≡ rebuild contract); queries stay the full <10 set
    "q_forget_pq" -> s"""${pqEncodeCtesFrom(
          "(SELECT * FROM embeddings WHERE vec_id < 400 AND vec_id % 6 <> 0)")},
        |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |      WHERE vec_id < 10),
        |qt AS MATERIALIZED (
        |  SELECT query_id, code,
        |         list_sum(list_transform(range(1, 33),
        |           i -> (qv[i]::DOUBLE - a) * (qv[i]::DOUBLE - a))) AS dlo,
        |         list_sum(list_transform(range(33, 65),
        |           i -> (qv[i]::DOUBLE - a) * (qv[i]::DOUBLE - a))) AS dhi
        |  FROM q CROSS JOIN cb),
        |s AS (
        |  SELECT t0.query_id, enc.vec_id AS neighbor_id,
        |         t0.dlo + t1.dhi AS adc_dist
        |  FROM enc
        |  JOIN qt t0 ON t0.code = enc.c0
        |  JOIN qt t1 ON t1.query_id = t0.query_id AND t1.code = enc.c1),
        |r AS (
        |  SELECT query_id, neighbor_id, adc_dist,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY adc_dist ASC, neighbor_id) AS rn
        |  FROM s)
        |SELECT query_id, neighbor_id, round(adc_dist, 6) AS adc_dist
        |FROM r WHERE rn <= 5""".stripMargin,
    // argmax-cosine assignment re-derived per corpus (planted centroids
    // = the first 16 embeddings; min-centroid tiebreak matches the
    // fold's strictly-greater update over the id-sorted array), then
    // the same per-bucket stats and exact cross-product ratio
    "q_ivf_drift" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 16),
        |build AS (SELECT vec_id, v FROM e WHERE vec_id < 400),
        |nowc AS (
        |  SELECT vec_id, v FROM build
        |  UNION ALL
        |  SELECT 900000 + i AS vec_id, (SELECT v FROM e WHERE vec_id = 7) AS v
        |  FROM (SELECT unnest(range(50)) AS i)),
        |asg_ref AS (
        |  SELECT centroid_id, cos FROM (
        |    SELECT b.vec_id, c.centroid_id,
        |           list_dot_product(v, cv) /
        |             (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS cos,
        |           row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |             list_dot_product(v, cv) /
        |               (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC,
        |             c.centroid_id) AS rn
        |    FROM build b CROSS JOIN c) WHERE rn = 1),
        |asg_now AS (
        |  SELECT centroid_id, cos FROM (
        |    SELECT b.vec_id, c.centroid_id,
        |           list_dot_product(v, cv) /
        |             (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS cos,
        |           row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |             list_dot_product(v, cv) /
        |               (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC,
        |             c.centroid_id) AS rn
        |    FROM nowc b CROSS JOIN c) WHERE rn = 1),
        |ref AS (SELECT centroid_id, count(*)::BIGINT AS n_ref, avg(cos) AS m_ref
        |        FROM asg_ref GROUP BY 1),
        |nw AS (SELECT centroid_id, count(*)::BIGINT AS n_now, avg(cos) AS m_now
        |       FROM asg_now GROUP BY 1),
        |t AS (SELECT (SELECT sum(n_ref) FROM ref) AS t_ref,
        |             (SELECT sum(n_now) FROM nw) AS t_now)
        |SELECT centroid_id,
        |       coalesce(n_ref, 0) AS n_ref,
        |       coalesce(n_now, 0) AS n_now,
        |       CASE WHEN coalesce(n_ref, 0) = 0 OR t_now = 0 THEN NULL
        |            ELSE round((coalesce(n_now, 0) * t_ref)::DOUBLE /
        |                       (n_ref * t_now)::DOUBLE, 6) END AS occupancy_ratio,
        |       round(m_ref, 6) AS mean_cos_ref,
        |       round(m_now, 6) AS mean_cos_now,
        |       round(m_ref - m_now, 6) + 0.0 AS mean_cos_drop
        |FROM ref FULL OUTER JOIN nw USING (centroid_id) CROSS JOIN t""".stripMargin,
    // planted-codebook argmin encode re-derived per corpus (build and
    // build+clones); the chosen code's distance IS its quantization
    // error, folded per (subspace, code) with per-subspace totals
    "q_pq_drift" -> {
      val values = PqGateLevels.zipWithIndex
        .map { case (a, c) => s"(${c}::BIGINT, ${a}::DOUBLE)" }.mkString(", ")
      def encodeStats(src: String, suffix: String): String =
        s"""dists_$suffix AS MATERIALIZED (
           |  SELECT vec_id, code,
           |         list_sum(list_transform(range(1, 33),
           |           i -> (v[i] - a) * (v[i] - a))) AS d0,
           |         list_sum(list_transform(range(33, 65),
           |           i -> (v[i] - a) * (v[i] - a))) AS d1
           |  FROM $src CROSS JOIN cb),
           |enc_$suffix AS MATERIALIZED (
           |  SELECT a.vec_id, a.code AS c0, a.d0 AS e0, b.code AS c1, b.d1 AS e1
           |  FROM (SELECT vec_id, code, d0,
           |          row_number() OVER (PARTITION BY vec_id ORDER BY d0, code) AS rn
           |        FROM dists_$suffix) a
           |  JOIN (SELECT vec_id, code, d1,
           |          row_number() OVER (PARTITION BY vec_id ORDER BY d1, code) AS rn
           |        FROM dists_$suffix) b
           |    ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 1),
           |stats_$suffix AS (
           |  SELECT 0::INT AS subspace, c0 AS code, count(*)::BIGINT AS n, avg(e0) AS me
           |  FROM enc_$suffix GROUP BY c0
           |  UNION ALL
           |  SELECT 1::INT, c1, count(*)::BIGINT, avg(e1)
           |  FROM enc_$suffix GROUP BY c1),
           |tot_$suffix AS (
           |  SELECT subspace, sum(n)::BIGINT AS t FROM stats_$suffix GROUP BY 1)"""
          .stripMargin
      s"""WITH cb(code, a) AS (VALUES $values),
         |e AS (
         |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
         |  FROM embeddings),
         |build AS (SELECT vec_id, v FROM e WHERE vec_id < 400),
         |nowc AS (
         |  SELECT vec_id, v FROM build
         |  UNION ALL
         |  SELECT 900000 + i AS vec_id,
         |         list_transform(range(64), x -> 0.5::DOUBLE) AS v
         |  FROM (SELECT unnest(range(50)) AS i)),
         |${encodeStats("build", "r")},
         |${encodeStats("nowc", "w")}
         |SELECT subspace, code,
         |       coalesce(r.n, 0) AS n_ref,
         |       coalesce(w.n, 0) AS n_now,
         |       CASE WHEN coalesce(r.n, 0) = 0 OR coalesce(tw.t, 0) = 0 THEN NULL
         |            ELSE round((coalesce(w.n, 0) * tr.t)::DOUBLE /
         |                       (r.n * tw.t)::DOUBLE, 6) END AS occupancy_ratio,
         |       round(r.me, 6) AS mean_err_ref,
         |       round(w.me, 6) AS mean_err_now,
         |       round(w.me - r.me, 6) + 0.0 AS mean_err_rise
         |FROM stats_r r FULL OUTER JOIN stats_w w USING (subspace, code)
         |LEFT JOIN tot_r tr USING (subspace)
         |LEFT JOIN tot_w tw USING (subspace)""".stripMargin
    }
  )

  /** Shared CTEs for the planted-codebook PQ oracles: the 2×4 constant
    * codebook and per-subspace argmin codes, mirroring Pq.encode's
    * element-order double arithmetic ((x−a)·(x−a), NOT pow — libm pow
    * need not be the exact product). `src` parameterizes the encoded
    * corpus (full table for the build gates, the reduced set for the
    * forget rebuild). */
  private[gates] def pqEncodeCtes: String = pqEncodeCtesFrom("embeddings")

  private def pqEncodeCtesFrom(src: String): String = {
    val values = PqGateLevels.zipWithIndex
      .map { case (a, c) => s"($c, ${a}::DOUBLE)" }.mkString(", ")
    // distances computed in a plain cross join (a lambda cannot reference
    // a CORRELATED outer table in DuckDB, so no scalar-subquery argmin);
    // the argmin is a (dist, code)-ordered window
    s"""WITH cb(code, a) AS (VALUES $values),
       |dists AS MATERIALIZED (
       |  SELECT e.vec_id, cb.code,
       |         list_sum(list_transform(range(1, 33),
       |           i -> (e.embedding[i]::DOUBLE - a) * (e.embedding[i]::DOUBLE - a))) AS d0,
       |         list_sum(list_transform(range(33, 65),
       |           i -> (e.embedding[i]::DOUBLE - a) * (e.embedding[i]::DOUBLE - a))) AS d1
       |  FROM $src e CROSS JOIN cb),
       |enc AS MATERIALIZED (
       |  SELECT a.vec_id, a.code AS c0, b.code AS c1
       |  FROM (SELECT vec_id, code,
       |          row_number() OVER (PARTITION BY vec_id ORDER BY d0, code) AS rn
       |        FROM dists) a
       |  JOIN (SELECT vec_id, code,
       |          row_number() OVER (PARTITION BY vec_id ORDER BY d1, code) AS rn
       |        FROM dists) b
       |    ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 1)""".stripMargin
  }
}
