package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/**
 * Correctness gates for winnowing fingerprints (SURVEY.md §2 row 150,
 * Schleimer–Wilkerson–Aiken SIGMOD 2003).
 *
 * Oracle strategy: FULL re-derivation — DuckDB recomputes every
 * codepoint, every polynomial k-gram hash (the same base-257 /
 * 1e9+7 constants, spelled as a sum over inlined power literals), and
 * every window minimum with the rightmost-on-ties rule, then takes
 * the distinct selections. Nothing is a same-algorithm shortcut: the
 * engine's O(n) rolling hash + ring-buffer scan is checked against
 * the O(n·w) definitional join.
 *
 * Fixture: documents under id 120 cut to their first 200 normalized
 * codepoints (bounds the oracle's window join), plus planted rows —
 * an all-equal-hash run pinning the rightmost-tie rule, a short text
 * below k pinning emptiness, and re-cased/re-spaced twins pinning the
 * normalization story the pairs gate needs.
 */
object WinnowGates {

  private val K = 8
  private val W = 4

  /** documents (id < 120, text cut to 200 chars) ∪ planted rows. */
  private def fixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = LlmGates.docs(s, dir)
      .filter(col("doc_id") < 120)
      .select(col("doc_id"), substring(col("text"), 1, 200).as("text"))
    val planted = Seq(
      // constant k-gram hashes: every window's minimum is its RIGHTMOST
      // position — selected positions are exactly w-1 .. m-1
      (700001L, "aaaaaaaaaaaaaaaa"),
      // shorter than k codepoints -> zero fingerprints
      (700002L, "short"),
      // re-cased + re-spaced twins: normalized-identical, so their
      // fingerprint sets coincide (the pairs gate's planted copy)
      (700003L, "The Quick   Brown Fox\n\nJumps Over The Lazy Dog Tonight"),
      (700004L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    d.unionByName(planted)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2 row 150a — the selected fingerprints themselves
    "q_winnow" -> { (s, dir) =>
      Dedup.winnowTable(fixture(s, dir), "text", "doc_id", K, W)
    },
    // §2 row 150b — cross-document overlap pairs by shared distinct
    // fingerprint hashes (the planted twins must pair with a large
    // n_shared; natural boilerplate overlaps ride along)
    "q_winnow_pairs" -> { (s, dir) =>
      Dedup.winnowedOverlapPairs(fixture(s, dir), "text", "doc_id", K, W,
        minShared = 2)
    },
    // §2 row 150c — the cross-corpus arm: odd docs (never indexed) plus
    // UPPERCASED re-keyed copies of every 4th indexed doc (case folds
    // away in normalization, so the copies share their originals' full
    // fingerprint sets) vs the parquet-roundtripped winnow index of
    // the even docs
    "q_winnow_incr" -> { (s, dir) =>
      val prior = LlmGates.docs(s, dir)
        .filter(col("doc_id") < 120 && col("doc_id") % 2 === 0)
        .select(col("doc_id"), substring(col("text"), 1, 200).as("text"))
      val batch = LlmGates.docs(s, dir)
        .filter(col("doc_id") < 120 && col("doc_id") % 2 === 1)
        .select(col("doc_id"), substring(col("text"), 1, 200).as("text"))
        .unionByName(
          prior.filter(col("doc_id") % 4 === 0)
            .select((col("doc_id") + 500000).as("doc_id"),
              upper(col("text")).as("text")))
      val out = java.nio.file.Files
        .createTempDirectory("graft-winnowidx-gate").toString
      Dedup.winnowIndex(prior, "text", "doc_id", K, W)
        .write.mode("overwrite").parquet(out)
      Dedup.winnowedOverlapPairsAgainst(batch, s.read.parquet(out),
        "text", "doc_id", K, W, minShared = 2)
    },
    // §2 row 168d — winnow index GROW ≡ join surface: the index built
    // from two-thirds of the prior corpus, grown by the other third
    // via winnowIndexAppend (per-doc fingerprints, union ≡ rebuild),
    // probed with the same batch under the SAME oracle as q_winnow_incr
    "q_winnow_append" -> { (s, dir) =>
      val prior = LlmGates.docs(s, dir)
        .filter(col("doc_id") < 120 && col("doc_id") % 2 === 0)
        .select(col("doc_id"), substring(col("text"), 1, 200).as("text"))
      val batch = LlmGates.docs(s, dir)
        .filter(col("doc_id") < 120 && col("doc_id") % 2 === 1)
        .select(col("doc_id"), substring(col("text"), 1, 200).as("text"))
        .unionByName(
          prior.filter(col("doc_id") % 4 === 0)
            .select((col("doc_id") + 500000).as("doc_id"),
              upper(col("text")).as("text")))
      val out = java.nio.file.Files
        .createTempDirectory("graft-winnowapp-gate").toString
      Dedup.winnowIndex(
          prior.filter(col("doc_id") % 3 =!= 0), "text", "doc_id", K, W)
        .write.mode("overwrite").parquet(out)
      Dedup.winnowIndexAppend(s.read.parquet(out),
          prior.filter(col("doc_id") % 3 === 0), "text", "doc_id", K, W)
        .write.mode("overwrite").parquet(out + "-v2")
      Dedup.winnowedOverlapPairsAgainst(batch, s.read.parquet(out + "-v2"),
        "text", "doc_id", K, W, minShared = 2)
    },
    // §2 row 153 (winnow arm) — forget over the persisted winnow
    // index: fingerprints are per-doc independent and the (k, w)
    // constants are corpus-free, so Forget.removeIds ≡ a rebuild from
    // the reduced corpus, pinned ROW-FOR-ROW (the oracle re-derives
    // every k-gram hash and window argmin over the reduced fixture)
    "q_forget_winnow" -> { (s, dir) =>
      val prior = LlmGates.docs(s, dir)
        .filter(col("doc_id") < 120 && col("doc_id") % 2 === 0)
        .select(col("doc_id"), substring(col("text"), 1, 200).as("text"))
      graft.operators.Forget.removeIds(
        Dedup.winnowIndex(prior, "text", "doc_id", K, W),
        "doc_id", prior.filter(col("doc_id") % 6 === 0), "doc_id")
    }
  )

  /** 257^e mod 1e9+7 for e = 0..7, inlined so the oracle's k-gram
    * hash is a plain sum of products. */
  private val Pows = Seq(1L, 257L, 66049L, 16974593L, 362470373L,
    154885210L, 805498697L, 13163680L)

  /** The k-gram hash of the gram at 0-based `p` over codepoint list
    * `c` (1-based SQL indexing): Σ c[p+j+1]·257^(k−1−j) mod M. */
  private def hashSql: String =
    (0 until K).map(j => s"(c[p + ${j + 1}]::BIGINT) * ${Pows(K - 1 - j)}")
      .mkString("(", " + ", ") % 1000000007")

  /** The q_winnow/q_winnow_pairs fixture as a CTE body. */
  private val FixtureSrc: String =
    """  SELECT doc_id, substr(text, 1, 200) AS text FROM documents
      |  WHERE doc_id < 120
      |  UNION ALL
      |  SELECT * FROM (VALUES
      |    (700001::BIGINT, 'aaaaaaaaaaaaaaaa'),
      |    (700002::BIGINT, 'short'),
      |    (700003::BIGINT, 'The Quick   Brown Fox' || chr(10) || chr(10) ||
      |                     'Jumps Over The Lazy Dog Tonight'),
      |    (700004::BIGINT, 'the quick brown fox jumps over the lazy dog tonight')
      |  ) t(doc_id, text)""".stripMargin

  /** CTE chain deriving `sel$suffix` (the distinct winnow selections)
    * from an arbitrary source body: normalize → codepoints → k-gram
    * hashes → window argmin (hash ASC, pos DESC) → distinct. */
  private def selCte(srcBody: String, suffix: String = ""): String =
    s"""src$suffix AS (
       |$srcBody),
       |d$suffix AS (
       |  SELECT doc_id,
       |         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
       |  FROM src$suffix),
       |cp$suffix AS (
       |  SELECT doc_id,
       |         list_transform(range(1, len(s) + 1),
       |                        i -> unicode(substr(s, i, 1))) AS c,
       |         len(s) - $K + 1 AS m
       |  FROM d$suffix),
       |gpos$suffix AS (
       |  SELECT doc_id, c, m, unnest(range(0, greatest(m, 0))) AS p
       |  FROM cp$suffix),
       |grams$suffix AS (
       |  SELECT doc_id, p, $hashSql AS hash, m FROM gpos$suffix),
       |wins$suffix AS (
       |  SELECT doc_id, m, unnest(range(0, greatest(m - $W + 1, 1))) AS wi
       |  FROM (SELECT DISTINCT doc_id, m FROM grams$suffix)),
       |ranked$suffix AS (
       |  SELECT w.doc_id, w.wi, g.p, g.hash,
       |         row_number() OVER (PARTITION BY w.doc_id, w.wi
       |                            ORDER BY g.hash ASC, g.p DESC) AS rn
       |  FROM wins$suffix w
       |  JOIN grams$suffix g ON g.doc_id = w.doc_id
       |              AND g.p >= w.wi AND g.p < least(w.wi + $W, w.m)),
       |sel$suffix AS (
       |  SELECT DISTINCT doc_id, p AS pos, hash
       |  FROM ranked$suffix WHERE rn = 1)""".stripMargin

  private val oracleBase: Map[String, String] = Map(
    "q_winnow" ->
      s"WITH ${selCte(FixtureSrc)}\nSELECT doc_id, pos, hash FROM sel",
    "q_winnow_pairs" ->
      s"""WITH ${selCte(FixtureSrc)},
         |fp AS (SELECT DISTINCT doc_id, hash FROM sel),
         |ok AS (
         |  SELECT hash FROM fp
         |  GROUP BY hash HAVING count(*) BETWEEN 2 AND 1024)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       count(*) AS n_shared
         |FROM fp a
         |JOIN ok USING (hash)
         |JOIN fp b ON a.hash = b.hash AND a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |HAVING count(*) >= 2""".stripMargin,
    // both sides' fingerprints re-derived independently, then the
    // shared-hash pair count; the bucket filters mirror the engine's
    // per-side caps (no fixture bucket is near 1024, so full-count and
    // matched-count capping agree)
    "q_winnow_incr" -> {
      val priorSrc =
        """  SELECT doc_id, substr(text, 1, 200) AS text FROM documents
          |  WHERE doc_id < 120 AND doc_id % 2 = 0""".stripMargin
      val batchSrc =
        """  SELECT doc_id, substr(text, 1, 200) AS text FROM documents
          |  WHERE doc_id < 120 AND doc_id % 2 = 1
          |  UNION ALL
          |  SELECT doc_id + 500000, upper(substr(text, 1, 200)) FROM documents
          |  WHERE doc_id < 120 AND doc_id % 2 = 0 AND doc_id % 4 = 0""".stripMargin
      s"""WITH ${selCte(priorSrc, "p")},
         |${selCte(batchSrc, "b")},
         |fpp AS (SELECT DISTINCT doc_id, hash FROM selp),
         |fpb AS (SELECT DISTINCT doc_id, hash FROM selb),
         |okp AS (SELECT hash FROM fpp GROUP BY hash HAVING count(*) <= 1024),
         |okb AS (SELECT hash FROM fpb GROUP BY hash HAVING count(*) <= 1024)
         |SELECT b.doc_id AS batch_id, p.doc_id AS index_id,
         |       count(*) AS n_shared
         |FROM fpb b
         |JOIN okp ON okp.hash = b.hash
         |JOIN okb ON okb.hash = b.hash
         |JOIN fpp p ON p.hash = b.hash
         |GROUP BY 1, 2
         |HAVING count(*) >= 2""".stripMargin
    },
    "q_forget_winnow" -> {
      val reducedSrc =
        """  SELECT doc_id, substr(text, 1, 200) AS text FROM documents
          |  WHERE doc_id < 120 AND doc_id % 2 = 0 AND doc_id % 6 <> 0""".stripMargin
      s"""WITH ${selCte(reducedSrc)}
         |SELECT doc_id, pos, hash, $K AS k, $W AS w FROM sel""".stripMargin
    }
  )

  /** q_winnow_append probes the same semantics through a grown index —
    * same definitional oracle verbatim. */
  val oracleSql: Map[String, String] = oracleBase ++ Map(
    "q_winnow_append" -> oracleBase("q_winnow_incr"))
}
