package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/**
 * Document deduplication for large-scale training-data pipelines.
 *
 * Exact dedup is a hash-groupBy (partial aggregation + one shuffle on the
 * fingerprint). Near-dup detection is MinHash + banded LSH: candidate
 * generation shuffles ∝ docs × bands and pair verification happens only
 * inside LSH buckets — never an all-pairs cross join. All hashing goes
 * through the engine-portable MD5 primitives in [[Hashing]] so results are
 * reproducible by any engine (and by the DuckDB correctness oracle).
 *
 * Everything below `nearDuplicates` is a pure Catalyst expression chain;
 * the only shuffles are the band-bucket self-join and the final distinct.
 */
object Dedup {

  // ---------------------------------------------------------------- exact

  /**
   * Exact deduplication on normalized text: one output row per distinct
   * normalized document, keeping the smallest id as the deterministic
   * keeper and counting collapsed duplicates.
   *
   * Scale shape: groupBy on a 32-char fingerprint → map-side partial agg,
   * single hash shuffle; no driver participation.
   */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(Hashing.normalizeText(col(textCol))).as("fingerprint"))
      .agg(
        min(col(idCol)).as("keeper_id"),
        count(lit(1)).as("n_docs")
      )

  // -------------------------------------------------------------- minhash

  /**
   * Word k-shingles of normalized text, as an array column. Documents with
   * fewer than k words fall back to a single whole-text shingle so every
   * document has a non-empty shingle set.
   */
  def shingles(textCol: Column, k: Int = 3): Column = {
    val words = Hashing.normalizedWords(textCol)
    when(size(words) < k, array(Hashing.normalizeText(textCol)))
      .otherwise(
        transform(
          sequence(lit(0), size(words) - k),
          j => concat_ws(" ", slice(words, j + 1, lit(k)))
        )
      )
  }

  /**
   * MinHash signature over a shingle array: element i is
   * min over shingles of md5_60(i || ':' || shingle). A signature is an
   * array<long> of length numHashes; agreement fraction between two
   * signatures estimates Jaccard similarity.
   */
  def minHashSignature(shinglesCol: Column, numHashes: Int = 16): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shinglesCol, s => Hashing.md5Long60Seeded(s, i)))
    )

  /** Per-document MinHash signatures: (id, signature). */
  def minHashSignatures(
    df: DataFrame,
    textCol: String,
    idCol: String,
    k: Int = 3,
    numHashes: Int = 16
  ): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      minHashSignature(shingles(col(textCol), k), numHashes).as("signature")
    )

  /**
   * Banded-LSH candidate pairs from a signature table: signatures are cut
   * into `bands` bands of numHashes/bands rows; documents sharing any
   * band's values become a candidate pair.
   *
   * Scale shape: explode to docs × bands rows, self-join on (band, key) —
   * shuffle ∝ docs × bands, candidates ∝ colliding pairs only. Buckets
   * larger than maxBucket are dropped (a degenerate key — e.g. boilerplate
   * text — would otherwise produce a quadratic pair blowup); dropped
   * buckets are a completeness tradeoff the caller sizes.
   */
  def lshCandidates(
    signatures: DataFrame,
    numHashes: Int = 16,
    bands: Int = 4,
    maxBucket: Option[Int] = None
  ): DataFrame = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    val rows = numHashes / bands
    val banded = signatures.select(
      col("doc_id"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b =>
            struct(
              b.as("band"),
              concat_ws(",",
                transform(slice(col("signature"), b * rows + 1, lit(rows)),
                  v => v.cast("string"))).as("band_key")
            )
        )
      ).as("bk")
    ).select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))

    val filtered = maxBucket.fold(banded) { cap =>
      val counted = banded
        .groupBy("band", "band_key").agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") <= cap)
        .drop("bucket_n")
      banded.join(counted, Seq("band", "band_key"))
    }

    val a = filtered.as("a")
    val b = filtered.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /**
   * Verify candidate pairs with exact n-gram Jaccard similarity, computed
   * only for LSH candidates (never all pairs). Returns
   * (id_a, id_b, jaccard) for pairs at or above the threshold.
   */
  def jaccardVerify(
    candidates: DataFrame,
    df: DataFrame,
    textCol: String,
    idCol: String,
    k: Int = 3,
    threshold: Double = 0.8
  ): DataFrame = {
    val sets = df.select(
      col(idCol).as("doc_id"),
      array_distinct(shingles(col(textCol), k)).as("sh")
    )
    val inter = size(array_intersect(col("sa"), col("sb")))
    val union = size(col("sa")) + size(col("sb")) - inter
    candidates
      .join(sets.withColumnsRenamed(Map("doc_id" -> "id_a", "sh" -> "sa")), "id_a")
      .join(sets.withColumnsRenamed(Map("doc_id" -> "id_b", "sh" -> "sb")), "id_b")
      .select(
        col("id_a"), col("id_b"),
        (inter.cast("double") / union.cast("double")).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }

  /**
   * End-to-end MinHash-LSH near-duplicate detection:
   * shingle → signature → banded candidates → in-bucket Jaccard verify.
   */
  def nearDuplicates(
    df: DataFrame,
    textCol: String,
    idCol: String,
    k: Int = 3,
    numHashes: Int = 16,
    bands: Int = 4,
    threshold: Double = 0.8,
    maxBucket: Option[Int] = None
  ): DataFrame = {
    val sigs = minHashSignatures(df, textCol, idCol, k, numHashes)
    val cands = lshCandidates(sigs, numHashes, bands, maxBucket)
    jaccardVerify(cands, df, textCol, idCol, k, threshold)
  }

  // -------------------------------------------------------------- simhash

  /**
   * 60-bit SimHash of normalized words: every word votes ±1 on each bit of
   * its 60-bit hash; bits with a positive vote sum are set. Near-duplicate
   * documents have small Hamming distance between SimHashes.
   *
   * Implemented as nested Catalyst lambda expressions over a precomputed
   * word-hash array (hash each word once, not once per bit).
   */
  def simHash(textCol: Column): Column = {
    val wordHashes = transform(Hashing.normalizedWords(textCol), w => Hashing.md5Long60(w))
    simHashOfHashes(wordHashes)
  }

  /** SimHash packing from an array<long> of word hashes. */
  private def simHashOfHashes(wordHashes: Column): Column =
    aggregate(
      sequence(lit(0), lit(59)),
      lit(0L),
      (acc, b) => {
        val vote = aggregate(
          wordHashes,
          lit(0L),
          (v, h) =>
            v + when(call_function("shiftright", h, b) % 2 === 1, lit(1L))
              .otherwise(lit(-1L))
        )
        acc + when(vote > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))
      }
    )

  /** Per-document SimHash table: (doc_id, simhash). */
  def simHashes(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), simHash(col(textCol)).as("simhash"))

  /**
   * SimHash near-dup pairs by banding the 60-bit hash into `bands`
   * 15-bit chunks (pigeonhole: Hamming distance < bands guarantees an
   * exact match on some chunk). Verified with exact Hamming distance via
   * bit_count(xor) — only inside chunk buckets, never all pairs.
   */
  def simHashNearDups(
    simhashes: DataFrame,
    maxHamming: Int = 3,
    bands: Int = 4
  ): DataFrame = {
    val chunkBits = 60 / bands
    val banded = simhashes.select(
      col("doc_id"), col("simhash"),
      explode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => struct(
            b.as("band"),
            (call_function("shiftright", col("simhash"), b * chunkBits) %
              (1L << chunkBits)).as("band_key"))))
        .as("bk")
    ).select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.band_key"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---------------------------------------------- embedding near-dup (LSH)

  /**
   * Deterministic ±1 hyperplane weight for (plane, dimension), derived
   * from the portable MD5 hash so the oracle can re-derive it.
   */
  private def planeWeight(plane: Column, dim: Column): Column =
    when(
      Hashing.md5Long60(concat(plane.cast("string"), lit(":"), dim.cast("string"))) % 2 === 0,
      lit(1.0)
    ).otherwise(lit(-1.0))

  /**
   * Sign-random-projection bucket key: for each of `planes` hyperplanes
   * with deterministic ±1 weights, the sign of the projection becomes one
   * character of the key. Cosine-similar vectors collide with high
   * probability.
   */
  def hyperplaneBucket(vecCol: Column, planes: Int = 16): Column =
    concat_ws("",
      transform(
        sequence(lit(0), lit(planes - 1)),
        p => {
          val dot = aggregate(
            zip_with(vecCol, sequence(lit(0), size(vecCol) - 1),
              (x, i) => x.cast("double") * planeWeight(p, i)),
            lit(0.0),
            (acc, x) => acc + x
          )
          when(dot > 0, lit("1")).otherwise(lit("0"))
        }
      ))

  /**
   * Embedding near-duplicate pairs: bucket by hyperplane signature (one
   * shuffle on the bucket key), generate pairs only inside buckets, verify
   * with exact cosine ≥ threshold.
   */
  def embeddingNearDup(
    df: DataFrame,
    vecCol: String,
    idCol: String,
    planes: Int = 16,
    threshold: Double = 0.9
  ): DataFrame = {
    val bucketed = df.select(
      col(idCol).as("vid"),
      col(vecCol).as("v"),
      hyperplaneBucket(col(vecCol), planes).as("bucket")
    )
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      .select(
        col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
