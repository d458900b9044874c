package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{BpeEncodeExpr, BpeModel}

/**
 * Loadable byte-pair-encoding tokenization — REAL subword token counts
 * for the packing/binning/chunking operators, from a user-supplied
 * public-format model (GPT-2-style `merges.txt` + `vocab.json`; Radford
 * et al. 2019, and Sennrich et al. 2016, arXiv:1508.07909, for the
 * merge algorithm). The regex word-count proxy
 * ([[TextAnalysis.bpeishTokenCount]]) approximates budget arithmetic;
 * this makes it line up with what a trainer's tokenizer actually
 * produces.
 *
 * Scale shape: the model is metadata-sized (a 50k-merge GPT-2 file is
 * ~2 MB) and BROADCAST once per [[BpeTokenizer]]; encoding is a pure
 * stateless projection — no shuffle, no state, streaming-safe — whose
 * per-row cost is one regex pre-tokenization plus cached per-word
 * merges. Nothing here moves data: token ids land in the scan
 * projection, and every downstream operator (binning, packing,
 * chunking) consumes them with its own documented shuffle shape.
 *
 * Pre-tokenization is [[Bpe.PreTokenPattern]] — the GPT-2 category
 * split (letter runs, digit runs, punctuation runs, each with an
 * optional leading space, plus whitespace runs) minus its lookahead
 * (RE2-compatible, so the DuckDB oracle re-derives it verbatim).
 * Whitespace maps to the GPT-2 marker characters (' '→Ġ, \n→Ċ, \t→ĉ,
 * \r→č) before merging.
 */
object Bpe {

  /** GPT-2-style pre-token split, lookahead-free: ` ?letters | ?digits
    * | ?punct-run | whitespace-run`. Identical semantics under Java
    * regex and RE2 — the oracle uses this exact string. */
  val PreTokenPattern: String = " ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Read a `merges.txt`: one merge per line, two space-separated
    * symbols, rank = line order; `#…` header lines and blanks skipped.
    * Goes through the Hadoop FileSystem API, so local paths, HDFS, and
    * object stores all work; the file is driver-read metadata. */
  def loadMerges(spark: SparkSession, path: String): IndexedSeq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.stripLineEnd)
        .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
        .map { l =>
          val parts = l.split(" ", -1)
          require(parts.length == 2 && parts.forall(_.nonEmpty),
            s"merges line is not two space-separated symbols: '$l'")
          (parts(0), parts(1))
        }
        .toVector
    } finally in.close()
  }

  /** Read a `vocab.json` ({"token": id, …}) via Jackson (on the Spark
    * classpath) — handles escaped unicode, arbitrary key bytes. */
  def loadVocab(spark: SparkSession, path: String): Map[String, Int] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      require(node != null && node.isObject, s"vocab at $path is not a JSON object")
      val b = Map.newBuilder[String, Int]
      node.fields().forEachRemaining { e =>
        require(e.getValue.isIntegralNumber,
          s"vocab id for '${e.getKey}' is not an integer")
        b += (e.getKey -> e.getValue.intValue())
      }
      b.result()
    } finally in.close()
  }

  /** Derive the vocabulary a merges list implies: the base alphabet
    * (in the given order) then one token per merge, in rank order —
    * the standard BPE id assignment when no explicit vocab.json
    * exists. Duplicate merge outputs keep their first id. */
  def derivedVocab(
    merges: Seq[(String, String)], alphabet: Seq[String]): Map[String, Int] = {
    val b = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    (alphabet ++ merges.map { case (a, t) => a + t }).foreach { t =>
      if (!b.contains(t)) b += (t -> b.size)
    }
    b.toMap
  }

  /** Build + broadcast a model from loaded pieces. */
  def tokenizer(
    spark: SparkSession,
    merges: Seq[(String, String)],
    vocab: Map[String, Int]
  ): BpeTokenizer =
    new BpeTokenizer(spark.sparkContext.broadcast(
      new BpeModel(merges.toIndexedSeq, vocab)))

  /** The GPT-2 whitespace marker mapping (' '→Ġ, \n→Ċ, \t→ĉ, \r→č) —
    * training must see the SAME symbols encoding will
    * ([[graft.functions.BpeEncodeExpr]] applies this per pre-token). */
  private[graft] def mapWhitespace(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case ' '  => sb.append('Ġ')
        case '\n' => sb.append('Ċ')
        case '\t' => sb.append('ĉ')
        case '\r' => sb.append('č')
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Merge every left-to-right non-overlapping occurrence of `pair` —
    * the same occurrence rule [[graft.functions.BpeModel.encodeWord]]
    * applies, so training and encoding agree on segmentations. */
  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /**
   * TRAIN a BPE merge list from a corpus (Sennrich et al. 2016) —
   * closes the loop with [[load]]: the engine can now learn the
   * tokenizer it encodes with, not only load one.
   *
   * Scale shape — the reason this is cheap at 100 TB: BPE training
   * operates on the WORD-FREQUENCY table, not the corpus. One scan
   * (pre-token explode → map-side-combined count shuffle) reduces any
   * corpus to its distinct pre-tokens; the top `maxWords` most
   * frequent (deterministic ties by word) localize as a
   * TakeOrdered — vocabulary-sized metadata — and the merge loop runs
   * driver-side over (symbols, freq) pairs, exactly how reference
   * trainers work. The truncation is LOUD (logged with the cap) and
   * principled: sub-cap-rare words contribute negligible pair mass.
   *
   * Determinism: pair selection is (count desc, pair lexicographically
   * asc) — fully reproducible for a given corpus (reference trainers
   * vary in tie rule; ours is documented). Merging stops early when no
   * pair reaches `minPairCount` (merging singletons just memorizes the
   * corpus).
   */
  def train(
    df: DataFrame,
    textCol: String,
    numMerges: Int,
    maxWords: Int = 1000000,
    minPairCount: Long = 2L
  ): IndexedSeq[(String, String)] =
    trainCore(df, textCol, numMerges, maxWords, minPairCount)._1

  private def trainCore(
    df: DataFrame,
    textCol: String,
    numMerges: Int,
    maxWords: Int,
    minPairCount: Long
  ): (IndexedSeq[(String, String)], Seq[String]) = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    require(maxWords >= 1, s"maxWords must be >= 1: $maxWords")
    // fetch maxWords+1 rows so the truncation warning only fires when the
    // distinct-pre-token count STRICTLY exceeds the cap (exactly maxWords
    // distinct pre-tokens drops nothing and must not warn)
    val countsAll = df
      .select(explode(
        regexp_extract_all(col(textCol), lit(Bpe.PreTokenPattern), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords + 1)
      .collect()
    if (countsAll.length > maxWords)
      org.slf4j.LoggerFactory.getLogger("graft.Bpe").warn(
        s"Bpe.train: corpus has more than maxWords=$maxWords distinct " +
          "pre-tokens — training on the most frequent (rare-word pair mass " +
          "is negligible; raise maxWords to include more)")
    val counts = countsAll.take(maxWords)
    var words: Array[(Array[String], Long)] = counts.map { r =>
      val w = mapWhitespace(r.getString(0))
      val syms = w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      (syms, r.getLong(1))
    }
    val alphabet = words.iterator.flatMap(_._1).toSeq.distinct.sorted
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      val best = pairCounts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, n)) =>
          acc match {
            case Some((bp, bn)) if n < bn => acc
            case Some((bp, bn)) if n == bn &&
              implicitly[Ordering[(String, String)]].lteq(bp, p) => acc
            case _ => Some((p, n))
          }
      }
      best match {
        case Some((p, n)) if n >= minPairCount =>
          merges += p
          words = words.map { case (syms, c) => (mergePair(syms, p), c) }
        case _ => continue = false
      }
    }
    (merges.toIndexedSeq, alphabet)
  }

  /**
   * [[train]] + build the broadcast tokenizer in one call: the derived
   * vocabulary covers the corpus alphabet (every single-code-point
   * symbol of the training words, sorted) plus one token per merge, so
   * encoding the training distribution never hits UnknownId.
   */
  def trainTokenizer(
    df: DataFrame,
    textCol: String,
    numMerges: Int,
    maxWords: Int = 1000000,
    minPairCount: Long = 2L
  ): BpeTokenizer = {
    val (merges, alphabet) =
      trainCore(df, textCol, numMerges, maxWords, minPairCount)
    tokenizer(df.sparkSession, merges, derivedVocab(merges, alphabet))
  }

  /** Persist a merge list as a GPT-2-style `merges.txt` (Hadoop
    * FileSystem — local/HDFS/object stores), loadable by [[load]]. */
  def saveMerges(
    spark: SparkSession, merges: Seq[(String, String)], path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      out.write("#version: 0.2 (graft-trained)\n".getBytes("UTF-8"))
      merges.foreach { case (a, b) =>
        out.write(s"$a $b\n".getBytes("UTF-8"))
      }
    } finally out.close()
  }

  /** Load + broadcast from GPT-2-style files; `vocabPath = None`
    * derives ids from the merges (base alphabet = the merges'
    * single-code-point constituents, sorted). */
  def load(
    spark: SparkSession,
    mergesPath: String,
    vocabPath: Option[String] = None
  ): BpeTokenizer = {
    val merges = loadMerges(spark, mergesPath)
    val vocab = vocabPath.map(loadVocab(spark, _)).getOrElse {
      val alphabet = merges.flatMap { case (a, b) => Seq(a, b) }
        .filter(t => t.codePointCount(0, t.length) == 1).distinct.sorted
      derivedVocab(merges, alphabet)
    }
    tokenizer(spark, merges, vocab)
  }
}

/**
 * A broadcast-backed tokenizer handle: build once (one broadcast),
 * reuse across any number of columns and queries. All methods are pure
 * projections — zero shuffle, streaming-safe.
 */
final class BpeTokenizer(val model: Broadcast[BpeModel]) extends Serializable {

  /** Pre-token array for a text column (the GPT-2 category split). */
  def preTokens(text: Column): Column =
    regexp_extract_all(text, lit(Bpe.PreTokenPattern), lit(0))

  /** array<int> of BPE token ids for a text column; NULL text → NULL. */
  def encode(text: Column): Column =
    BpeEncodeExpr(preTokens(text), model)

  /** Token count under this tokenizer — the drop-in column for
    * [[Sampling.binByTokenBudget]] / [[Sampling.packSequences]]
    * `tokenCol` and anywhere [[TextAnalysis.bpeishTokenCount]]'s proxy
    * was standing in. NULL text counts 0. */
  def tokenCount(text: Column): Column =
    coalesce(size(encode(text)), lit(0)).cast("long")

  /**
   * Chunk documents into fixed-size TOKEN-ID windows with overlap — the
   * [[Chunking.chunkByTokens]] semantics (ceil coverage, stride =
   * chunkTokens − overlap, short tail kept, degenerate final chunks
   * suppressed by the stride arithmetic) but over REAL model tokens,
   * emitting the ids a trainer consumes: (doc_id, chunk_idx, n_ids,
   * ids). One encode per document (the projection), one generate-
   * explode for the windows — no shuffle, no second pass over text.
   */
  def chunkIds(
    df: DataFrame,
    textCol: String,
    idCol: String,
    chunkTokens: Int = 512,
    overlap: Int = 64
  ): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlap vs $chunkTokens")
    val stride = chunkTokens - overlap
    df.select(col(idCol).as("doc_id"), encode(col(textCol)).as("ids"))
      .filter(size(col("ids")) > 0)
      .withColumn("n_chunks",
        greatest(lit(1L),
          ceil((size(col("ids")).cast("double") - lit(overlap)) / lit(stride))))
      .select(col("doc_id"), col("ids"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("ids"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkTokens)).as("ids"))
      .withColumn("n_ids", size(col("ids")))
      .select(col("doc_id"), col("chunk_idx"), col("n_ids"), col("ids"))
  }
}
