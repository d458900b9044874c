package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * BM25 ranked retrieval over the corpus — the targeted-data-selection
 * primitive: score every document against a (small) set of keyword
 * queries and keep the best matches per query. This is how a training
 * pipeline pulls "documents about X" out of 100 TB without embeddings
 * (and how retrieval-quality eval sets are mined).
 *
 * Scoring is classic BM25 with Lucene's non-negative idf:
 * {{{
 *   idf(t)      = ln(1 + (N − df_t + 0.5) / (df_t + 0.5))
 *   score(q, d) = Σ_{t ∈ q}  idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
 * }}}
 * over [[Dedup.wordTable]] tokens (the corpus-wide word notion shared
 * with dedup/top-words/unigram scoring). N and avgdl count ALL
 * corpus docs, including token-free ones.
 *
 * Scale shape: the query term set is metadata-sized and BROADCAST; the
 * corpus is exploded ONCE and immediately semi-joined against it, so
 * only query-matching postings (docs × query terms, a sliver of the
 * token stream) ever reach a shuffle. Document frequencies are a
 * PARTIAL-AGGREGATED terms-sized table over the postings aggregate,
 * re-read through the SAME shuffle (ReuseExchange) and broadcast back
 * — NOT a per-word count window (a window gathers every posting of a
 * word into one task, so a stopword-like query term at corpus scale
 * is a straggler) and NOT a second aggregation of the corpus (a
 * naïve `postings.groupBy` branch gets column-pruned into a different
 * exchange and silently re-scans the corpus; see the reuse guard in
 * the code, and RetrievalSpec pins exactly one corpus explode plus
 * the ReusedExchange). N/avgdl ride along as a broadcast 1-row
 * aggregate (the [[TextAnalysis.unigramNll]] T/V shape, kept inside
 * the plan — no eager action). The corpus is never shuffled and never
 * joined to itself; every shuffle after the semi join is
 * postings-sized or smaller.
 */
object Retrieval {

  /**
   * All (query_id, doc_id, score) pairs with at least one matching
   * term — the value surface (oracle-gated; ranking is a window over
   * this). Docs sharing no term with a query are absent (BM25 gives
   * them score 0; materializing the zero cross product would be a
   * corpus × queries blowup for no information).
   */
  def bm25Scores(
    corpus: DataFrame,
    textCol: String,
    idCol: String,
    queries: DataFrame,
    queryIdCol: String,
    queryTextCol: String,
    k1: Double = 1.2,
    b: Double = 0.75
  ): DataFrame = {
    require(k1 >= 0.0, s"k1 must be non-negative: $k1")
    require(b >= 0.0 && b <= 1.0, s"b must be in [0, 1]: $b")
    // NULL text counts as a ZERO-LENGTH document (dl = 0, no postings):
    // N already counts it, so leaving its dl NULL would make avgdl's
    // denominator diverge from n_docs — the coherent contract, and the
    // one that keeps bm25Forget's sum_dl/n_docs arithmetic exact
    val docs = Dedup.wordTable(corpus, textCol, idCol)
      .select(col("doc_id"), col("w"),
        coalesce(size(col("w")), lit(0)).as("dl"))
    // one broadcast row: corpus size + average doc length (metadata fold
    // kept inside the plan — no eager action)
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      coalesce(avg(col("dl")), lit(0.0)).as("avgdl"))
    // query side inlines the same word notion (metadata-sized frame;
    // keeping its explode textually distinct from the corpus's bound-`w`
    // explode also lets RetrievalSpec count corpus scans unambiguously)
    val qterms = queries.select(
      col(queryIdCol).as("query_id"),
      explode(graft.functions.Hashing.normalizedWords(col(queryTextCol))).as("word"))
      .distinct()
    val terms = qterms.select("word").distinct()
    // postings restricted to query terms BEFORE any shuffle
    val postings = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("word"))
      .join(broadcast(terms), Seq("word"), "left_semi")
      .groupBy("word", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
    // document frequency: partial-aggregated per word over the postings
    // aggregate — the partials collapse to ≤ |terms| rows per partition
    // BEFORE the word shuffle, so a stopword-like term costs the same as
    // a rare one (a count window over partitionBy(word) would instead
    // drag every posting of the word into one task — the straggler this
    // round removed). count(when(tf > 0, 1)), NOT count(1), and the
    // difference is load-bearing: tf = count(1) ≥ 1 always, so counting
    // rows where
    // tf > 0 is the row count — but the predicate is opaque to the
    // optimizer, so this branch KEEPS consuming tf and its copy of the
    // postings aggregate stays column-identical to the scoring
    // branch's. count(1) — or anything Catalyst can simplify to it
    // (count(tf) rewrites via tf's non-nullability) — lets pruning
    // specialize the partial aggregate under the postings exchange,
    // breaking exchange identity → no ReuseExchange → a silent second
    // corpus scan (the pruned-agg trap; RetrievalSpec pins scan count
    // AND the ReusedExchange)
    val dfTable = postings
      .groupBy("word")
      .agg(count(when(col("tf") > 0, lit(1))).as("df"))
    // terms-sized (≤ |query terms| rows): broadcast it back onto postings
    val withDf = postings.join(broadcast(dfTable), Seq("word"))
    val idf: Column =
      log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfPart: Column =
      col("tf") * (k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    withDf
      .crossJoin(broadcast(stats))
      .select(col("word"), col("doc_id"), (idf * tfPart).as("contrib"))
      .join(broadcast(qterms), Seq("word"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score"))
  }

  /**
   * PERSISTED retrieval index — the build-once artifact that makes
   * repeated targeted selection match-bounded: [[bm25Scores]] re-scans
   * and re-aggregates the corpus per query batch (fine for one probe,
   * wasteful when a 100 TB corpus is probed daily), this builds the
   * full inverted index ONCE and [[bm25ScoresAgainst]] probes it with
   * only broadcast-joined query terms — the row-79/136 incremental
   * pattern applied to retrieval.
   *
   * One frame, persist as parquet: one row per (word, doc) posting —
   * `(word, doc_id, tf, dl, df, n_docs, avgdl, sum_dl)` with the
   * per-word document frequency DENORMALIZED onto its postings
   * (8 bytes a row buys probe-time scoring with zero extra joins) and
   * the corpus stats riding every row as constants (parquet RLE
   * stores a constant column in a handful of bytes per row group).
   * All BM25 inputs are in the row, so k1/b stay PROBE-time
   * parameters — one index serves any scoring configuration.
   *
   * The index is also a COMPLETE document registry, which is what
   * makes [[bm25Forget]] exact without a corpus rescan: a TOKEN-FREE
   * document (counted by N/avgdl but owning no posting) rides as one
   * SENTINEL row with `word` NULL and `tf = df = 0` — a probe's inner
   * join on `word` can never match it (NULL equals nothing), so
   * scoring is untouched, but forget can see every indexed document
   * and its length. `sum_dl` is the EXACT long document-length total
   * behind `avgdl`: avgdl alone cannot be decremented exactly in
   * floating point, `sum_dl − removed` can.
   *
   * Scale shape: one corpus explode → one map-side-combined
   * (word, doc) aggregation (the token stream collapses to postings
   * before its shuffle); df is the [[bm25Scores]] partial-agg shape
   * over the postings aggregate (per-partition partials collapse to
   * ≤ |vocab-per-partition| rows before the word shuffle — never a
   * per-word count window, a stopword's postings would straggle one
   * task) joined back SHUFFLE-wise on word (vocabulary at corpus
   * scale is NOT broadcast-sized — billions of distinct tokens — and
   * a skewed word join is AQE-splittable where a window is not);
   * stats are a broadcast 1-row aggregate. Corpus text never
   * persists into the index.
   */
  def bm25Index(
    corpus: DataFrame,
    textCol: String,
    idCol: String
  ): DataFrame = {
    // NULL text counts as a ZERO-LENGTH document (dl = 0, no postings):
    // N already counts it, so leaving its dl NULL would make avgdl's
    // denominator diverge from n_docs — the coherent contract, and the
    // one that keeps bm25Forget's sum_dl/n_docs arithmetic exact
    val docs = Dedup.wordTable(corpus, textCol, idCol)
      .select(col("doc_id"), col("w"),
        coalesce(size(col("w")), lit(0)).as("dl"))
    // N/avgdl count ALL docs incl. token-free ones (bm25Scores parity)
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      coalesce(avg(col("dl")), lit(0.0)).as("avgdl"),
      coalesce(sum(col("dl")).cast("long"), lit(0L)).as("sum_dl"))
    val postings = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("word"))
      .groupBy("word", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
    // the opaque-predicate spelling keeps this branch column-identical
    // to the postings aggregate (the bm25Scores ReuseExchange guard)
    val dfTable = postings
      .groupBy("word")
      .agg(count(when(col("tf") > 0, lit(1))).as("df"))
    // token-free docs ride as NULL-word sentinels (never probed, the
    // forget-time doc registry — see the scaladoc)
    val tokenless = docs.filter(col("dl") === 0)
      .select(lit(null).cast("string").as("word"), col("doc_id"),
        lit(0L).as("tf"), col("dl"), lit(0L).as("df"))
    postings
      .join(dfTable, Seq("word"))
      .select(col("word"), col("doc_id"), col("tf"), col("dl"), col("df"))
      .unionByName(tokenless)
      .crossJoin(broadcast(stats))
      .select(col("word"), col("doc_id"), col("tf"), col("dl"),
        col("df"), col("n_docs"), col("avgdl"), col("sum_dl"))
  }

  /**
   * Deletion propagation for [[bm25Index]] (the [[Forget]] doctrine
   * applied to the retrieval artifact): returns the index as
   * [[bm25Index]] would build it from the REDUCED corpus — VALUE-EQUAL
   * including every denormalized statistic — without touching corpus
   * text. A takedown must not leave the removed document's postings
   * scorable, and must not leave STALE df/N/avgdl either: those shift
   * every surviving score, which is exactly what "as if never indexed"
   * forbids.
   *
   * Unlike the per-doc-row indexes ([[Forget.removeIds]] suffices
   * there), bm25 rows carry corpus aggregates, so the rewrite is
   * anti-join + three removal-set-sized deltas, all exact integer
   * arithmetic:
   *  - `df' = df − |removed docs containing the word|` (per-word
   *    decrement, broadcast-joined — the [[Forget.forgetFingerprints]]
   *    counted-decrement shape; a word whose postings ALL belonged to
   *    removed docs simply has no surviving rows to decrement),
   *  - `n_docs' = n_docs − |removed docs found in the index|` (the
   *    NULL-word sentinels make the index a complete registry, so a
   *    token-free doc decrements too),
   *  - `sum_dl' = sum_dl − Σ removed dl`, and
   *    `avgdl' = sum_dl'/n_docs'` — bit-equal to the rebuild's
   *    average because both divide the same exact long sum by the
   *    same count (0.0 when the reduced corpus is empty).
   *
   * One index scan (the rewrite itself), removal-set-sized exchanges;
   * ids absent from the index are no-ops. Wrap in
   * [[Forget.rewriteVersioned]] for atomic publication.
   */
  def bm25Forget(
    index: DataFrame,
    removed: DataFrame,
    removedIdCol: String,
    broadcastRemoved: Boolean = true
  ): DataFrame = {
    def hinted(df: DataFrame) = if (broadcastRemoved) broadcast(df) else df
    val rem = removed.select(col(removedIdCol).as("__rid")).distinct()
    val removedRows = index
      .join(hinted(rem), col("doc_id") === col("__rid"), "left_semi")
    // one row per removed doc actually indexed (sentinels included)
    val removedStats = removedRows.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("__r_n"),
        coalesce(sum(col("dl")).cast("long"), lit(0L)).as("__r_sum"))
    val removedPerWord = removedRows
      .filter(col("word").isNotNull)
      .groupBy("word").agg(count(lit(1)).as("__r_df"))
    val nDocs2 = col("n_docs") - col("__r_n")
    val sumDl2 = col("sum_dl") - col("__r_sum")
    index
      .join(hinted(rem), col("doc_id") === col("__rid"), "left_anti")
      .join(hinted(removedPerWord), Seq("word"), "left")
      .crossJoin(broadcast(removedStats))
      .select(col("word"), col("doc_id"), col("tf"), col("dl"),
        (col("df") - coalesce(col("__r_df"), lit(0L))).as("df"),
        nDocs2.as("n_docs"),
        when(nDocs2 === 0, lit(0.0))
          .otherwise(sumDl2.cast("double") / nDocs2.cast("double"))
          .as("avgdl"),
        sumDl2.as("sum_dl"))
  }

  /**
   * Append a corpus DROP into a persisted [[bm25Index]] — the GROW arm
   * the index family's lifecycle was missing ([[bm25Forget]]'s exact
   * arithmetic run in reverse): returns the index as [[bm25Index]]
   * would build it from the UNION corpus — VALUE-EQUAL including every
   * denormalized statistic — while touching only the drop's text. A
   * daily drop must not force a full corpus re-index just because
   * bm25 rows carry corpus aggregates; the per-doc-row index families
   * (winnow/containment/dhash) append by writing rows, this one needs
   * the three drop-sized deltas too:
   *  - `df' = df + |drop docs containing the word|` — the per-word
   *    increment, applied to SURVIVING old rows by a left join against
   *    the drop's word-frequency table and to the drop's own new
   *    posting rows by the symmetric lookup of the OLD df (a word the
   *    index has never seen starts at its drop count);
   *  - `n_docs' = n_docs + |drop docs|` (token-free drop docs count
   *    and ride in as NULL-word sentinels, [[bm25Index]] parity);
   *  - `sum_dl' = sum_dl + Σ drop dl`, and `avgdl' = sum_dl'/n_docs'`
   *    — the same exact-long-sum division as the rebuild.
   *
   * Ids must be NEW: a drop id already present in the index would
   * double-count every aggregate, so the rewrite FAILS LOUD (a lazy
   * in-plan `raise_error`, not a driver pre-scan) on the first
   * collision it sees — "append twice" is a retry bug upstream, never
   * something to silently absorb. Old corpus stats are read off the
   * index rows themselves (max over the constant columns — an EMPTY
   * index appends as a from-scratch build).
   *
   * Scale shape: the index is read for the rewrite itself (unavoidable
   * — df/N/avgdl change on every row) plus a column-pruned pass for
   * the drop words' old df (only `word`/`df` columns move) and a
   * 1-ROW stats peek (limit(1) under the aggregate — the constants
   * ride every row, so one row is enough); the drop tokenizes once
   * per consuming subtree (four drop-sized passes — persist the drop
   * upstream if its tokenization dominates), delta joins are
   * drop-vocabulary-sized (broadcast by default, `broadcastDrop =
   * false` for giant drops → shuffle joins, AQE handles skew). The
   * OLD corpus text is never read. Wrap in
   * [[Forget.rewriteVersioned]] for atomic publication.
   */
  def bm25Append(
    index: DataFrame,
    drop: DataFrame,
    textCol: String,
    idCol: String,
    broadcastDrop: Boolean = true
  ): DataFrame = {
    def hinted(df: DataFrame) = if (broadcastDrop) broadcast(df) else df
    val docs = Dedup.wordTable(drop, textCol, idCol)
      .select(col("doc_id"), col("w"),
        coalesce(size(col("w")), lit(0)).as("dl"))
    val aStats = docs.agg(
      count(lit(1)).as("__a_n"),
      coalesce(sum(col("dl")).cast("long"), lit(0L)).as("__a_sum"))
    // the stats are denormalized constants, so ONE row carries them:
    // limit(1) under the aggregate keeps this a near-free peek, and
    // the coalesced max makes an EMPTY index read as (0, 0) —
    // appending onto nothing degenerates to a fresh build
    val oldStats = index.select(col("n_docs"), col("sum_dl")).limit(1).agg(
      coalesce(max(col("n_docs")), lit(0L)).as("__o_n"),
      coalesce(max(col("sum_dl")), lit(0L)).as("__o_sum"))
    val stats = broadcast(oldStats.crossJoin(aStats).select(
      (col("__o_n") + col("__a_n")).as("__n2"),
      (col("__o_sum") + col("__a_sum")).as("__s2")))
    val postings = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("word"))
      .groupBy("word", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
    // per-word df delta: |drop docs containing the word| (drop-vocab-sized)
    val aDf = postings.groupBy("word").agg(count(lit(1)).as("__a_df"))
    // OLD df for exactly the drop's words: df is denormalized onto every
    // posting of the word, so max() reads it without a full-index agg
    // (the semi join prunes the scan to drop-word postings first)
    val oldDf = index
      .join(hinted(aDf.select("word")), Seq("word"), "left_semi")
      .groupBy("word").agg(max(col("df")).as("__o_df"))
    val dropIds = docs.select(col("doc_id").as("__aid")).distinct()
    val avgdl2 = when(col("__n2") === 0, lit(0.0))
      .otherwise(col("__s2").cast("double") / col("__n2").cast("double"))
    // surviving old rows: bump df and stats; an id collision fails
    // LOUD through a FILTER predicate (not an output column — a guard
    // woven into df would be silently ELIDED by column pruning for any
    // consumer that never reads df, e.g. a bare count(); a filter
    // decides cardinality, so every consumer evaluates it)
    val collisionGuard =
      when(col("__aid").isNotNull,
        raise_error(concat(lit("bm25Append: drop id already indexed: "),
          col("doc_id").cast("string"),
          lit(" - appending an indexed document would double-count " +
            "df/N/avgdl; forget it first or dedup the drop")))
          .cast("boolean"))
        .otherwise(lit(true))
    val oldRows = index
      .join(hinted(dropIds), col("doc_id") === col("__aid"), "left")
      .filter(collisionGuard)
      .join(hinted(aDf), Seq("word"), "left")
      .crossJoin(stats)
      .select(col("word"), col("doc_id"), col("tf"), col("dl"),
        (col("df") + coalesce(col("__a_df"), lit(0L))).as("df"),
        col("__n2").as("n_docs"), avgdl2.as("avgdl"), col("__s2").as("sum_dl"))
    val tokenless = docs.filter(col("dl") === 0)
      .select(lit(null).cast("string").as("word"), col("doc_id"),
        lit(0L).as("tf"), col("dl"), lit(0L).as("df"))
    val newRows = postings
      .join(hinted(aDf), Seq("word"))
      .join(hinted(oldDf), Seq("word"), "left")
      .select(col("word"), col("doc_id"), col("tf"), col("dl"),
        (col("__a_df") + coalesce(col("__o_df"), lit(0L))).as("df"))
      .unionByName(tokenless)
      .crossJoin(stats)
      .select(col("word"), col("doc_id"), col("tf"), col("dl"), col("df"),
        col("__n2").as("n_docs"), avgdl2.as("avgdl"), col("__s2").as("sum_dl"))
    oldRows.unionByName(newRows)
  }

  /**
   * [[bm25Append]] against a [[bm25IndexWrite]] DIRECTORY — the grow
   * arm for the partition-pruned layout: reads the bucketed index
   * (bucket column dropped — it is derivable), merges the drop with
   * the exact-delta rewrite, and writes the grown index to `outPath`
   * re-bucketed under the SOURCE's own modulus (from its sidecar — a
   * different modulus would be a different layout, not a grown one).
   * The write is a FULL layout rewrite by construction: n_docs/avgdl/
   * sum_dl ride every posting row, so growing the corpus changes every
   * bucket's bytes — there is no partition-local append for an index
   * that denormalizes corpus stats (that denormalization is what makes
   * pruning unable to change a score, the layout's core contract).
   * Write to a NEW path and flip a pointer for atomic publication (the
   * [[Forget.rewriteVersioned]] pattern, applied dir-to-dir here
   * because the artifact is a directory tree, not one parquet).
   */
  def bm25AppendDir(
    spark: SparkSession,
    path: String,
    drop: DataFrame,
    textCol: String,
    idCol: String,
    outPath: String,
    broadcastDrop: Boolean = true
  ): Unit = {
    // resolve BOTH spellings before comparing: a raw string check is
    // defeated by trailing slashes, relative-vs-absolute paths and
    // symlinks, and an in-place overwrite would delete the source layout
    // while the append plan is still reading it (job failure plus a
    // destroyed source artifact). resolvePath follows symlinks when the
    // filesystem supports them; the target may not exist yet, so it
    // falls back to makeQualified.
    val hconf = spark.sparkContext.hadoopConfiguration
    def resolved(s: String): org.apache.hadoop.fs.Path = {
      val raw = new org.apache.hadoop.fs.Path(s)
      val fs = raw.getFileSystem(hconf)
      try fs.resolvePath(raw)
      catch { case _: java.io.FileNotFoundException => fs.makeQualified(raw) }
    }
    require(resolved(outPath) != resolved(path),
      s"bm25AppendDir: outPath resolves to the source path ($path) - the " +
        "grown layout is a full rewrite; write fresh and flip a pointer")
    val buckets = readBucketMeta(spark, path)
    bm25IndexWrite(
      bm25Append(spark.read.parquet(path).drop("bucket"), drop,
        textCol, idCol, broadcastDrop),
      outPath, buckets)
  }

  /**
   * BM25 scores probed from a persisted [[bm25Index]]: value-identical
   * to [[bm25Scores]] over the same corpus (identical operands through
   * identical arithmetic — tf/dl/df/N are exact longs and avgdl
   * round-trips parquet bit-exactly; the gate pins it under the same
   * oracle), at MATCH-bounded cost: the metadata-sized query term set
   * is broadcast-inner-joined onto the index scan (only postings of
   * query words survive the scan stage — the index is never shuffled
   * beyond them) and the only exchange is the candidate-sized
   * (query, doc) score aggregation. A query term the corpus has never
   * seen matches nothing; document frequencies are read, not
   * recomputed.
   */
  def bm25ScoresAgainst(
    index: DataFrame,
    queries: DataFrame,
    queryIdCol: String,
    queryTextCol: String,
    k1: Double = 1.2,
    b: Double = 0.75
  ): DataFrame = {
    require(k1 >= 0.0, s"k1 must be non-negative: $k1")
    require(b >= 0.0 && b <= 1.0, s"b must be in [0, 1]: $b")
    val qterms = queries.select(
      col(queryIdCol).as("query_id"),
      explode(graft.functions.Hashing.normalizedWords(col(queryTextCol))).as("word"))
      .distinct()
    val idf: Column =
      log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfPart: Column =
      col("tf") * (k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    index
      .join(broadcast(qterms), Seq("word"))
      .select(col("query_id"), col("doc_id"), (idf * tfPart).as("contrib"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score"))
  }

  /** Partition-layout metadata sidecar name (an `_`-prefixed file —
    * Spark's readers ignore it as data). */
  private val BucketMetaFile = "_bm25_buckets"

  /**
   * Persist a [[bm25Index]] HIVE-PARTITIONED by a word-hash bucket —
   * the layout that makes probe cost independent of corpus size: a
   * probe's query terms map to a handful of `bucket=` directories and
   * PARTITION PRUNING keeps every other partition's files closed (the
   * flat layout's probe still scans the whole index to find matching
   * words — measured 0.32 exponent in BASELINE.md; this removes that
   * residual term, leaving only the matched buckets' IO).
   *
   * The bucket is `pmod(md5_long60(word), buckets)` — the engine's
   * portable hash, recomputable at probe time for the query terms.
   * The bucket COUNT is self-describing: it rides a `_bm25_buckets`
   * sidecar file next to the data (readers must use the writer's
   * modulus — a mismatched guess would prune wrong buckets and
   * silently lose words, so it is never a caller-supplied parameter
   * on the read side).
   */
  def bm25IndexWrite(
    index: DataFrame,
    path: String,
    buckets: Int = 64
  ): Unit = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    index
      .withColumn("bucket",
        pmod(graft.functions.Hashing.md5Long60(col("word")), lit(buckets.toLong))
          .cast("int"))
      .hint("rebalance", "bucket")
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
    val spark = index.sparkSession
    val p = new org.apache.hadoop.fs.Path(path, BucketMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(buckets.toString.getBytes("UTF-8")) finally out.close()
  }

  /**
   * BM25 scores probed from a [[bm25IndexWrite]] directory: the query
   * terms' buckets are computed DRIVER-side with the same portable
   * hash (queries are metadata-sized by contract), the read filters
   * `bucket IN (...)` — a pure partition-pruning predicate, so only
   * matched buckets' files open — and the pruned frame feeds
   * [[bm25ScoresAgainst]] unchanged (every posting row carries its
   * df/N/avgdl, so pruning cannot change any score). Value-identical
   * to the flat probe; queries whose terms all miss the corpus read
   * ZERO partitions.
   */
  def bm25ScoresFromDir(
    spark: SparkSession,
    path: String,
    queries: DataFrame,
    queryIdCol: String,
    queryTextCol: String,
    k1: Double = 1.2,
    b: Double = 0.75,
    maxQueryTerms: Int = 100000
  ): DataFrame = {
    // the upper bound keeps the cap+1 overflow-free — the error below
    // says "raise maxQueryTerms explicitly", so Int.MaxValue must not
    // turn that escape hatch into a negative limit() crash
    require(maxQueryTerms >= 1 && maxQueryTerms < Int.MaxValue,
      s"maxQueryTerms must be in [1, ${Int.MaxValue - 1}]: $maxQueryTerms")
    val buckets = readBucketMeta(spark, path)
    // the query frame is metadata-sized BY CONTRACT (its distinct terms
    // are collected driver-side to compute the pruned bucket set);
    // limit(cap + 1) keeps even a misuse collect bounded — the overflow
    // row exists only to prove the violation and name it
    val words = queries.select(
        explode(graft.functions.Hashing.normalizedWords(col(queryTextCol)))
          .as("word"))
      .distinct().limit(maxQueryTerms + 1).collect().map(_.getString(0))
    require(words.length <= maxQueryTerms,
      s"bm25ScoresFromDir: queries carry more than $maxQueryTerms distinct " +
        "terms - the query frame must be metadata-sized (terms are " +
        "collected driver-side for partition pruning); probe the flat " +
        "index with bm25ScoresAgainst or raise maxQueryTerms explicitly")
    val wanted = words.map { w =>
      val h = graft.functions.Md5Long60Expr.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(w))
      (((h % buckets) + buckets) % buckets).toInt
    }.distinct.toIndexedSeq
    val idx =
      if (wanted.isEmpty)
        spark.read.parquet(path).filter(lit(false))
      else
        spark.read.parquet(path).filter(col("bucket").isin(wanted: _*))
    bm25ScoresAgainst(idx.drop("bucket"), queries, queryIdCol, queryTextCol, k1, b)
  }

  /** Top-k over the partitioned layout: [[bm25ScoresFromDir]] + the
    * WindowGroupLimit ranking. */
  def bm25TopKFromDir(
    spark: SparkSession,
    path: String,
    queries: DataFrame,
    queryIdCol: String,
    queryTextCol: String,
    k: Int = 10,
    k1: Double = 1.2,
    b: Double = 0.75,
    maxQueryTerms: Int = 100000
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    bm25ScoresFromDir(spark, path, queries, queryIdCol, queryTextCol, k1, b,
        maxQueryTerms)
      .withColumn("rank",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }

  private def readBucketMeta(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path, BucketMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$path has no $BucketMetaFile sidecar - was it written by bm25IndexWrite?")
    val in = fs.open(p)
    val text = try {
      // loop to EOF: a single read() may return short (or -1 on an
      // empty sidecar, which would make new String(buf, 0, -1) throw
      // an obscure IndexOutOfBounds instead of a clear error)
      val buf = new Array[Byte](32)
      val outBuf = new java.io.ByteArrayOutputStream(32)
      var n = in.read(buf)
      while (n > 0) { outBuf.write(buf, 0, n); n = in.read(buf) }
      new String(outBuf.toByteArray, "UTF-8").trim
    } finally in.close()
    // ASCII digits only (Char.isDigit accepts Unicode digits toInt
    // rejects) and <= 9 of them (no Int overflow): toInt below cannot
    // throw, so a corrupt sidecar always surfaces as THIS message
    require(text.nonEmpty && text.length <= 9 &&
        text.forall(c => c >= '0' && c <= '9'),
      s"$path/$BucketMetaFile is ${if (text.isEmpty) "empty" else s"not a bucket count ('$text')"} - " +
        "was it written by bm25IndexWrite?")
    text.toInt
  }

  // ------------------------------------------------------------------
  // STATS-SIDECAR layout — the append-friendly third layout arm.
  //
  // The flat [[bm25Index]] and bucketed [[bm25IndexWrite]] layouts
  // denormalize df/N/avgdl/sum_dl onto every posting row (probe-time
  // scoring with zero joins — their contract), which makes EVERY grow
  // an O(index) rewrite: one drop touches every row's statistics. A
  // daily 1 TB drop into a 100 TB index pays 100 TB of IO. This layout
  // inverts the trade: posting rows are IMMUTABLE `(word, doc_id, tf,
  // dl)` (plus the NULL-word registry sentinels for token-free docs),
  // the per-word document frequencies live in a vocabulary-sized `df`
  // sidecar table, and N/sum_dl live in ONE metadata row — so a grow
  // appends drop-sized posting files, rewrites the (sidecar-sized,
  // never index-sized) df table with drop-vocab-sized COMPUTE, and
  // flips the metadata row. Probes pay one extra broadcast join
  // against the query-vocab-pruned df sidecar — metadata-sized.
  //
  // On-disk shape under `path/`:
  //   postings-g1/ … postings-g<G>/   immutable posting generations,
  //                                   hive-partitioned by word-hash bucket
  //   registry-g1/ … registry-g<G>/   (doc_id, dl) doc registries, one per
  //                                   generation — doc-count-sized, so
  //                                   lifecycle ops never scan posting rows
  //   df-v<V>/                        (word, df), same bucket partitioning
  //   removed-v<R>/                   (doc_id) tombstones (R = 0: none)
  //   _bm25_sidecar                   "n_docs,sum_dl,G,V,R,buckets"
  //
  // Generations and the df table are partitioned by
  // `pmod(md5_long60(word), buckets)` (the bm25IndexWrite modulus
  // doctrine, the modulus riding the metadata row): probes compute the
  // query words' buckets DRIVER-side and partition-prune every
  // generation and the df sidecar — probe IO is query-bounded like the
  // denormalized bucketed layout's, on top of the sublinear grows.
  // NULL-word registry sentinels land in the hive default partition
  // (probes never prune into it; forget's full registry pass reads it).
  //
  // The `_bm25_sidecar` metadata file is the PUBLICATION POINT: every
  // mutation first commits its new generation/version directories,
  // then flips the metadata with an overwrite-rename (one FS operation
  // where the filesystem supports it — POSIX and HDFS do; filesystems
  // without FileContext fall back to delete+rename and accept a
  // momentary not-found window). A crash mid-grow leaves orphan dirs
  // and an unchanged pointer — readers never observe new postings
  // with stale statistics. Superseded df/tombstone versions are
  // garbage-collected ONE MUTATION LATE (a one-version grace window):
  // a probe that loaded the metadata just before a flip finishes
  // against its version instead of failing mid-plan on a deleted
  // directory. The window is one mutation deep — snapshot reads are
  // safe against a single concurrent grow/forget, not an unbounded
  // backlog of them.
  //
  // Forget is sidecar-delta too: tombstone the removed ids (probes
  // anti-join the removal-sized tombstone table), decrement df/N/
  // sum_dl exactly — posting bytes are never rewritten. Tombstones
  // accumulate across forgets; [[bm25SidecarCompact]] is the
  // amortized maintenance that rewrites postings minus tombstones.
  //
  // Lifecycle-op IO economics (r18): the per-generation registries
  // make the grow's collision guard and the forget's N/sum_dl deltas
  // registry joins (doc-count-sized); the df rewrite on BOTH arms
  // recomputes only the buckets containing changed vocabulary and
  // byte-copies untouched bucket files forward — only the forget's df
  // decrement legitimately reads posting rows (column-pruned: a
  // removed doc's words are not knowable from any sidecar).
  // ------------------------------------------------------------------

  private val SidecarMetaFile = "_bm25_sidecar"

  /** `gens` is the EXPLICIT list of live generation ids (dirs
    * `postings-g<id>`/`registry-g<id>`): an append adds `max + 1`, a
    * merge ([[bm25SidecarMergeGenerations]]) replaces several ids with
    * one fresh id — ids are never reused, so a racing reader's
    * generation set stays readable until the one-mutation-late GC. */
  private final case class SidecarMeta(
    nDocs: Long, sumDl: Long, gens: Seq[Int], dfV: Int, rmV: Int, buckets: Int) {
    def nextGen: Int = gens.max + 1
  }

  private def sidecarMetaPath(path: String) =
    new org.apache.hadoop.fs.Path(path, SidecarMetaFile)

  private def readSidecarMeta(spark: SparkSession, path: String): SidecarMeta = {
    val p = sidecarMetaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$path has no $SidecarMetaFile metadata - was it written by bm25SidecarWrite?")
    val in = fs.open(p)
    val text =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
      finally in.close()
    val parts = text.split(",")
    require(parts.length == 6,
      s"$path/$SidecarMetaFile is malformed ('$text') - expected " +
        "n_docs,sum_dl,gens,dfv,rmv,buckets")
    // generation field: "g3.5.6" = explicit live-id list (merge-era
    // writer); a bare count N = legacy dense 1..N (pre-merge layouts
    // stay readable)
    val gens =
      if (parts(2).startsWith("g")) parts(2).drop(1).split('.').map(_.toInt).toSeq
      else (1 to parts(2).toInt)
    require(gens.nonEmpty && gens.distinct == gens,
      s"$path/$SidecarMetaFile generation list is malformed ('${parts(2)}')")
    SidecarMeta(parts(0).toLong, parts(1).toLong,
      gens, parts(3).toInt, parts(4).toInt, parts(5).toInt)
  }

  /** Commit point of every sidecar-layout mutation: temp-write +
    * OVERWRITE-rename (one FS operation where the filesystem supports
    * it), so a racing reader sees the old metadata or the new metadata
    * — never a missing file, which the old delete-then-rename spelling
    * exposed for the instant between its two operations. */
  private def writeSidecarMeta(
    spark: SparkSession, path: String, m: SidecarMeta): Unit = {
    val p = sidecarMetaPath(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(
      path, s".$SidecarMetaFile.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(
      s"${m.nDocs},${m.sumDl},g${m.gens.mkString(".")},${m.dfV},${m.rmV},${m.buckets}"
        .getBytes("UTF-8"))
    finally out.close()
    try {
      org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
        .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      // ChecksumFileSystem hygiene: the FileContext rename goes through
      // the RAW fs, which moves the data file but never checksum
      // sidecars — a stale `.crc` for the destination (written by a
      // pre-overwrite-rename writer whose checksummed rename carried it
      // along) would fail every later read against the NEW bytes, and
      // the tmp's own `.crc` would leak one orphan per mutation.
      // Best-effort drop of both.
      fs.delete(new org.apache.hadoop.fs.Path(path, s".$SidecarMetaFile.crc"), false)
      fs.delete(new org.apache.hadoop.fs.Path(path, s".${tmp.getName}.crc"), false)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no FileContext binding for this FS: fall back to the
        // two-operation replace (documented not-found window)
        fs.delete(p, false)
        require(fs.rename(tmp, p),
          s"bm25 sidecar: could not publish $SidecarMetaFile under $path")
    }
  }

  private def postingPaths(path: String, m: SidecarMeta): Seq[String] =
    m.gens.map(g => s"$path/postings-g$g")

  /** Word-hash bucket under the layout's own modulus — the
    * [[bm25IndexWrite]] portable hash, recomputable driver-side for
    * probe-time partition pruning. NULL (sentinel) words land in the
    * hive default partition; probes never prune INTO it, full scans
    * (forget's registry pass) read it like any other. */
  /** Pinned layout schemas: an EMPTY partitioned write leaves no data
    * files, and schema inference over such a directory throws where an
    * empty layout is correct (the stream-sink pinned-read doctrine). */
  private val SidecarPostingsSchema =
    "word STRING, doc_id BIGINT, tf BIGINT, dl INT, bucket INT"
  private val SidecarDfSchema = "word STRING, df BIGINT, bucket INT"

  private def sidecarBucket(buckets: Int): Column =
    pmod(graft.functions.Hashing.md5Long60(col("word")), lit(buckets.toLong))
      .cast("int")

  /** Cluster rows on the hive partition column before a
    * `partitionBy("bucket")` write (guide §6 output file sizing): a
    * partitioned write opens one file per bucket value PER TASK, so a
    * write whose input arrives in T tasks emits up to T × buckets
    * files — a merge/compact (T = read tasks of every merged
    * generation) multiplies near-empty files per lifecycle mutation,
    * and probe-time IO pays the file count forever. The AQE REBALANCE
    * exchange clusters by bucket, coalescing tiny buckets into shared
    * tasks and splitting oversized ones at the advisory partition
    * size, so output files track data volume at every scale (one
    * file per populated bucket at gate scale; advisory-sized files
    * per bucket at corpus scale). Costs one exchange of the written
    * rows — the standard write-distribution trade for a build-once
    * read-many artifact. */
  private def bucketClustered(df: DataFrame): DataFrame =
    df.hint("rebalance", "bucket")

  /** Full (unpruned) posting read across generations — the forget df
    * decrement and the compact rewrite, the only two lifecycle reads
    * that legitimately need posting rows; probes use
    * [[prunedSidecarPostings]], everything else the registry. */
  private def readSidecarPostings(
    spark: SparkSession, path: String, m: SidecarMeta): DataFrame =
    // one read PER generation, unioned: a multi-path read over several
    // hive-partitioned roots fails partition discovery (conflicting
    // directory structures)
    postingPaths(path, m)
      .map(g => spark.read.schema(SidecarPostingsSchema).parquet(g))
      .reduce(_ unionByName _).drop("bucket")

  private val SidecarRegistrySchema = "doc_id BIGINT, dl INT"

  private def registryPaths(path: String, m: SidecarMeta): Seq[String] =
    m.gens.map(g => s"$path/registry-g$g")

  /** Union of the per-generation (doc_id, dl) doc registries — the
    * doc-count-sized sidecar the grow guard and the forget stats read
    * INSTEAD of scanning posting rows (O(index) IO per lifecycle op,
    * the cost class this layout exists to avoid). Every indexed doc
    * owns exactly one registry row in exactly one generation (the
    * append collision guard enforces id uniqueness across
    * generations); tombstoned ids KEEP their registry row until
    * compaction — which is what lets the guard reject a re-append that
    * would resurrect their postings. Fails loud on a layout written
    * before the registry existed. */
  private def readSidecarRegistry(
    spark: SparkSession, path: String, m: SidecarMeta): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    registryPaths(path, m).foreach { r =>
      require(fs.exists(new org.apache.hadoop.fs.Path(r)),
        s"$path: missing ${r.substring(r.lastIndexOf('/') + 1)} - this layout " +
          "predates the doc-registry sidecar; rebuild with bm25SidecarWrite " +
          "or bm25SidecarCompact under the current writer")
    }
    registryPaths(path, m)
      .map(r => spark.read.schema(SidecarRegistrySchema).parquet(r))
      .reduce(_ unionByName _)
  }

  /** The word-hash buckets present in `words` — at most the layout
    * modulus, so a metadata-sized driver collect. */
  private def touchedBuckets(words: DataFrame, buckets: Int): Seq[Int] =
    words.select(sidecarBucket(buckets).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq

  /** Publish df-v(cur+1): `newRows` — the complete new (word, df) rows
    * for the `touched` buckets — written bucket-partitioned, every
    * UNTOUCHED bucket directory byte-copied forward from df-v(cur). A
    * grow/forget thus pays changed-vocab COMPUTE and untouched-bucket
    * copy IO, never a vocabulary-wide rewrite; the copied files are
    * byte-identical (the grow gate asserts it). */
  private def writeDfVersion(
    spark: SparkSession, path: String, m: SidecarMeta,
    touched: Seq[Int], newRows: DataFrame): Unit = {
    val next = s"$path/df-v${m.dfV + 1}"
    bucketClustered(newRows.withColumn("bucket", sidecarBucket(m.buckets)))
      .write.partitionBy("bucket").mode("overwrite").parquet(next)
    val hconf = spark.sparkContext.hadoopConfiguration
    val nextP = new org.apache.hadoop.fs.Path(next)
    val fs = nextP.getFileSystem(hconf)
    val touchedDirs = touched.map(b => s"bucket=$b").toSet
    val prior = new org.apache.hadoop.fs.Path(s"$path/df-v${m.dfV}")
    fs.listStatus(prior).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("bucket=") && !touchedDirs(name))
        require(org.apache.hadoop.fs.FileUtil.copy(
          fs, st.getPath, fs, new org.apache.hadoop.fs.Path(nextP, name),
          false, hconf),
          s"bm25 sidecar: could not carry $name forward into df-v${m.dfV + 1}")
    }
  }

  /** One-mutation-late GC (see the section doc): delete the df (and
    * tombstone) version superseded by the PREVIOUS mutation, keeping
    * the one this mutation just superseded alive for racing readers. */
  private def gcSuperseded(
    spark: SparkSession, path: String, dfVGone: Int, rmVGone: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (dfVGone >= 1)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/df-v$dfVGone"), true)
    if (rmVGone >= 1)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/removed-v$rmVGone"), true)
  }

  /** The distinct normalized query words, collected driver-side under
    * the metadata-sized-queries contract (the bm25ScoresFromDir cap +
    * overflow guard). */
  private def collectQueryWords(
    queries: DataFrame, queryTextCol: String,
    maxQueryTerms: Int, what: String): Array[String] = {
    require(maxQueryTerms >= 1 && maxQueryTerms < Int.MaxValue,
      s"maxQueryTerms must be in [1, ${Int.MaxValue - 1}]: $maxQueryTerms")
    val words = queries.select(
        explode(graft.functions.Hashing.normalizedWords(col(queryTextCol)))
          .as("word"))
      .distinct().limit(maxQueryTerms + 1).collect().map(_.getString(0))
    require(words.length <= maxQueryTerms,
      s"$what: queries carry more than $maxQueryTerms distinct terms - " +
        "the query frame must be metadata-sized (terms are collected " +
        "driver-side for partition pruning); raise maxQueryTerms explicitly")
    words
  }

  /** Driver-side buckets of the query words under the layout modulus. */
  private def wantedBuckets(words: Array[String], buckets: Int): IndexedSeq[Int] =
    words.map { w =>
      val h = graft.functions.Md5Long60Expr.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(w))
      (((h % buckets) + buckets) % buckets).toInt
    }.distinct.toIndexedSeq

  /** PARTITION-PRUNED posting read: only the query words' bucket
    * directories open, across every generation. */
  private def prunedSidecarPostings(
    spark: SparkSession, path: String, m: SidecarMeta,
    wanted: IndexedSeq[Int]): DataFrame =
    if (wanted.isEmpty) readSidecarPostings(spark, path, m).filter(lit(false))
    else postingPaths(path, m)
      .map(g => spark.read.schema(SidecarPostingsSchema).parquet(g)
        .filter(col("bucket").isin(wanted: _*)))
      .reduce(_ unionByName _).drop("bucket")

  /** The drop's (word, doc_id, tf, dl) posting rows INCLUDING the
    * NULL-word registry sentinels for token-free docs — the shared
    * projection of the sidecar build and grow arms. */
  private def sidecarPostingsOf(docs: DataFrame): DataFrame = {
    // per-doc TF is ROW-LOCAL (every occurrence of a word lives in one
    // row's array), so the posting build is a pure projection — the
    // earlier explode + groupBy(word, doc_id, dl) spelling paid a full
    // posting-sized Exchange to meet occurrences that were never apart
    // (guide §2.4). The bm25Scores/bm25Index builders deliberately KEEP
    // the groupBy: there the postings Exchange is the materialization
    // point the df branch reuses — see WordTfExpr's scaladoc.
    val postings = docs
      .select(col("doc_id"), col("dl"),
        explode(graft.functions.WordTfExpr(col("w"))).as("wt"))
      .select(col("wt.word").as("word"), col("doc_id"),
        col("wt.tf").as("tf"), col("dl"))
    val tokenless = docs.filter(col("dl") === 0)
      .select(lit(null).cast("string").as("word"), col("doc_id"),
        lit(0L).as("tf"), col("dl"))
    postings.unionByName(tokenless)
  }

  private def sidecarDocs(corpus: DataFrame, textCol: String, idCol: String): DataFrame =
    Dedup.wordTable(corpus, textCol, idCol)
      .select(col("doc_id"), col("w"),
        coalesce(size(col("w")), lit(0)).as("dl"))

  /**
   * Build the stats-sidecar layout fresh from a corpus (see the
   * section doc above). One corpus tokenization for the postings, one
   * column-pruned re-aggregation of the WRITTEN postings for the df
   * sidecar and the global stats (reading the compact artifact back
   * beats a second corpus tokenization, and guarantees the sidecars
   * describe exactly what landed on disk).
   */
  def bm25SidecarWrite(
    corpus: DataFrame,
    textCol: String,
    idCol: String,
    path: String,
    buckets: Int = 32
  ): Unit = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val spark = corpus.sparkSession
    // generations AND the df sidecar are hive-partitioned by the word's
    // hash bucket (the bm25IndexWrite modulus doctrine, carried in the
    // metadata row): probes prune to the query words' buckets across
    // every generation, so probe IO is query-bounded like the
    // denormalized bucketed layout's — on top of the sublinear grows
    bucketClustered(
      sidecarPostingsOf(sidecarDocs(corpus, textCol, idCol))
        .withColumn("bucket", sidecarBucket(buckets)))
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$path/postings-g1")
    val written = spark.read.schema(SidecarPostingsSchema)
      .parquet(s"$path/postings-g1")
    // df sidecar and doc registry are INDEPENDENT derivations of the
    // written postings with disjoint targets — overlapped (guide §2.6)
    // so the second write's tasks back-fill the first's tail
    graft.GraftSession.runConcurrently(Seq(
      () => bucketClustered(
          written.filter(col("word").isNotNull)
            .groupBy("word").agg(count(lit(1)).as("df"))
            .withColumn("bucket", sidecarBucket(buckets)))
        .write.partitionBy("bucket").mode("overwrite").parquet(s"$path/df-v1"),
      // the (doc_id, dl) doc registry: every doc owns ≥ 1 posting row
      // (sentinels included) carrying one (doc_id, dl) per word — the
      // distinct collapses to the registry, persisted per generation so
      // later grows/forgets never scan posting rows
      () => written.select("doc_id", "dl").distinct()
        .write.mode("overwrite").parquet(s"$path/registry-g1")))
    val st = spark.read.schema(SidecarRegistrySchema)
      .parquet(s"$path/registry-g1")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")).cast("long"), lit(0L)).as("s"))
      .head()
    writeSidecarMeta(spark, path,
      SidecarMeta(st.getLong(0), st.getLong(1), gens = Seq(1), dfV = 1, rmV = 0,
        buckets = buckets))
  }

  /** Current tombstone table, None when no forget has run. */
  private def sidecarRemoved(
    spark: SparkSession, path: String, m: SidecarMeta): Option[DataFrame] =
    if (m.rmV == 0) None
    else Some(spark.read.schema("doc_id BIGINT")
      .parquet(s"$path/removed-v${m.rmV}"))

  /**
   * BM25 scores probed from a [[bm25SidecarWrite]] layout —
   * value-identical to [[bm25Scores]] over the live corpus (same
   * exact-long operands through the same arithmetic; the gate pins it
   * under the q_bm25 oracle). Cost shape: the query words' buckets are
   * computed DRIVER-side (queries are metadata-sized by contract —
   * `maxQueryTerms` caps the collect with the bm25ScoresFromDir
   * overflow guard) and PARTITION-PRUNE both the posting generations
   * and the df sidecar, so probe IO opens only matched bucket
   * directories; within them the broadcast term set prunes rows,
   * tombstones anti-join at removal-set size, and N/avgdl are driver
   * metadata — the ONE probe-time join the denormalized layouts avoid,
   * bought back as sublinear grows.
   */
  def bm25ScoresFromSidecar(
    spark: SparkSession,
    path: String,
    queries: DataFrame,
    queryIdCol: String,
    queryTextCol: String,
    k1: Double = 1.2,
    b: Double = 0.75,
    broadcastRemoved: Boolean = true,
    maxQueryTerms: Int = 100000
  ): DataFrame = {
    require(k1 >= 0.0, s"k1 must be non-negative: $k1")
    require(b >= 0.0 && b <= 1.0, s"b must be in [0, 1]: $b")
    val m = readSidecarMeta(spark, path)
    val avgdl = if (m.nDocs == 0L) 0.0 else m.sumDl.toDouble / m.nDocs
    val words = collectQueryWords(queries, queryTextCol, maxQueryTerms,
      "bm25ScoresFromSidecar")
    val wanted = wantedBuckets(words, m.buckets)
    val qterms = queries.select(
      col(queryIdCol).as("query_id"),
      explode(graft.functions.Hashing.normalizedWords(col(queryTextCol))).as("word"))
      .distinct()
    val terms = qterms.select("word").distinct()
    val posts0 = prunedSidecarPostings(spark, path, m, wanted)
      .join(broadcast(terms), Seq("word"), "left_semi")
    val posts = sidecarRemoved(spark, path, m).fold(posts0) { rm =>
      val r = rm.select(col("doc_id").as("__rm_id"))
      posts0.join(if (broadcastRemoved) broadcast(r) else r,
        col("doc_id") === col("__rm_id"), "left_anti")
    }
    val dfT = (if (wanted.isEmpty)
        spark.read.schema(SidecarDfSchema)
          .parquet(s"$path/df-v${m.dfV}").filter(lit(false))
      else spark.read.schema(SidecarDfSchema)
          .parquet(s"$path/df-v${m.dfV}")
          .filter(col("bucket").isin(wanted: _*)))
      .drop("bucket")
      .join(broadcast(terms), Seq("word"), "left_semi")
    val idf: Column =
      log(lit(1.0) + (lit(m.nDocs) - col("df") + 0.5) / (col("df") + 0.5))
    val tfPart: Column =
      col("tf") * (k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / lit(avgdl)))
    posts.join(broadcast(dfT), Seq("word"))
      .select(col("word"), col("doc_id"), (idf * tfPart).as("contrib"))
      .join(broadcast(qterms), Seq("word"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score"))
  }

  /**
   * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
   * the standard hybrid-retrieval combiner: given N per-query ranked
   * lists (each `(query_id, doc_id, rank)`, rank 1-based — e.g.
   * [[bm25TopK]]'s lexical ranking and a
   * [[graft.operators.Similarity.bruteForceTopK]]/IVF dense ranking),
   * every document scores `Σ_lists 1 / (k0 + rank)` and the fused
   * top-`topK` per query comes back as
   * `(query_id, doc_id, rrf_score, rank)`. Rank-based fusion needs no
   * score calibration between lists — the reason RRF is the default
   * hybrid combiner — and `k0` (classically 60) damps the head so one
   * list's #1 cannot dominate every fused decision.
   *
   * Scale shape: input lists are already top-k-bounded per query, so
   * everything here is (queries × k × lists)-sized — one union, one
   * hash aggregation, one WindowGroupLimit ranking; no corpus access.
   * The arithmetic is exact-rational-in-doubles (`1/(k0+rank)` over
   * integer operands, at most `lists` additions per doc), so an oracle
   * re-derives fused scores bit-for-bit.
   *
   * Input contract: each list must be a PROPER ranking — one row per
   * (query_id, doc_id). A list carrying duplicate doc rows would
   * contribute once per row (the aggregation cannot distinguish a
   * malformed list from a legitimate multi-list union); every top-k
   * producer in this engine satisfies the contract by construction.
   *
   * `weights` (opt-in) is the per-list weight — the production knob
   * for trusting one retriever more (`wᵢ / (k0 + rank)`, the weighted
   * RRF of the learned-fusion literature). None (default) is the
   * classic unweighted SIGIR'09 form; each contribution stays ONE
   * double division, so an oracle still re-derives fused scores
   * bit-for-bit.
   */
  def rrfFuse(
    lists: Seq[DataFrame],
    k0: Int = 60,
    topK: Int = 10,
    weights: Option[Seq[Double]] = None
  ): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k0 >= 1, s"k0 must be >= 1: $k0")
    require(topK >= 1, s"topK must be >= 1: $topK")
    weights.foreach { w =>
      require(w.length == lists.length,
        s"rrfFuse: ${w.length} weights for ${lists.length} lists")
      require(w.forall(x => x > 0.0 && !x.isInfinite),
        s"rrfFuse: weights must be positive finite: ${w.mkString(", ")}")
    }
    val prepped = lists.zipWithIndex.map { case (l, i) =>
      val missing = Seq("query_id", "doc_id", "rank").filterNot(l.columns.contains)
      require(missing.isEmpty,
        s"rrfFuse: list $i lacks column(s) ${missing.mkString(", ")} - " +
          "each input must be a per-query ranked list (query_id, doc_id, rank)")
      val wi = weights.map(_(i)).getOrElse(1.0)
      l.select(col("query_id"), col("doc_id"),
        (lit(wi) / (lit(k0) + col("rank")).cast("double")).as("__c"))
    }
    prepped.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id")
      .agg(sum(col("__c")).as("rrf_score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("rrf_score").desc, col("doc_id"))))
      .filter(col("rank") <= topK)
  }

  /** Top-k per query over the sidecar layout: [[bm25ScoresFromSidecar]]
    * + the [[bm25TopK]] ranking — layout parity with the inline,
    * flat-index ([[bm25TopKAgainst]]) and bucketed-dir
    * ([[bm25TopKFromDir]]) arms. row_number ≤ k plans as
    * WindowGroupLimit: each partition surrenders only its local top-k. */
  def bm25TopKFromSidecar(
    spark: SparkSession,
    path: String,
    queries: DataFrame,
    queryIdCol: String,
    queryTextCol: String,
    k: Int = 10,
    k1: Double = 1.2,
    b: Double = 0.75,
    broadcastRemoved: Boolean = true,
    maxQueryTerms: Int = 100000
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    bm25ScoresFromSidecar(spark, path, queries, queryIdCol, queryTextCol,
        k1, b, broadcastRemoved, maxQueryTerms)
      .withColumn("rank",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }

  /** The grow's guarded posting frame: the drop's posting rows plus a
    * raise-or-empty collision-guard leg that semi-joins the drop ids
    * against the REGISTRY sidecars (doc-count-sized) — never a posting
    * generation. Package-visible so the grow gate can pin, on the
    * plan, that the guard reads `registry-g*` paths only. */
  private[graft] def sidecarAppendPostings(
    spark: SparkSession,
    path: String,
    drop: DataFrame,
    textCol: String,
    idCol: String,
    broadcastDrop: Boolean = true
  ): DataFrame = {
    def hinted(df: DataFrame) = if (broadcastDrop) broadcast(df) else df
    val m = readSidecarMeta(spark, path)
    val docs = sidecarDocs(drop, textCol, idCol)
    val newPost = sidecarPostingsOf(docs)
    // collision guard: the registry holds every indexed doc_id —
    // INCLUDING tombstoned ids, whose registry rows survive until
    // compaction precisely so this guard can reject a re-append that
    // would resurrect their postings; evaluated lazily inside the
    // write via a raise-or-empty leg, one doc-count-sized scan
    val dropIds = docs.select(col("doc_id").as("__aid")).distinct()
    readSidecarRegistry(spark, path, m).select("doc_id")
      .join(hinted(dropIds), col("doc_id") === col("__aid"), "left_semi")
      .limit(1)
      .select(
        when(col("doc_id").isNotNull,
          raise_error(concat(
            lit("bm25SidecarAppend: drop id already registered: "),
            col("doc_id").cast("string"),
            lit(" - appending an indexed (or tombstoned) document would " +
              "double-count df/N/avgdl or resurrect forgotten postings; " +
              "forget+compact first or dedup the drop"))))
          .otherwise(lit(null)).cast("string").as("word"),
        col("doc_id"), lit(0L).as("tf"), lit(0).as("dl"))
      .unionByName(newPost)
  }

  /**
   * Grow the sidecar layout by a corpus drop — the SUBLINEAR grow the
   * denormalized layouts cannot offer: writes ONE new posting
   * generation and its (doc-count-sized) registry sidecar — prior
   * generations are never opened for reading OR writing — recomputes
   * only the df buckets containing drop vocabulary (untouched bucket
   * files byte-copied forward, asserted identical in-gate), and flips
   * the metadata row. The collision guard and the N/sum_dl deltas are
   * registry joins; no posting row of any prior generation is read.
   *
   * Ids must be NEW ([[bm25Append]]'s contract): a drop id already
   * registered — including a TOMBSTONED one, whose stale posting rows
   * would come back to life — fails loud inside the posting write
   * action, which aborts before committing any file.
   */
  def bm25SidecarAppend(
    spark: SparkSession,
    path: String,
    drop: DataFrame,
    textCol: String,
    idCol: String,
    broadcastDrop: Boolean = true
  ): Unit = {
    def hinted(df: DataFrame) = if (broadcastDrop) broadcast(df) else df
    val m = readSidecarMeta(spark, path)
    bucketClustered(
      sidecarAppendPostings(spark, path, drop, textCol, idCol, broadcastDrop)
        .withColumn("bucket", sidecarBucket(m.buckets)))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$path/postings-g${m.nextGen}")
    // read the committed generation back ONCE (what was actually
    // written, including the guard leg's outcome) and pin it: the
    // registry derivation, the df aggregation, and the stats fold all
    // consume it — the r18 spelling re-scanned the files three times,
    // a real fixed cost on the lifecycle path. Drop-sized by
    // construction.
    val committed = spark.read.schema(SidecarPostingsSchema)
      .parquet(s"$path/postings-g${m.nextGen}")
      .persist()
    try {
      // registry sidecar for the committed generation (drop-sized);
      // pinned too — the stats fold below re-consumes it
      val reg = committed.select("doc_id", "dl").distinct().persist()
      try {
        // registry write and df-version rewrite are independent
        // derivations of the committed generation with disjoint targets
        // — overlapped (guide §2.6)
        graft.GraftSession.runConcurrently(Seq(
          () => reg.write.mode("overwrite")
            .parquet(s"$path/registry-g${m.nextGen}"),
          () => {
            // df merge: broadcast LEFT join + anti leg (full-outer would
            // not broadcast — the Forget.appendFingerprints doctrine);
            // the old df read is PRUNED to the drop vocabulary's buckets
            // — untouched buckets are byte-copied forward by
            // writeDfVersion, never read
            val aDf = committed
              .filter(col("word").isNotNull)
              .groupBy("word").agg(count(lit(1)).as("__a_df"))
              .persist()
            try {
              val touched = touchedBuckets(aDf.select("word"), m.buckets)
              val oldDf = spark.read.schema(SidecarDfSchema)
                .parquet(s"$path/df-v${m.dfV}")
                .filter(if (touched.isEmpty) lit(false)
                  else col("bucket").isin(touched: _*))
                .drop("bucket")
              val merged = oldDf.join(hinted(aDf), Seq("word"), "left")
                .select(col("word"),
                  (col("df") + coalesce(col("__a_df"), lit(0L))).as("df"))
              val matched = oldDf.select("word")
                .join(hinted(aDf.select("word")), Seq("word"), "left_semi")
              val newOnly = aDf
                .join(if (broadcastDrop) broadcast(matched) else matched,
                  Seq("word"), "left_anti")
                .select(col("word"), col("__a_df").as("df"))
              writeDfVersion(spark, path, m, touched, merged.unionByName(newOnly))
            } finally aDf.unpersist()
          }))
        // global stats deltas from the committed generation's registry
        // (the frame just written — identical rows, no file re-read)
        val st = reg
          .agg(count(lit(1)).as("n"),
            coalesce(sum(col("dl")).cast("long"), lit(0L)).as("s"))
          .head()
        writeSidecarMeta(spark, path,
          m.copy(nDocs = m.nDocs + st.getLong(0), sumDl = m.sumDl + st.getLong(1),
            gens = m.gens :+ m.nextGen, dfV = m.dfV + 1))
      } finally reg.unpersist()
    } finally committed.unpersist()
    // one-mutation-late GC: keep the version this flip superseded
    // alive for racing readers, drop the one before it
    gcSuperseded(spark, path, dfVGone = m.dfV - 1, rmVGone = 0)
  }

  /**
   * Forget documents from the sidecar layout WITHOUT rewriting posting
   * bytes — the same sidecar deltas as the grow arm, run in reverse:
   * tombstone the removed ids (probes anti-join them; the ids-actually-
   * indexed set and the N/sum_dl deltas come from the doc-registry
   * sidecar, never a posting scan), decrement the
   * touched words' df (removal-vocab-sized compute over one pruned
   * posting pass), decrement N/sum_dl exactly. Ids absent from the
   * index are no-ops ([[bm25Forget]] parity); ids ALREADY tombstoned
   * fail loud — double-forgetting would double-decrement the
   * statistics. Tombstones accumulate; [[bm25SidecarCompact]] purges.
   */
  def bm25SidecarForget(
    spark: SparkSession,
    path: String,
    removed: DataFrame,
    removedIdCol: String,
    broadcastRemoved: Boolean = true
  ): Unit = {
    def hinted(df: DataFrame) = if (broadcastRemoved) broadcast(df) else df
    val m = readSidecarMeta(spark, path)
    val rem = removed.select(col(removedIdCol).as("__rid")).distinct()
    val oldRm = sidecarRemoved(spark, path, m)
    // double-forget guard (lazy, rides the tombstone write below)
    val guarded = oldRm.fold(rem) { prior =>
      val dup = prior.select(col("doc_id").as("__rid"))
        .join(hinted(rem), Seq("__rid"), "left_semi").limit(1)
      rem.unionByName(dup.select(
        when(col("__rid").isNotNull,
          raise_error(concat(
            lit("bm25SidecarForget: id already tombstoned: "),
            col("__rid").cast("string"),
            lit(" - double-forgetting would double-decrement df/N/sum_dl"))))
          .otherwise(lit(null)).cast("long").as("__rid")))
    }
    // the forgotten docs' (doc_id, dl): a REGISTRY semi join — the
    // r17 spelling re-derived these from a full posting scan, O(index)
    // IO per takedown. Registry rows are unique per id (the append
    // guard), so no distinct is needed. Removal-sized after the join;
    // persisted because the tombstone write and the stats fold both
    // consume it.
    val removedReg = readSidecarRegistry(spark, path, m)
      .join(hinted(guarded), col("doc_id") === col("__rid"), "left_semi")
      .persist()
    try {
      // new tombstone version: prior tombstones ∪ the newly forgotten
      // ids ACTUALLY indexed (absent ids are no-ops and must not
      // tombstone — a later legitimate append of that id would fail
      // for no reason)
      val newRm = removedReg.select("doc_id")
      oldRm.fold(newRm)(_.unionByName(newRm))
        .write.mode("overwrite").parquet(s"$path/removed-v${m.rmV + 1}")
      // df decrement: the ONE lifecycle read that legitimately needs
      // posting rows (a removed doc's words are not knowable from any
      // sidecar) — column-pruned to (word, doc_id). Only the touched
      // words' buckets are recomputed; untouched bucket files are
      // byte-copied forward.
      val rDf = readSidecarPostings(spark, path, m)
        .join(hinted(guarded), col("doc_id") === col("__rid"), "left_semi")
        .filter(col("word").isNotNull)
        .groupBy("word").agg(count(lit(1)).as("__r_df"))
        .persist()
      try {
        val touched = touchedBuckets(rDf.select("word"), m.buckets)
        val decremented = spark.read.schema(SidecarDfSchema)
          .parquet(s"$path/df-v${m.dfV}")
          .filter(if (touched.isEmpty) lit(false) else col("bucket").isin(touched: _*))
          .drop("bucket")
          .join(hinted(rDf), Seq("word"), "left")
          .select(col("word"),
            (col("df") - coalesce(col("__r_df"), lit(0L))).as("df"))
          .filter(col("df") > 0)
        writeDfVersion(spark, path, m, touched, decremented)
      } finally rDf.unpersist()
      val st = removedReg
        .agg(count(lit(1)).as("n"),
          coalesce(sum(col("dl")).cast("long"), lit(0L)).as("s"))
        .head()
      writeSidecarMeta(spark, path,
        m.copy(nDocs = m.nDocs - st.getLong(0), sumDl = m.sumDl - st.getLong(1),
          dfV = m.dfV + 1, rmV = m.rmV + 1))
    } finally removedReg.unpersist()
    // one-mutation-late GC (see the section doc)
    gcSuperseded(spark, path, dfVGone = m.dfV - 1, rmVGone = m.rmV - 1)
  }

  /**
   * Bound the sidecar layout's GENERATION COUNT without a compaction:
   * every probe opens each live generation's matched bucket
   * directories, so daily drops grow per-probe file counts without
   * bound, and [[bm25SidecarCompact]] — the only prior remedy — pays a
   * full-corpus rewrite. This merges the SMALLEST generations (by
   * on-disk bytes) down to `maxGenerations` live ones: their posting
   * and registry rows are unioned into ONE fresh generation id, the
   * metadata's generation list flips to (kept ++ merged), and the
   * superseded generation directories become orphans — deleted one
   * mutation late (the next merge's GC), so a reader racing the flip
   * finishes against its generation set. Merging smallest-first makes
   * the rewrite bytes the MINIMUM possible for the target count — the
   * standard LSM small-run compaction economics, and exactly right for
   * the daily-drop shape (many small drop generations, one huge build
   * generation that is never touched).
   *
   * df/N/sum_dl are untouched BY CONSTRUCTION (a merge moves rows
   * between files, it changes no statistic); tombstoned rows ride
   * along still masked (only [[bm25SidecarCompact]] purges them), and
   * their registry rows keep re-append rejection working across the
   * merge. In-place by design — unlike compact there is no cross-corpus
   * rewrite to stage, and generation ids are never reused, so the flip
   * has the same crash-safety as a grow (a crash leaves orphan dirs
   * and an unchanged pointer).
   */
  def bm25SidecarMergeGenerations(
    spark: SparkSession,
    path: String,
    maxGenerations: Int = 8
  ): Unit = {
    require(maxGenerations >= 1, s"maxGenerations must be >= 1: $maxGenerations")
    val m = readSidecarMeta(spark, path)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    // one-mutation-late GC of ORPHAN generation dirs (ids on disk but
    // not in the live list — superseded by an earlier merge's flip)
    def gcOrphanGens(live: Set[Int]): Unit =
      Seq("postings-g", "registry-g").foreach { prefix =>
        fs.globStatus(new org.apache.hadoop.fs.Path(path, prefix + "*"))
          .foreach { st =>
            st.getPath.getName.stripPrefix(prefix).toIntOption.foreach { id =>
              if (!live.contains(id)) fs.delete(st.getPath, true)
            }
          }
      }
    if (m.gens.size <= maxGenerations) { gcOrphanGens(m.gens.toSet); return }
    val bySize = m.gens
      .map(g => g -> fs.getContentSummary(
        new org.apache.hadoop.fs.Path(s"$path/postings-g$g")).getLength)
      .sortBy(_._2)
    val nMerge = m.gens.size - maxGenerations + 1
    val merged = bySize.take(nMerge).map(_._1)
    val kept = m.gens.filterNot(merged.contains)
    val newGen = m.nextGen
    // rewrite = union of the merged generations only (smallest-first
    // bytes); bucket partitioning carries over so probe pruning is
    // unchanged. Posting and registry rewrites read disjoint sources
    // and write disjoint targets — overlapped (guide §2.6)
    graft.GraftSession.runConcurrently(Seq(
      () => bucketClustered(
          merged
            .map(g => spark.read.schema(SidecarPostingsSchema)
              .parquet(s"$path/postings-g$g"))
            .reduce(_ unionByName _))
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(s"$path/postings-g$newGen"),
      () => merged
        .map(g => spark.read.schema(SidecarRegistrySchema)
          .parquet(s"$path/registry-g$g"))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$path/registry-g$newGen")))
    writeSidecarMeta(spark, path, m.copy(gens = kept :+ newGen))
    gcOrphanGens((kept :+ newGen).toSet ++ merged.toSet)
  }

  /**
   * Amortized maintenance for the sidecar layout: rewrite the live
   * postings (minus tombstones) as ONE fresh generation at `outPath`,
   * carrying the current df sidecar and stats over unchanged — the
   * full-rewrite cost the per-drop grows and per-takedown forgets
   * deferred, paid once when tombstone volume or generation count
   * warrants it. Write-fresh-and-flip-a-pointer, like
   * [[bm25AppendDir]].
   */
  def bm25SidecarCompact(
    spark: SparkSession,
    path: String,
    outPath: String
  ): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    def resolved(s: String): org.apache.hadoop.fs.Path = {
      val raw = new org.apache.hadoop.fs.Path(s)
      val fs = raw.getFileSystem(hconf)
      try fs.resolvePath(raw)
      catch { case _: java.io.FileNotFoundException => fs.makeQualified(raw) }
    }
    require(resolved(outPath) != resolved(path),
      s"bm25SidecarCompact: outPath resolves to the source path ($path) - " +
        "write fresh and flip a pointer")
    val m = readSidecarMeta(spark, path)
    val live = sidecarRemoved(spark, path, m).fold(
      readSidecarPostings(spark, path, m)) { rm =>
      val r = rm.select(col("doc_id").as("__rm_id"))
      readSidecarPostings(spark, path, m)
        .join(broadcast(r), col("doc_id") === col("__rm_id"), "left_anti")
    }
    // the registry compacts the same way: live rows only — tombstoned
    // ids lose their registry row here, which is what re-opens their
    // ids for a legitimate later append
    val liveReg = sidecarRemoved(spark, path, m).fold(
      readSidecarRegistry(spark, path, m)) { rm =>
      val r = rm.select(col("doc_id").as("__rm_id"))
      readSidecarRegistry(spark, path, m)
        .join(broadcast(r), col("doc_id") === col("__rm_id"), "left_anti")
    }
    // postings, registry, and df carry-over read disjoint sources and
    // write disjoint targets — overlapped (guide §2.6)
    graft.GraftSession.runConcurrently(Seq(
      () => bucketClustered(live.withColumn("bucket", sidecarBucket(m.buckets)))
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(s"$outPath/postings-g1"),
      () => liveReg.write.mode("overwrite").parquet(s"$outPath/registry-g1"),
      () => bucketClustered(
          spark.read.schema(SidecarDfSchema)
            .parquet(s"$path/df-v${m.dfV}").drop("bucket")
            .withColumn("bucket", sidecarBucket(m.buckets)))
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(s"$outPath/df-v1")))
    writeSidecarMeta(spark, outPath,
      SidecarMeta(m.nDocs, m.sumDl, gens = Seq(1), dfV = 1, rmV = 0, m.buckets))
  }

  /** Top-k per query over the persisted index: [[bm25ScoresAgainst]]
    * + the [[bm25TopK]] WindowGroupLimit ranking. */
  def bm25TopKAgainst(
    index: DataFrame,
    queries: DataFrame,
    queryIdCol: String,
    queryTextCol: String,
    k: Int = 10,
    k1: Double = 1.2,
    b: Double = 0.75
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    bm25ScoresAgainst(index, queries, queryIdCol, queryTextCol, k1, b)
      .withColumn("rank",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }

  /**
   * Top-k documents per query: (query_id, doc_id, score, rank), rank
   * 1..k by score desc with doc_id tiebreak. row_number ≤ k plans as
   * WindowGroupLimit — each partition surrenders only its local top-k
   * (the [[Sampling.topKBy]] economics; RetrievalSpec asserts it).
   */
  def bm25TopK(
    corpus: DataFrame,
    textCol: String,
    idCol: String,
    queries: DataFrame,
    queryIdCol: String,
    queryTextCol: String,
    k: Int = 10,
    k1: Double = 1.2,
    b: Double = 0.75
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    bm25Scores(corpus, textCol, idCol, queries, queryIdCol, queryTextCol, k1, b)
      .withColumn("rank",
        row_number().over(
          Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }
}
