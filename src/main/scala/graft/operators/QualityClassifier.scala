package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * FastText-style linear quality classifier (Joulin et al. 2016,
 * arXiv:1607.01759 "Bag of Tricks for Efficient Text Classification") —
 * the model-based quality filter the CCNet / LLaMA data recipes run
 * after rule-based gates: score every document by a trained linear
 * model over hashed gram features and keep what looks like the
 * reference corpus.
 *
 * Features are the SAME hashed unigram+bigram bucket space as [[Dsir]]
 * ([[Dsir.gramBuckets]] — md5-based, so the DuckDB oracle re-derives
 * every bucket): one feature pipeline serves importance RESAMPLING
 * (DSIR) and model-based SCORING, and an artifact fitted against either
 * notion of "target-like" is comparable with the other. A document's
 * score is `sigmoid(bias + Σ_b w_b·c_b / N)` — the mean bucket weight
 * over its N gram occurrences (fastText's mean-of-embeddings with a
 * 1-d "embedding" per bucket).
 *
 * Scale shape, scoring (the 100 TB operation): the model is a dense
 * (bucket, weight) spine — metadata-sized, broadcast — and scoring is
 * one corpus scan: explode grams, join the broadcast model at the gram
 * level, partially aggregate per document (shuffle volume: one row per
 * doc — the [[Dsir.importanceWeights]] shape). Gram counts are never
 * shuffled.
 *
 * Scale shape, fitting: logistic regression by full-batch gradient
 * descent — the per-doc sparse feature lists are built once, persisted
 * for the duration of the fit (released before return; fitting is an
 * ACTION, so the persist cannot leak), and each iteration is one
 * `treeAggregate` of a D-sized dense gradient with the current weights
 * broadcast. D defaults small (4096) because quality models are
 * vocabulary sketches, not language models; iterations × one pass over
 * doc-sized feature rows is the inherent cost of an iterative fit.
 */
object QualityClassifier {

  /** A fitted model: the dense per-bucket weight spine plus the bias.
    * `weights` is a driver-local relation (metadata-sized) — persist it
    * to parquet alongside the bias for reuse across runs. */
  final case class Model(weights: DataFrame, bias: Double)

  /**
   * Score documents under a fitted (or literal) weight spine:
   * (doc_id, quality_score) with score = sigmoid(bias + Σ w·c / N).
   * The bucket modulus is READ OFF the dense model (validated, not
   * assumed — [[Dsir.importanceWeights]]' contract: a filtered model
   * would silently re-bucket every document). Documents with zero
   * grams have no profile and are absent (the DSIR convention).
   */
  def score(
    df: DataFrame,
    weights: DataFrame,
    textCol: String,
    idCol: String,
    bias: Double = 0.0
  ): DataFrame = {
    // one collect validates density AND feeds the broadcast (the spine
    // comes back as a LocalRelation) — scoring runs exactly one corpus
    // job, with no per-call validation aggregation or broadcast re-scan
    val (spine, nBuckets) = Dsir.localizedDenseSpine(weights, "QualityClassifier.fit")
    Dsir.gramBuckets(df, textCol, idCol, nBuckets)
      .join(broadcast(spine), Seq("bucket"))
      .groupBy("doc_id")
      .agg((lit(1.0) /
        (lit(1.0) + exp(-(lit(bias) + sum(col("weight")) / count(lit(1))))))
        .as("quality_score"))
  }

  /**
   * Row-LOCAL scoring — the ZERO-SHUFFLE plan for the same math as
   * [[score]]: the dense spine is metadata-sized, so it collapses into
   * a literal map inside one projection — per document, hash the grams
   * ([[Dsir.gramHashesOf]], the identical feature derivation), look
   * each bucket up in the map, mean, sigmoid. No explode, no join, no
   * per-doc regroup: where [[score]] shuffles one row per document,
   * this shuffles NOTHING — the score materializes inside the scan,
   * and predicate pushdown can drop rejected documents before they
   * move. Being a pure stateless projection it also runs UNCHANGED on
   * a `readStream` (no watermark, no state store) — the streaming arm
   * of model-based quality filtering.
   *
   * Same output as [[score]] up to float summation order (left-to-right
   * over the gram array here, partial-aggregation order there): ulp
   * differences, identical at any sane rounding. Zero-gram documents
   * are dropped (the [[score]] absence convention). The spine rides the
   * plan as a literal — fine for classifier-sized D (the 4096 default
   * is ~64 KB of plan); refuse corpus-sized spines rather than build a
   * megabyte literal.
   */
  def scoreInline(
    df: DataFrame,
    weights: DataFrame,
    textCol: String,
    idCol: String,
    bias: Double = 0.0
  ): DataFrame = {
    // the local spine shares validation's ONE collect; the follow-up
    // select().collect() below runs on a LocalRelation (driver-side,
    // no Spark job)
    val (spine, nBuckets) = Dsir.localizedDenseSpine(weights, "QualityClassifier.fit")
    require(nBuckets <= (1 << 16),
      s"scoreInline embeds the spine as a plan literal — $nBuckets buckets is " +
        "past the 65536 cap; use score() (broadcast join) for larger models")
    // the spine is DENSE 0..D−1, so it rides as a plain weight ARRAY
    // inside one native expression ([[graft.functions.BucketMeanExpr]]
    // — O(1) indexed, one tight loop). The first spelling here used
    // `aggregate` + a map literal: the HOF pays an interpreted lambda
    // frame per gram and GetMapValue a linear key scan per lookup —
    // measured ~2× SLOWER than the broadcast join it was meant to beat
    val w = new Array[Double](nBuckets)
    spine.select(col("bucket").cast("long"), col("weight").cast("double"))
      .collect().foreach(r => w(r.getLong(0).toInt) = r.getDouble(1))
    val grams = Dsir.gramHashesOf(
      graft.functions.Hashing.normalizedWords(col(textCol)))
    // zero-gram absence via the CHEAP exact predicate (no grams ⇔ the
    // normalized text is empty), kept OUT of the projection: filtering
    // on the score itself inlines the whole gram chain into the Filter
    // AND the Project (alias substitution during predicate pushdown) —
    // measured as 2× the entire scoring cost
    df.filter(graft.functions.Hashing.normalizeText(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(-(lit(bias) +
          graft.functions.BucketMeanExpr(grams, w.toSeq)))))
          .as("quality_score"))
  }

  /** A fitted K-class model: label order (= weight-row order), the
    * dense per-(label, bucket) weight table, and per-label biases. */
  final case class MultiModel(
    labels: IndexedSeq[String], weights: DataFrame, biases: Map[String, Double])

  /**
   * Row-LOCAL K-class scoring — the multi-class arm of [[scoreInline]]
   * (same zero-shuffle/streaming-safe shape): per document, one
   * [[graft.functions.BucketMeanExpr]] per class over the shared gram
   * hashes, softmax over the K logits, argmax with first-label
   * precedence on exact ties. Output (doc_id, label_pred, label_prob)
   * where label_prob is the winner's softmax probability — the
   * confidence a routing pipeline thresholds on. Zero-gram documents
   * are absent (the [[score]] convention). K is class-count-sized
   * (language ID ~dozens), so K tight loops stay a scan-local cost.
   */
  def scoreMultiInline(
    df: DataFrame,
    model: MultiModel,
    textCol: String,
    idCol: String
  ): DataFrame = {
    require(model.labels.nonEmpty, "model has no classes")
    require(model.labels.distinct == model.labels,
      s"duplicate labels in model: ${model.labels}")
    // one localizing collect serves all K density validations
    val (spine, nBuckets) =
      Dsir.localizedDenseSpine(
        model.weights.filter(col("label") === model.labels.head)
          .select("bucket", "weight"), "QualityClassifier.fitMulti")
    val w = Array.fill(model.labels.size)(new Array[Double](nBuckets))
    val byLabel = model.weights
      .select(col("label").cast("string"), col("bucket").cast("long"),
        col("weight").cast("double"))
      .collect()
    val labelIdx = model.labels.zipWithIndex.toMap
    byLabel.foreach { r =>
      val li = labelIdx.getOrElse(r.getString(0),
        throw new IllegalArgumentException(
          s"weight row for unknown label '${r.getString(0)}'"))
      val b = r.getLong(1)
      require(b >= 0 && b < nBuckets,
        s"bucket $b outside the dense spine 0..${nBuckets - 1}")
      w(li)(b.toInt) = r.getDouble(2)
    }
    require(byLabel.length == model.labels.size * nBuckets,
      s"weights table is not K dense spines: ${byLabel.length} rows for " +
        s"${model.labels.size} labels × $nBuckets buckets")
    val grams = Dsir.gramHashesOf(
      graft.functions.Hashing.normalizedWords(col(textCol)))
    val z = model.labels.indices.map { i =>
      (lit(model.biases(model.labels(i))) +
        graft.functions.BucketMeanExpr(grams, w(i).toSeq)).as(s"__z$i")
    }
    val scored = df
      .filter(graft.functions.Hashing.normalizeText(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id") +: z: _*)
    val zCols = model.labels.indices.map(i => col(s"__z$i"))
    val zMax = greatest(zCols: _*)
    // numerically-stable softmax of the winner: exp(z−max) then
    // normalize; sumExp ≥ 1 by construction (the max term)
    val sumExp = zCols.map(zc => exp(zc - zMax)).reduce(_ + _)
    val pred = model.labels.indices.init.foldLeft(
      when(zCols.head === zMax, lit(model.labels.head))) { case (acc, i) =>
        acc.when(zCols(i) === zMax, lit(model.labels(i)))
      }.otherwise(lit(model.labels.last))
    scored.select(
      col("doc_id"),
      pred.as("label_pred"),
      (lit(1.0) / sumExp).as("label_prob"))
  }

  /**
   * Fit the K-class arm by full-batch softmax regression on the same
   * hashed-gram feature space as [[fit]]: per-doc sparse features built
   * once and persisted across the iteration loop, each iteration ONE
   * `treeAggregate` of a K×D dense gradient with the current weights
   * broadcast (K×D for language-ID-sized K is a few hundred KB — still
   * metadata). Labels come from the data (sorted distinct), so the
   * caller controls classes by controlling the training frame.
   */
  def fitMulti(
    df: DataFrame,
    textCol: String,
    labelCol: String,
    idCol: String,
    nBuckets: Int = 4096,
    iters: Int = 50,
    lr: Double = 1.0,
    l2: Double = 1e-6
  ): MultiModel = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(iters >= 1, s"iters must be >= 1: $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val labels = df.select(col(labelCol).cast("string"))
      .filter(col(labelCol).isNotNull)
      .distinct().as[String].collect().sorted.toIndexedSeq
    require(labels.size >= 2, s"need >= 2 classes, found ${labels.size}")
    val labelIdx = labels.zipWithIndex.toMap
    val k = labels.size
    val feats = Dsir.gramBuckets(df, textCol, idCol, nBuckets)
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("bucket").cast("int"), col("c").cast("double"))).as("f"))
      .join(
        df.select(col(idCol).as("doc_id"), col(labelCol).cast("string").as("__y")),
        Seq("doc_id"))
      .select(col("__y"), col("f"))
      .as[(String, Seq[(Int, Double)])]
      .map { case (y, f) =>
        val n = f.map(_._2).sum
        (labelIdx(y), f.map { case (b, c) => (b, c / n) }.toArray)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = feats.count().toDouble
      require(nDocs >= 1, "no documents with grams to fit on")
      var wFlat = new Array[Double](k * nBuckets) // row-major K × D
      var b = new Array[Double](k)
      var it = 0
      while (it < iters) {
        val bw = spark.sparkContext.broadcast(wFlat)
        val bb = spark.sparkContext.broadcast(b)
        val (gw, gb) = feats.rdd.treeAggregate(
          (new Array[Double](k * nBuckets), new Array[Double](k)))(
          seqOp = { case ((aw, ab), (y, f)) =>
            val z = new Array[Double](k)
            var c = 0
            while (c < k) {
              var s = bb.value(c)
              var i = 0
              while (i < f.length) { s += bw.value(c * nBuckets + f(i)._1) * f(i)._2; i += 1 }
              z(c) = s
              c += 1
            }
            var zMax = z(0); c = 1
            while (c < k) { if (z(c) > zMax) zMax = z(c); c += 1 }
            var sum = 0.0; c = 0
            while (c < k) { z(c) = math.exp(z(c) - zMax); sum += z(c); c += 1 }
            c = 0
            while (c < k) {
              val d = z(c) / sum - (if (c == y) 1.0 else 0.0)
              ab(c) += d
              var i = 0
              while (i < f.length) { aw(c * nBuckets + f(i)._1) += d * f(i)._2; i += 1 }
              c += 1
            }
            (aw, ab)
          },
          combOp = { case ((aw, ab), (cw, cb)) =>
            var i = 0
            while (i < aw.length) { aw(i) += cw(i); i += 1 }
            i = 0
            while (i < k) { ab(i) += cb(i); i += 1 }
            (aw, ab)
          })
        bw.destroy(); bb.destroy()
        val nextW = new Array[Double](k * nBuckets)
        var i = 0
        while (i < nextW.length) {
          nextW(i) = wFlat(i) - lr * (gw(i) / nDocs + l2 * wFlat(i))
          i += 1
        }
        wFlat = nextW
        val nextB = new Array[Double](k)
        i = 0
        while (i < k) { nextB(i) = b(i) - lr * gb(i) / nDocs; i += 1 }
        b = nextB
        it += 1
      }
      val rows = for {
        c <- 0 until k
        d <- 0 until nBuckets
      } yield (labels(c), d.toLong, wFlat(c * nBuckets + d))
      val spine = Similarity.localize(
        spark.createDataFrame(rows).toDF("label", "bucket", "weight"))
      MultiModel(labels, spine, labels.zipWithIndex.map { case (l, i) => l -> b(i) }.toMap)
    } finally feats.unpersist()
  }

  /**
   * Fit by full-batch logistic regression: minimize mean log-loss (+ L2)
   * of `labelCol` ∈ {0, 1} against sigmoid(bias + Σ w·c/N) with `iters`
   * gradient steps at rate `lr`. Returns the dense weight spine
   * (localized — downstream consumers cannot re-trigger the fit) and
   * the bias. Deterministic up to float summation order in the gradient
   * aggregate (the classifier's decisions are threshold-scale; a 1-ulp
   * gradient wiggle does not move them — exact-replay scoring is the
   * gate-checked path above, which is expression-level).
   */
  def fit(
    df: DataFrame,
    textCol: String,
    labelCol: String,
    idCol: String,
    nBuckets: Int = 4096,
    iters: Int = 50,
    lr: Double = 1.0,
    l2: Double = 1e-6
  ): Model = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(iters >= 1, s"iters must be >= 1: $iters")
    // logistic loss assumes y ∈ {0, 1}; a score-valued or multi-class
    // label column would silently skew gradients (p − y leaves [−1, 1])
    // into a plausible-looking but meaningless model — fail loudly
    require(
      df.filter(col(labelCol).isNotNull &&
        !col(labelCol).cast("double").isin(0.0, 1.0)).isEmpty,
      s"fit() is binary logistic regression: label column '$labelCol' has " +
        "values outside {0, 1} — binarize it (or pick the right column) first")
    val spark = df.sparkSession
    import spark.implicits._
    // per-doc sparse features: (label, [(bucket, c/N)]) — built once,
    // persisted across the iteration loop, freed before return
    val feats = Dsir.gramBuckets(df, textCol, idCol, nBuckets)
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("bucket").cast("int"), col("c").cast("double"))).as("f"))
      // labels join one row per doc, after aggregation
      .join(
        df.select(col(idCol).as("doc_id"), col(labelCol).cast("double").as("__y")),
        Seq("doc_id"))
      .select(col("__y"), col("f"))
      .as[(Double, Seq[(Int, Double)])]
      .map { case (y, f) =>
        val n = f.map(_._2).sum
        (y, f.map { case (b, c) => (b, c / n) }.toArray)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = feats.count().toDouble
      require(nDocs >= 1, "no documents with grams to fit on")
      var w = new Array[Double](nBuckets)
      var b = 0.0
      var it = 0
      while (it < iters) {
        val bw = spark.sparkContext.broadcast(w)
        val bb = b
        // dense D-sized gradient: treeAggregate keeps the combine tree
        // shallow and the driver receives one array, not one per task
        val (gw, gb) = feats.rdd.treeAggregate((new Array[Double](nBuckets), 0.0))(
          seqOp = { case ((aw, ab), (y, f)) =>
            var z = bb
            var i = 0
            while (i < f.length) { z += bw.value(f(i)._1) * f(i)._2; i += 1 }
            val p = 1.0 / (1.0 + math.exp(-z))
            val d = p - y
            i = 0
            while (i < f.length) { aw(f(i)._1) += d * f(i)._2; i += 1 }
            (aw, ab + d)
          },
          combOp = { case ((aw, ab), (cw, cb)) =>
            var i = 0
            while (i < nBuckets) { aw(i) += cw(i); i += 1 }
            (aw, ab + cb)
          })
        bw.destroy()
        val next = new Array[Double](nBuckets)
        var i = 0
        while (i < nBuckets) {
          next(i) = w(i) - lr * (gw(i) / nDocs + l2 * w(i))
          i += 1
        }
        w = next
        b -= lr * gb / nDocs
        it += 1
      }
      val spine = Similarity.localize(
        spark.createDataFrame(w.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v) })
          .toDF("bucket", "weight"))
      Model(spine, b)
    } finally feats.unpersist()
  }
}
