package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Pluggable language-ID over a LOADED public-format model — the
 * deployment-grade arm of §2.4 row 33 beside the built-in 10-family
 * stopword vote ([[TextAnalysis.langId]]): a fastText-style supervised
 * text model read from disk (the [[Bpe.load]] precedent — GPT-2 merges
 * file there, the `.vec` text dump here), scored with this engine's
 * relational machinery.
 *
 * Model format — the fastText `.vec`/text convention
 * (https://fasttext.cc, "Text format" docs): an optional header line
 * `<rows> <dim>`, then one line per token `<token> v1 … v<dim>`
 * (space-separated decimals). Supervised fastText dumps LABEL vectors
 * under the `__label__<name>` prefix alongside the word vectors; this
 * loader splits on that prefix. Prediction follows the fastText linear
 * head: a document's hidden state is the MEAN of its matched word
 * vectors and the predicted label is `argmax_label dot(hidden, label
 * vector)` — with the documented divergence that out-of-vocabulary
 * tokens contribute nothing (fastText's subword n-grams are a training
 * artifact the text dump does not carry), so a document matching NO
 * vocabulary row predicts `und` with score 0, the
 * [[TextAnalysis.langId]] convention.
 *
 * Scale shape: the vocabulary is model-sized (broadcast into the one
 * word join); the corpus explodes to its word rows once, folds to one
 * mean vector per doc ([[graft.functions.VectorMeanAgg]] — map-side
 * partials, ≤ dim doubles per doc into the shuffle), and the label
 * argmax is a row-local projection LINEAR in label count (staged
 * per-label score columns + greatest + when-chain). The corpus text is
 * scanned once and never shuffled.
 */
object LangModel {

  /** A loaded model: `words` is the (token, vec) vocabulary —
    * model-sized, broadcast at scoring time; `labels` the (label,
    * vector) output head, driver-local by contract (label counts are
    * language counts); `dim` the validated vector width. */
  final case class VecModel(
    words: DataFrame,
    labels: Seq[(String, Array[Double])],
    dim: Int)

  private val LabelPrefix = "__label__"

  /**
   * Load a fastText-format text model from `path`. Fails loud on: no
   * label rows (an unsupervised embedding dump cannot classify),
   * inconsistent vector widths, or non-numeric vector entries — a
   * silently NULLed weight would quietly bias every prediction.
   * The word table is returned as a DataFrame (distributed parse — a
   * real vocabulary can be millions of rows); labels collect to the
   * driver (label count = language count, metadata-sized).
   */
  def load(spark: SparkSession, path: String): VecModel = {
    // CRLF checkouts and stray spaces are normal for downloaded model
    // files. Spark's trim strips SPACES only (not '\r'), so the robust
    // spelling is: split on \s+ (which eats the '\r' as a delimiter)
    // and FILTER the empty fragments a leading/trailing delimiter
    // leaves behind — otherwise the '' token reaches cast('double')
    // and a well-formed model is rejected as non-numeric (and a CRLF
    // header line would sneak past the field-count filter as data).
    val raw = spark.read.text(path)
      .select(filter(split(col("value"), "\\s+"), x => x =!= "").as("p"))
      // the optional "<rows> <dim>" header is the only line with < 3
      // fields; blank lines drop here too
      .filter(size(col("p")) >= 3)
    val parsed = raw.select(
      col("p").getItem(0).as("token"),
      transform(slice(col("p"), lit(2), size(col("p")) - 1),
        x => x.cast("double")).as("vec"))
    // fail-loud validation in ONE metadata-sized aggregation pass:
    // every row numeric (no NULL after cast) and one consistent width
    val audit = try parsed.agg(
      count(lit(1)).as("n"),
      countDistinct(size(col("vec"))).as("n_dims"),
      max(size(col("vec"))).as("dim"),
      sum(when(exists(col("vec"), _.isNull), 1L).otherwise(0L)).as("bad"))
      .collect().head
    catch {
      // ANSI mode (the engine default) throws on the malformed cast
      // before the NULL audit can count it — same fail-loud contract,
      // one message (SparkNumberFormatException extends NFE). On a
      // DISTRIBUTED run the NFE arrives WRAPPED in a stage-failure
      // SparkException, so walk the cause chain before giving up —
      // otherwise the friendly model-format diagnosis only fires in
      // local mode (the r20 advice item).
      case e: Throwable if {
        var c: Throwable = e
        var hit = false
        while (c != null && !hit) {
          hit = c.isInstanceOf[NumberFormatException]
          c = c.getCause
        }
        hit
      } => throw new IllegalArgumentException(
        s"$path has non-numeric vector entries - not a fastText " +
          "text-format model", e)
    }
    require(audit.getLong(0) > 0, s"$path holds no vector rows")
    require(audit.getLong(3) == 0L,
      s"$path has ${audit.getLong(3)} rows with non-numeric vector " +
        "entries - not a fastText text-format model")
    require(audit.getLong(1) == 1L,
      s"$path mixes ${audit.getLong(1)} vector widths - not a " +
        "fastText text-format model")
    val dim = audit.getInt(2) // max(size) is Int
    val labels = parsed.filter(col("token").startsWith(LabelPrefix))
      .collect()
      .map(r => r.getString(0).stripPrefix(LabelPrefix) ->
        r.getSeq[Double](1).toArray)
      .toSeq.sortBy(_._1)
    require(labels.nonEmpty,
      s"$path carries no $LabelPrefix rows - an unsupervised embedding " +
        "dump cannot classify; export the supervised model's text dump")
    val words = parsed.filter(!col("token").startsWith(LabelPrefix))
    VecModel(words, labels, dim)
  }

  /** Dot product of a double-array column against a literal vector. */
  private def dotLit(v: Column, w: Array[Double]): Column =
    w.zipWithIndex.map { case (x, i) =>
      element_at(v, i + 1) * lit(x)
    }.reduce(_ + _)

  /**
   * Predict `(doc_id, lang_pred, lang_score)` for every input row:
   * `lang_pred` = argmax label of `dot(mean matched word vector, label
   * vector)` (label-name tiebreak — deterministic), `lang_score` that
   * dot; docs with NO vocabulary match (or empty text) predict `und`
   * at 0.0 — they keep their row, the [[TextAnalysis.withLangId]]
   * contract. `tokenizer` picks the word notion
   * ([[TextAnalysis.WhitespaceTokenizer]] default /
   * [[TextAnalysis.Uax29Tokenizer]] for unspaced scripts).
   */
  def predict(
    df: DataFrame,
    model: VecModel,
    textCol: String,
    idCol: String,
    tokenizer: String = TextAnalysis.WhitespaceTokenizer
  ): DataFrame = {
    require(model.labels.nonEmpty, "model has no labels")
    model.labels.foreach { case (l, v) =>
      require(v.length == model.dim,
        s"label $l vector width ${v.length} != model dim ${model.dim}")
    }
    val wordsOf = tokenizer match {
      case TextAnalysis.Uax29Tokenizer =>
        graft.functions.Hashing.uax29NormalizedWords(col(textCol))
      case TextAnalysis.WhitespaceTokenizer =>
        graft.functions.Hashing.normalizedWords(col(textCol))
      case other => throw new IllegalArgumentException(
        s"unknown tokenizer '$other' (expected whitespace or uax29)")
    }
    val hidden = df
      .select(col(idCol).as("doc_id"), explode(wordsOf).as("token"))
      .join(broadcast(model.words), Seq("token"))
      .groupBy("doc_id")
      .agg(graft.functions.VectorMeanAgg(col("vec")).as("__h"))
    // Label argmax LINEAR in labels: per-label dot products staged as
    // REAL projection columns, the winner via greatest + a first-match
    // when-chain (the QualityClassifier.scoreMultiInline pattern; ties
    // break on label order — the earliest sorted label wins). A
    // when/otherwise reduce here would embed the accumulated tree TWICE
    // per step (expression trees are trees, not DAGs), doubling the
    // expression per label — analysis would never terminate at fastText
    // lid's 176 labels. Staging keeps each dot product a one-reference
    // column: CollapseProject refuses to inline multiply-referenced
    // non-cheap expressions, so the argmax layer sees only column refs.
    val sCols = model.labels.zipWithIndex.map { case ((_, v), i) =>
      dotLit(col("__h"), v).as(s"__s$i")
    }
    val staged = df.select(col(idCol).as("doc_id"))
      .join(hidden, Seq("doc_id"), "left")
      .select(col("doc_id") +: col("__h").isNull.as("__miss") +: sCols: _*)
    val s = model.labels.indices.map(i => col(s"__s$i"))
    val sMax = if (s.size == 1) s.head else greatest(s: _*)
    val pred =
      if (model.labels.size == 1) lit(model.labels.head._1)
      else (1 until model.labels.size - 1).foldLeft(
        when(s.head === sMax, lit(model.labels.head._1))) { case (acc, i) =>
          acc.when(s(i) === sMax, lit(model.labels(i)._1))
        }.otherwise(lit(model.labels.last._1))
    staged.select(col("doc_id"),
      when(col("__miss"), lit("und")).otherwise(pred).as("lang_pred"),
      when(col("__miss"), lit(0.0)).otherwise(sMax).as("lang_score"))
  }
}
