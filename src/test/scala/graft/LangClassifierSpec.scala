package graft

import org.apache.spark.sql.functions._
import graft.gates.LlmGates
import graft.operators.{QualityClassifier, TextAnalysis}

/** Language-ID breadth (§2.4 row 33 extension): the 10-family stopword
  * vote and the FITTED multi-class softmax arm on the classifier spine,
  * both pinned against the committed per-language sentence fixtures. */
class LangClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val train = LlmGates.LangFixture
  // held-out sentences, one per family — same function-word register,
  // different content words
  private val heldOut: Seq[(String, String)] = Seq(
    "en" -> "the fish is in the water and it is for the cat",
    "de" -> "das haus ist mit der tur und nicht zu den fenstern",
    "fr" -> "le garcon est pour la fille et dans les champs que",
    "es" -> "la casa es del nino y por los campos con el sol",
    "it" -> "il cane e di casa che sono per un con non",
    "pt" -> "o menino do campo e da cidade em um dia para que os",
    "nl" -> "de kat en het huis van een dat op te zijn niet",
    "sv" -> "jag har inte en katt och det som av den att",
    "pl" -> "i w nie na z do to jest ale po domu",
    "tr" -> "ben bir kedi ve bu da ne ile o gibi ama")

  private def df(rows: Seq[(String, String)]) =
    rows.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("doc_id", "lang", "text")

  test("stopword vote: every planted sentence wins its own family, with margin") {
    val out = TextAnalysis.withLangId(df(train), "text", "doc_id")
      .join(df(train).select(col("doc_id"), col("lang")), Seq("doc_id"))
      .collect()
    assert(out.length == train.size)
    out.foreach { r =>
      assert(r.getAs[String]("lang_pred") == r.getAs[String]("lang"),
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[String]("lang_pred")} != ${r.getAs[String]("lang")}")
      assert(r.getAs[Double]("lang_conf") > 0.5,
        s"doc ${r.getAs[Long]("doc_id")}: conf ${r.getAs[Double]("lang_conf")} not a clear win")
    }
  }

  test("stopword vote: 'und' with conf 0.0 when nothing matches") {
    val out = TextAnalysis.withLangId(
      Seq((1L, "xyzzy plugh quux")).toDF("doc_id", "text"), "text", "doc_id").head()
    assert(out.getAs[String]("lang_pred") == "und")
    assert(out.getAs[Double]("lang_conf") == 0.0)
  }

  test("fitMulti + scoreMultiInline: memorizes training fixtures, generalizes held-out") {
    val model = QualityClassifier.fitMulti(
      df(train), "text", "lang", "doc_id", nBuckets = 512, iters = 200, lr = 2.0)
    assert(model.labels == train.map(_._1).distinct.sorted.toIndexedSeq)

    def acc(rows: Seq[(String, String)]): (Double, Seq[(String, String)]) = {
      val want = rows.zipWithIndex.map { case ((l, _), i) => i.toLong -> l }.toMap
      val got = QualityClassifier.scoreMultiInline(df(rows), model, "text", "doc_id")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("label_pred"), r.getAs[Double]("label_prob")))
      got.foreach { case (_, (_, p)) => assert(p > 0.0 && p <= 1.0) }
      val pairs = got.map { case (id, (pred, _)) => (want(id), pred) }.toSeq
      (pairs.count(p => p._1 == p._2).toDouble / rows.size, pairs.filter(p => p._1 != p._2))
    }
    val (trainAcc, trainMiss) = acc(train)
    assert(trainAcc == 1.0, s"training misclassified: $trainMiss")
    val (testAcc, testMiss) = acc(heldOut)
    assert(testAcc >= 0.8, s"held-out accuracy $testAcc; misses: $testMiss")
  }

  test("scoreMultiInline rejects a weights table that is not K dense spines") {
    val model = QualityClassifier.fitMulti(
      df(train.take(4)), "text", "lang", "doc_id", nBuckets = 64, iters = 5)
    val broken = model.copy(weights = model.weights.filter(col("bucket") =!= 3))
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.scoreMultiInline(df(train.take(4)), broken, "text", "doc_id")
    }
    assert(e.getMessage.contains("dense"), e.getMessage)
  }

  private def writeVec(lines: Seq[String]): String = {
    val f = java.nio.file.Files.createTempFile("graft-langvec", ".vec")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("LangModel: a fastText-format .vec with __label__ heads loads and " +
    "predicts hand-derived scores; ties break on sorted labels; OOV reads und") {
    // dyadic word vectors + one-hot label heads: every mean and dot is
    // exact, so scores assert by VALUE (the q_lang_id_model fixture)
    val model = graft.operators.LangModel.load(spark, writeVec(Seq(
      "8 3",
      "__label__de 0.0 0.0 1.0",
      "__label__en 1.0 0.0 0.0",
      "__label__fr 0.0 1.0 0.0",
      "the 1.0 0.0 0.0",
      "and 0.75 0.0 0.25",
      "le 0.0 1.0 0.0",
      "der 0.25 0.0 1.0",
      "tie 0.5 0.5 0.0")))
    assert(model.dim == 3)
    assert(model.labels.map(_._1) == Seq("de", "en", "fr")) // sorted
    val out = graft.operators.LangModel.predict(
        Seq(
          (1L, "The cat AND the dog!"), // normalization folds case/punct
          (2L, "le chat"),
          (3L, "der hund"),
          (4L, "tie"),                  // en == fr: sorted-label tiebreak
          (5L, "xyzzy plugh"),
          (6L, "")).toDF("doc_id", "text"),
        model, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang_pred"), r.getAs[Double]("lang_score")))).toMap
    assert(out(1L) == (("en", 2.75 / 3)), out.toString) // mean of the,and,the
    assert(out(2L) == (("fr", 1.0)))
    assert(out(3L) == (("de", 1.0))) // de 1.0 beats en 0.25
    assert(out(4L) == (("en", 0.5))) // en before fr at equal score
    assert(out(5L) == (("und", 0.0)))
    assert(out(6L) == (("und", 0.0)))
  }

  test("LangModel: a CRLF-checkout .vec (every line ending in \\r) loads " +
    "and predicts identically") {
    // Spark's trim strips spaces only, and split keeps trailing empty
    // fragments — the naive spelling rejects CRLF models as non-numeric
    // and lets a '<rows> <dim>\r' header through as a data row
    val lines = Seq(
      "2 2",
      "__label__en 1.0 0.0",
      "the 1.0 0.0")
    val f = java.nio.file.Files.createTempFile("graft-langvec-crlf", ".vec")
    java.nio.file.Files.write(f,
      lines.map(_ + "\r").mkString("\n").getBytes("UTF-8"))
    val model = graft.operators.LangModel.load(spark, f.toString)
    assert(model.dim == 2 && model.labels.map(_._1) == Seq("en"))
    val out = graft.operators.LangModel.predict(
        Seq((1L, "the")).toDF("doc_id", "text"), model, "text", "doc_id")
      .collect().head
    assert(out.getAs[String]("lang_pred") == "en" &&
      out.getAs[Double]("lang_score") == 1.0, out.toString)
  }

  test("LangModel: a 150-label model completes analysis and matches a " +
    "driver-side argmax") {
    // regression pin for the argmax spelling: the old when/otherwise
    // reduce doubled the expression tree per label, so a lid-sized
    // label count (fastText lid.176 has 176) would hang in analysis —
    // the linear staged-column argmax must complete AND agree with a
    // plain driver-side fold using the same earliest-label tiebreak.
    // Whole small integers keep every product and sum float-exact.
    val nLabels = 150
    val labelNames = (0 until nLabels).map(j => f"l$j%03d")
    val labelVecs = (0 until nLabels).map(j => Array(
      (j % 7).toDouble, ((j * j) % 5).toDouble, ((j / 7) % 3).toDouble))
    val words = Seq(
      "alpha" -> Array(1.0, 2.0, 3.0),
      "beta" -> Array(3.0, 0.0, 1.0),
      "gamma" -> Array(0.0, 5.0, 2.0))
    val lines = Seq(s"${nLabels + words.size} 3") ++
      labelNames.zip(labelVecs).map { case (l, v) =>
        s"__label__$l ${v.mkString(" ")}" } ++
      words.map { case (w, v) => s"$w ${v.mkString(" ")}" }
    val model = graft.operators.LangModel.load(spark, writeVec(lines))
    assert(model.labels.size == nLabels)
    val docs = words.zipWithIndex.map { case ((w, _), i) => (i.toLong, w) }
    val out = graft.operators.LangModel.predict(
        docs.toDF("doc_id", "text"), model, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang_pred"), r.getAs[Double]("lang_score")))).toMap
    val wordVec = words.toMap
    docs.foreach { case (id, w) =>
      val h = wordVec(w) // single-word doc: the mean IS the word vector
      val best = model.labels
        .map { case (l, v) => l -> h.zip(v).map { case (a, b) => a * b }.sum }
        .reduceLeft((a, b) => if (b._2 > a._2) b else a)
      assert(out(id) == ((best._1, best._2)),
        s"doc $id: got ${out(id)}, want $best")
    }
  }

  test("LangModel.load fails loud on label-free, ragged, and non-numeric models") {
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.LangModel.load(spark,
        writeVec(Seq("2 2", "the 1.0 0.0", "le 0.0 1.0")))
    }
    assert(e1.getMessage.contains("__label__"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.LangModel.load(spark,
        writeVec(Seq("__label__en 1.0 0.0", "the 1.0 0.0 0.5")))
    }
    assert(e2.getMessage.contains("widths"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      graft.operators.LangModel.load(spark,
        writeVec(Seq("__label__en 1.0 0.0", "the 1.0 oops")))
    }
    assert(e3.getMessage.contains("non-numeric"), e3.getMessage)
  }
}
