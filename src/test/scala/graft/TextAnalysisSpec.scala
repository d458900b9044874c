package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(t: String, c: org.apache.spark.sql.Column): Any =
    Seq(t).toDF("text").select(c).head.get(0)

  test("wsTokenCount: whitespace runs, blanks, empty") {
    assert(one("a b  c", TextAnalysis.wsTokenCount(col("text"))) == 3)
    assert(one("  ", TextAnalysis.wsTokenCount(col("text"))) == 0)
    assert(one("", TextAnalysis.wsTokenCount(col("text"))) == 0)
    assert(one("one\ttwo\nthree", TextAnalysis.wsTokenCount(col("text"))) == 3)
  }

  test("bpeishTokenCount: letter runs, digit runs, single marks") {
    assert(one("ab1 c!", TextAnalysis.bpeishTokenCount(col("text"))) == 4)
    assert(one("hello, world42", TextAnalysis.bpeishTokenCount(col("text"))) == 4)
  }

  test("TextScanExpr matches the regex spellings it replaced, incl. non-ASCII") {
    // the regex formulations bpeishTokenCount/alphaRatio/punctRatio/
    // wsTokenCount were defined by, run via expr() so both engines eval
    val cases = Seq(
      "café au lait",          // non-ASCII letter splits an alpha run
      "a\u00A0b",              // NBSP: not Java \s — joins one ws-token, is punct
      "😀x😀", // supplementary cps count once each
      "a\u000Bb",              // vertical tab IS Java \s
      "  tab\tmix 12ab34  ",
      "", "   ", "!§$%&",
      "žluťoučký kůň 42")
    val df = cases.toDF("text")
    val native = df.select(
      TextAnalysis.wsTokenCount(col("text")).as("ws"),
      TextAnalysis.bpeishTokenCount(col("text")).as("bp"),
      TextAnalysis.alphaRatio(col("text")).as("ar"),
      TextAnalysis.punctRatio(col("text")).as("pr"))
    val regex = df.select(
      when(col("text").isNull, lit(null).cast("int"))
        .when(trim(col("text")) === "", lit(0))
        .otherwise(size(split(trim(col("text")), "\\s+"))).as("ws"),
      regexp_count(col("text"), lit(TextAnalysis.BpeishPattern)).as("bp"),
      coalesce(length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
        nullif(length(col("text")), lit(0)).cast("double"), lit(0.0)).as("ar"),
      coalesce(length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).cast("double") /
        nullif(length(col("text")), lit(0)).cast("double"), lit(0.0)).as("pr"))
    assert(native.collect().toSeq == regex.collect().toSeq)
    // NULL text: all four NULL-or-zero exactly as before
    val nrow = Seq(Option.empty[String]).toDF("text").select(
      TextAnalysis.wsTokenCount(col("text")),
      TextAnalysis.bpeishTokenCount(col("text")),
      TextAnalysis.alphaRatio(col("text")),
      TextAnalysis.punctRatio(col("text"))).head
    assert(nrow.isNullAt(0) && nrow.isNullAt(1) &&
      nrow.getDouble(2) == 0.0 && nrow.getDouble(3) == 0.0)
  }

  test("ratios: alpha, punct, stopword") {
    assert(one("ab!?", TextAnalysis.alphaRatio(col("text"))) == 0.5)
    assert(one("ab!?", TextAnalysis.punctRatio(col("text"))) == 0.5)
    assert(one("the cat", TextAnalysis.stopwordRatio(col("text"))) == 0.5)
    assert(one("", TextAnalysis.alphaRatio(col("text"))) == 0.0)
  }

  test("langId picks the language with most stopword hits, 'und' when none") {
    assert(one("the cat sat on the mat", TextAnalysis.langId(col("text"))) == "en")
    assert(one("der Hund und die Katze ist nicht da", TextAnalysis.langId(col("text"))) == "de")
    assert(one("le chat est dans la maison pour que", TextAnalysis.langId(col("text"))) == "fr")
    assert(one("el perro y los gatos es una del", TextAnalysis.langId(col("text"))) == "es")
    assert(one("xyzzy plugh", TextAnalysis.langId(col("text"))) == "und")
  }

  test("fingerprint is invariant to case/punctuation/whitespace") {
    val fps = Seq("Hello, World!", "hello   world", "HELLO WORLD.")
      .toDF("text").select(TextAnalysis.fingerprint(col("text")))
      .collect().map(_.getString(0)).toSet
    assert(fps.size == 1)
  }

  test("quality score is in [0,1] and higher for stopword-rich prose") {
    val q = Seq("the cat is in the hat and it is flat for all of us to see",
        "@@@ ### $$$ %%%")
      .toDF("text").select(TextAnalysis.qualityScore(col("text")))
      .collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("withRepetition: repeated trigrams score high, distinct prose scores 0") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // 6 trigrams, 1 distinct
      (2L, "one two three four five six seven eight"), // all distinct
      (3L, "ab")                                        // < k words: single shingle
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withRepetition(df, "text", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((6L, 1.0 - 1.0 / 6.0)))
    assert(out(2L) == ((6L, 0.0)))
    assert(out(3L) == ((1L, 0.0)))
  }

  test("scrubPii masks emails, IPv4s, and phone runs; clean text untouched") {
    val out = Seq(
      "mail a.b+c@x-y.co.uk now",
      "ip 10.0.0.255 up",
      "call +44 20 7946 0958 ok",
      "version 1.2 of chapter 3 has no pii at all"
    ).toDF("text").select(TextAnalysis.scrubPii(col("text")))
      .collect().map(_.getString(0))
    assert(out(0) == "mail <PII> now")
    assert(out(1) == "ip <PII> up")
    assert(out(2) == "call <PII> ok")
    assert(out(3) == "version 1.2 of chapter 3 has no pii at all")
  }

  test("gopherRules: each rule trips on its planted doc; clean prose passes") {
    val docs = Seq(
      (1L, ("the quick brown fox jumps over the lazy dog and it runs away with great speed " * 4).trim),
      (2L, "- a\n- b\n- c"),                         // all-bullet lines
      (3L, "went on...\nand on...\nand on..."),      // every line ends in ellipsis
      (4L, "# # # # spam"),                          // symbol-heavy
      (5L, "12345 67890 00000"),                     // no alphabetic words
      (6L, "too short"),                             // under min word count
      (7L, ""))                                      // empty: 0 words, defined ratios
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("pass"))
    assert(out(1L).getAs[Long]("n_words") == 64)
    assert(!out(2L).getAs[Boolean]("pass") && out(2L).getAs[Double]("bullet_ratio") == 1.0)
    assert(!out(3L).getAs[Boolean]("pass") && out(3L).getAs[Double]("ellipsis_ratio") == 1.0)
    assert(!out(4L).getAs[Boolean]("pass") && out(4L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!out(5L).getAs[Boolean]("pass") && out(5L).getAs[Double]("alpha_word_ratio") == 0.0)
    assert(!out(6L).getAs[Boolean]("pass"))
    assert(!out(7L).getAs[Boolean]("pass") && out(7L).getAs[Long]("n_words") == 0L
      && out(7L).getAs[Double]("mean_word_len") == 0.0)
    // stopword rule: long alpha prose with no stopwords still fails
    val noStops = Seq((8L, Seq.fill(60)("zebra").mkString(" "))).toDF("doc_id", "text")
    val r8 = TextAnalysis.gopherRules(noStops, "text", "doc_id").head
    assert(r8.getAs[Long]("stop_hits") == 0L && !r8.getAs[Boolean]("pass"))
    // relaxed bounds flip the verdict (thresholds are parameters)
    val relaxed = TextAnalysis.gopherRules(noStops, "text", "doc_id", minStopHits = 0)
    assert(relaxed.head.getAs[Boolean]("pass"))
    // the filter form keeps exactly the pass set, columns untouched
    val all = docs.union(noStops)
    val passIds = TextAnalysis.gopherRules(all, "text", "doc_id")
      .filter(col("pass")).select("doc_id").collect().map(_.getLong(0)).toSet
    val filtered = TextAnalysis.gopherFilter(all, "text")
    assert(filtered.columns.toSeq == Seq("doc_id", "text"))
    assert(filtered.select("doc_id").collect().map(_.getLong(0)).toSet == passIds)
    // a caller column colliding with a staging name fails loudly
    intercept[IllegalArgumentException] {
      TextAnalysis.gopherFilter(all.withColumn("__w", lit(1)), "text")
    }
  }

  test("topWords: frequency-ordered, deterministic tiebreak, k bound respected") {
    val df = Seq(
      (1L, "apple apple apple banana banana cherry"),
      (2L, "banana date date")).toDF("doc_id", "text")
    val out = TextAnalysis.topWords(df, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // apple 3, banana 3 (tie broken alphabetically), then cherry/date tie
    // at 2... date has 2, cherry 1 → third is date
    assert(out.toSeq == Seq(("apple", 3L), ("banana", 3L), ("date", 2L)), out.mkString(","))
    intercept[IllegalArgumentException] { TextAnalysis.topWords(df, "text", 0) }
    // empty corpus yields an empty vocabulary
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.topWords(empty, "text").count() == 0)
  }

  test("tokenStats: approx percentiles track the exact ones; counts identical") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Double]("p50_tokens"), r.getAs[Double]("p95_tokens"))).toMap
    val exact = toMap(TextAnalysis.tokenStats(docs, "text", "lang"))
    val approx = toMap(TextAnalysis.tokenStats(docs, "text", "lang", approx = true))
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (lang, (n, tot, p50, p95)) =>
      val (an, atot, ap50, ap95) = approx(lang)
      assert(n == an && tot == atot)
      // percentile_approx returns an actual group value near the exact
      // rank — at high accuracy it should sit within a few percent
      assert(math.abs(ap50 - p50) <= math.max(1.0, 0.05 * p50), s"$lang p50")
      assert(math.abs(ap95 - p95) <= math.max(1.0, 0.05 * p95), s"$lang p95")
    }
  }

  test("unigramNll: gibberish scores above the corpus, boilerplate below; empty docs absent") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // the boilerplate plant repeats the corpus's MOST FREQUENT word, so
    // its per-token nll is the model's minimum — below every real doc
    val topWord = TextAnalysis.unigramModel(docs, "text", vocabSize = 1)
      .head().getString(0)
    val planted = Seq(
      (800001L, "zxqv gibberish tokenstream qqwzx vvkjh zzzyx plmokn"),
      (800002L, Seq.fill(20)(topWord).mkString(" ")),
      (800003L, "   ")) // zero normalized tokens -> absent from the output
      .toDF("doc_id", "text")
    val corpus = docs.unionByName(planted)
    val model = TextAnalysis.unigramModel(corpus, "text", vocabSize = 100)
    val out = TextAnalysis.unigramNll(corpus, model, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
    assert(!out.contains(800003L))
    val base = out.view.filterKeys(_ < 800000L).values.toSeq.sorted
    val p90 = base(base.size * 9 / 10)
    assert(out(800001L) > p90, s"gibberish ${out(800001L)} should exceed p90 $p90")
    assert(out(800002L) <= base.head,
      s"boilerplate ${out(800002L)} should undercut the corpus minimum ${base.head}")
    // every score is finite and positive (add-alpha smoothing)
    assert(out.values.forall(v => v > 0.0 && !v.isNaN && !v.isInfinite))
  }

  test("unigramNll plan: model broadcast, one per-doc regroup (contamination shape)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val model = TextAnalysis.unigramModel(docs, "text", vocabSize = 100)
    val plan = TextAnalysis.unigramNll(docs, model, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // partial_count proves the per-doc agg partial-aggregates map-side
    assert(plan.contains("partial_count") || plan.contains("partial count"), plan.take(2000))
  }

  test("bigramNll: word order matters — shuffled text outscores its ordered twin") {
    import spark.implicits._
    // a corpus of one repeated sentence: its adjacent pairs are frequent
    val sentence = "the quick brown fox jumps over the lazy dog"
    val base = (0 until 30).map(i => (i.toLong, sentence)).toDF("doc_id", "text")
    val planted = Seq(
      (900001L, sentence), // in-order: every bigram is in the model
      (900002L, "dog the over fox lazy quick jumps brown the"), // same unigrams, unseen order
      (900003L, "   ")) // zero tokens -> absent
      .toDF("doc_id", "text")
    val corpus = base.unionByName(planted)
    val uni = TextAnalysis.unigramModel(corpus, "text", vocabSize = 50)
    val bi = TextAnalysis.bigramModel(corpus, "text", bigramVocab = 100)
    val out = TextAnalysis.bigramNll(corpus, uni, bi, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
    assert(!out.contains(900003L))
    // identical unigram profile, so a unigram model CANNOT separate them…
    val uniOut = TextAnalysis.unigramNll(corpus, uni, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
    assert(math.abs(uniOut(900001L) - uniOut(900002L)) < 1e-9)
    // …while the bigram model separates them decisively
    assert(out(900002L) > out(900001L) + 1.0,
      s"shuffled ${out(900002L)} vs ordered ${out(900001L)}")
    assert(out.values.forall(v => v > 0.0 && !v.isNaN && !v.isInfinite))
  }

  test("bigramModel: deterministic top-k cut; sub-2-word docs contribute nothing") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val m = TextAnalysis.bigramModel(docs, "text", bigramVocab = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // pairs of "a b a b a": (a,b)x2, (b,a)x2 — ties broken prev asc
    assert(m.toSeq == Seq(("a", "b", 2L), ("b", "a", 2L)), m.toSeq.toString)
  }

  test("unigramDivergence: zero on identical corpora, positive under drift, mass sums to 1") {
    import spark.implicits._
    val a = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val same = TextAnalysis.unigramDivergence(a, a, "text", vocabSize = 50).collect()
    // identical corpora: p == q symbol-for-symbol, so every kl term is 0
    assert(same.forall(r => math.abs(r.getAs[Double]("kl_term")) < 1e-15))
    // both smoothed distributions sum to 1 exactly over vocab + <oov>
    assert(math.abs(same.map(_.getAs[Double]("p_a")).sum - 1.0) < 1e-9)
    assert(same.count(_.getString(0) == "<oov>") == 1)
    val spam = Seq((910001L, "buy cheap pills buy cheap pills")).toDF("doc_id", "text")
    val drifted = TextAnalysis
      .unigramDivergence(a, a.limit(50).unionByName(spam), "text", vocabSize = 50)
      .collect()
    val kl = drifted.map(_.getAs[Double]("kl_term")).sum
    assert(kl > 0.0, s"KL must be positive under drift: $kl")
    assert(math.abs(drifted.map(_.getAs[Double]("p_b")).sum - 1.0) < 1e-9)
  }

  test("unigramDivergence: result is localized and no persisted counts outlive the call") {
    val a = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = TextAnalysis.unigramDivergence(a, a.limit(100), "text", vocabSize = 20)
    // the count caches (load-bearing: they stop semi-join pushdown from
    // splitting consumers into corpus re-scans) are dropped on return
    assert(spark.sparkContext.getPersistentRDDs.keySet == before)
    // vocab-sized output comes back as a flat local relation — consumers
    // never re-run the corpus aggregation
    assert(out.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      out.queryExecution.optimizedPlan.toString.take(1000))
  }

  test("withCharEntropy: known values, NULL/empty handling, collision guard") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("aaaa")),           // one symbol -> 0 bits
      (2L, Option("abab")),           // two equiprobable -> 1 bit
      (3L, Option("abcd")),           // four equiprobable -> 2 bits
      (4L, Option("")),               // empty -> NULL
      (5L, Option.empty[String]))     // NULL -> NULL
      .toDF("doc_id", "text")
    val out = TextAnalysis.withCharEntropy(df, "text")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("char_entropy"))).toMap
    assert(math.abs(out(1L).get - 0.0) < 1e-12)
    assert(math.abs(out(2L).get - 1.0) < 1e-12)
    assert(math.abs(out(3L).get - 2.0) < 1e-12)
    assert(out(4L).isEmpty && out(5L).isEmpty)
    // maxChars bounds the measured prefix: beyond-prefix chars are invisible
    val capped = TextAnalysis.withCharEntropy(
      Seq((1L, "aaaa" + "b" * 100)).toDF("doc_id", "text"), "text", maxChars = 4)
      .head().getAs[Double]("char_entropy")
    assert(math.abs(capped - 0.0) < 1e-12)
    // caller columns colliding with staging/output names fail loudly
    intercept[IllegalArgumentException] {
      TextAnalysis.withCharEntropy(df.withColumn("char_entropy", lit(1)), "text")
    }
  }

  test("foldAccents strips decomposable marks, passes non-decomposables, idempotent") {
    import spark.implicits._
    val df = Seq(
      (1L, "café crème brûlée"),
      (2L, "Müller straße"),
      // NFD (decomposed) input folds identically to NFC input
      (3L, "café"),
      (4L, "Ångström Ørsted æon"),
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.foldAccents(col("text")).as("f"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some("cafe creme brulee"))
    assert(out(2L) === Some("Müller straße".replace("ü", "u")))
    assert(out(3L) === Some("cafe"))
    assert(out(4L) === Some("Angstrom Ørsted æon")) // Ø æ ß pass through
    assert(out(5L) === None)
    // idempotent: folding folded text is a no-op
    val twice = df.select(
      TextAnalysis.foldAccents(TextAnalysis.foldAccents(col("text"))).as("f"))
      .as[Option[String]].collect().toSet
    val once = df.select(TextAnalysis.foldAccents(col("text")).as("f"))
      .as[Option[String]].collect().toSet
    assert(twice === once)
  }

  // ----------------------------------------------- r14: mojibake repair

  /** What a sloppy cp1252 decode does to UTF-8 bytes (the defect the
    * operator inverts): byte -> cp1252 char, undefined positions pass
    * through as C1 controls. */
  private def mojibake(s: String): String = {
    val cp1252 = Map(0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192,
      0x84 -> 0x201E, 0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021,
      0x88 -> 0x02C6, 0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039,
      0x8C -> 0x0152, 0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019,
      0x93 -> 0x201C, 0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013,
      0x97 -> 0x2014, 0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161,
      0x9B -> 0x203A, 0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    s.getBytes("UTF-8").map { b =>
      val u = b & 0xff
      cp1252.getOrElse(u, u).toChar
    }.mkString
  }

  private def fixOf(ss: Seq[String]): Seq[String] = {
    import spark.implicits._
    ss.toDF("t").select(TextAnalysis.fixMojibake(col("t")).as("f"))
      .as[String].collect().toSeq
  }

  test("fixMojibake inverts single and double sloppy-cp1252 decodes") {
    val originals = Seq(
      "caf\u00E9", "it\u2019s \u201Cfine\u201D \u2014 really",
      "\u20AC 9,99 \u2022 na\u00EFve \u2026 done",
      "\u4F60\u597D\u4E16\u754C", // CJK round-trips too
      "plain ascii")
    val single = originals.map(mojibake)
    val double = single.map(mojibake)
    assert(fixOf(single) == originals)
    assert(fixOf(double) == originals)
  }

  test("fixMojibake is a no-op on clean text and idempotent") {
    val clean = Seq(
      "caf\u00E9 cr\u00E8me stays", // genuine latin-1: E9+space is malformed UTF-8
      "plain ascii", "", "\u4F60\u597D", "emoji \uD83D\uDE00 aborts")
    assert(fixOf(clean) == clean)
    // idempotence: fixing fixed text changes nothing
    val fixed = fixOf(Seq(mojibake("it\u2019s")))
    assert(fixOf(fixed) == fixed)
  }

  test("fixMojibake propagates NULL and randomized roundtrip holds") {
    import spark.implicits._
    val out = Seq(Option.empty[String], Some(mojibake("ok \u2014 fine")))
      .toDF("t").select(TextAnalysis.fixMojibake(col("t")).as("f"))
      .collect()
    assert(out(0).isNullAt(0) && out(1).getString(0) == "ok \u2014 fine")
    val rnd = new scala.util.Random(11)
    val pool = "abc \u00E9\u00FC\u2019\u201C\u4F60 xyz"
    val rs = (1 to 20).map(_ =>
      (0 until 30).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    assert(fixOf(rs.map(mojibake)) == rs)
  }

  // --------------------------------------------------- r15: C4 cleaning

  test("c4Clean: line rules, page flags, and minLines \u2014 every verdict hand-checked") {
    import spark.implicits._
    val goodPage = Seq(
      "Cookie Settings",                        // no terminal punct -> drop
      "This is a real sentence about things.",  // keep
      "Is this prose?",                         // keep (?)
      "He said \"sure thing.\"",                // keep (closing quote)
      "Wow, what a day!",                       // keep (!)
      "Too few.",                               // 2 words -> drop
      "Enable JavaScript in your browser now.", // javascript -> drop
      "Trailing blanks still terminate.   ",    // keep: strip then '.'
      "One more line of honest prose here."     // keep
    ).mkString("\n")
    val df = Seq(
      (1L, goodPage),
      (2L, goodPage + "\nvar f = function() { return 1; }"), // '{' -> page drop
      (3L, goodPage + "\nThis page contains Lorem Ipsum filler."), // -> page drop
      (4L, "Only one good sentence lives here.\nnav | nav | nav"), // 1 < minLines
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.c4Clean(df, "text", minWordsPerLine = 3, minLines = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == Set(1L))
    assert(got(1L) == Seq(
      "This is a real sentence about things.",
      "Is this prose?",
      "He said \"sure thing.\"",
      "Wow, what a day!",
      "Trailing blanks still terminate.   ", // original bytes kept
      "One more line of honest prose here.").mkString("\n"))
    // lower minLines keeps page 4's single surviving line
    val loose = TextAnalysis.c4Clean(df, "text", minWordsPerLine = 3, minLines = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(loose(4L) == "Only one good sentence lives here.")
    assert(!loose.contains(2L) && !loose.contains(3L) && !loose.contains(5L))
  }

  test("C4LinesExpr: randomized parity with a straightforward reference") {
    // independent reference: plain String ops, no byte tricks
    def ref(text: String, minWords: Int): (String, Int, Boolean) = {
      val lines = text.split("\n", -1)
      val kept = lines.filter { l =>
        val rt = l.reverse.dropWhile(c => c == ' ' || c == '\t' || c == '\r').reverse
        val terminal = rt.nonEmpty && ".!?\"".contains(rt.last)
        val words = l.replace('\t', ' ').split(" ").count(_.nonEmpty)
        terminal && words >= minWords &&
          !l.toLowerCase(java.util.Locale.ROOT).contains("javascript")
      }
      val flagged = text.contains("{") ||
        text.toLowerCase(java.util.Locale.ROOT).contains("lorem ipsum")
      (kept.mkString("\n"), kept.length, flagged)
    }
    val rnd = new scala.util.Random(31)
    val tokens = Array("alpha", "beta", "Gamma", "JAVASCRIPT", "JavaScript",
      "lorem", "ipsum", "Lorem Ipsum", "{", "}", "café", "你好",
      ".", "!", "?", "\"", "...", "x", "", " ", "\t", "\r")
    val texts = (1 to 150).map { i =>
      val nLines = rnd.nextInt(8)
      (i.toLong, (0 until nLines).map { _ =>
        (0 until rnd.nextInt(10)).map(_ => tokens(rnd.nextInt(tokens.length)))
          .mkString(" ")
      }.mkString("\n"))
    }
    val got = graft.functions.C4LinesExpr(col("text"), 2)
    val rows = texts.toDF("id", "text")
      .select(col("id"), got.as("c"))
      .select(col("id"), col("c.text"), col("c.n_kept"), col("c.flagged"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getBoolean(3))))
      .toMap
    texts.foreach { case (id, t) =>
      assert(rows(id) == ref(t, 2), s"id $id text ${t.replace("\n", "\\n")}")
    }
  }

  test("c4Clean terminators: CJK arm keeps CJK prose the ASCII rule deletes") {
    import spark.implicits._
    val page = Seq(
      "これは散文です。",        // keep under CJK (。)
      "二番目の文です！",        // keep under CJK (full-width ！)
      "引用の終わり」",          // keep under CJK (」)
      "メニュー ナビゲーション", // no terminal -> drop both arms
      "An ascii sentence."       // keep both arms ('.')
    ).mkString("\n")
    val df = Seq((1L, page)).toDF("doc_id", "text")
    val cjk = TextAnalysis.c4Clean(df, "text", minWordsPerLine = 1,
        minLines = 1, terminators = graft.functions.C4LinesExpr.CjkTerminators)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cjk(1L) == Seq("これは散文です。", "二番目の文です！",
      "引用の終わり」", "An ascii sentence.").mkString("\n"))
    // the paper's English-only default: every CJK line dies — exactly
    // the double-fault CurationPipeline fail-louds about
    val ascii = TextAnalysis.c4Clean(df, "text", minWordsPerLine = 1, minLines = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ascii(1L) == "An ascii sentence.")
    // empty terminator set fails loud at construction
    intercept[IllegalArgumentException] {
      graft.functions.C4LinesExpr(col("text"), 1, "")
    }
  }

  test("C4LinesExpr: randomized parity holds under a multi-byte terminator set") {
    val terms = graft.functions.C4LinesExpr.CjkTerminators
    def ref(text: String, minWords: Int): (String, Int, Boolean) = {
      val lines = text.split("\n", -1)
      val kept = lines.filter { l =>
        val rt = l.reverse.dropWhile(c => c == ' ' || c == '\t' || c == '\r').reverse
        val terminal = rt.nonEmpty && terms.exists(t => rt.endsWith(t.toString))
        val words = l.replace('\t', ' ').split(" ").count(_.nonEmpty)
        terminal && words >= minWords &&
          !l.toLowerCase(java.util.Locale.ROOT).contains("javascript")
      }
      val flagged = text.contains("{") ||
        text.toLowerCase(java.util.Locale.ROOT).contains("lorem ipsum")
      (kept.mkString("\n"), kept.length, flagged)
    }
    val rnd = new scala.util.Random(37)
    val tokens = Array("alpha", "日本語", "散文です", "JavaScript", "lorem",
      "Lorem Ipsum", "{", "café", "你好", ".", "。", "！", "？", "…", "」",
      "．", "...", "x", "", " ", "\t", "\r")
    val texts = (1 to 150).map { i =>
      val nLines = rnd.nextInt(8)
      (i.toLong, (0 until nLines).map { _ =>
        (0 until rnd.nextInt(10)).map(_ => tokens(rnd.nextInt(tokens.length)))
          .mkString(" ")
      }.mkString("\n"))
    }
    import spark.implicits._
    val rows = texts.toDF("id", "text")
      .select(col("id"), graft.functions.C4LinesExpr(col("text"), 2, terms).as("c"))
      .select(col("id"), col("c.text"), col("c.n_kept"), col("c.flagged"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getBoolean(3))))
      .toMap
    texts.foreach { case (id, t) =>
      assert(rows(id) == ref(t, 2), s"id $id text ${t.replace("\n", "\\n")}")
    }
  }
}
