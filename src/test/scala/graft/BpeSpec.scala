package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.BpeModel
import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def model(
    merges: Seq[(String, String)], alphabet: String): BpeModel =
    new BpeModel(merges.toIndexedSeq,
      Bpe.derivedVocab(merges, alphabet.map(_.toString)))

  test("encodeWord replays merges min-rank-first, not file order") {
    // rules: (b,c) rank0, (a,bc) rank1, (a,b) rank2 — "abc" must merge
    // bc FIRST (rank 0) then a+bc (rank 1); a file-order replay that
    // applied (a,b) whenever visible would yield [ab, c]
    val m = model(Seq(("b", "c"), ("a", "bc"), ("a", "b")), "abc")
    assert(m.encodeWord("abc").toSeq == Seq(m.vocab("abc")))
    // "ab" alone: only (a,b) applies
    assert(m.encodeWord("ab").toSeq == Seq(m.vocab("ab")))
  }

  test("overlapping occurrences merge left-to-right") {
    val m = model(Seq(("a", "a")), "a")
    // aaa -> (aa)(a); aaaa -> (aa)(aa); aaaaa -> (aa)(aa)(a)
    assert(m.encodeWord("aaa").toSeq == Seq(m.vocab("aa"), m.vocab("a")))
    assert(m.encodeWord("aaaa").toSeq == Seq(m.vocab("aa"), m.vocab("aa")))
    assert(m.encodeWord("aaaaa").toSeq ==
      Seq(m.vocab("aa"), m.vocab("aa"), m.vocab("a")))
  }

  test("ill-formed merges (constituent never produced) are rejected") {
    val e = intercept[IllegalArgumentException] {
      model(Seq(("a", "bc")), "abc") // "bc" is never produced
    }
    assert(e.getMessage.contains("not produced"), e.getMessage)
  }

  test("unknown symbols encode as -1, never throw") {
    val m = model(Seq(("a", "b")), "ab")
    assert(m.encodeWord("abz").toSeq == Seq(m.vocab("ab"), -1))
  }

  test("derivedVocab: alphabet first, merges in rank order, duplicates keep first id") {
    val v = Bpe.derivedVocab(Seq(("a", "b"), ("a", "b")), Seq("a", "b"))
    assert(v == Map("a" -> 0, "b" -> 1, "ab" -> 2))
  }

  test("file roundtrip: loadMerges skips header/blanks, loadVocab reads json escapes") {
    val dir = Files.createTempDirectory("bpe-spec")
    Files.write(dir.resolve("merges.txt"),
      "#version: 0.2\n\na b\nab c\n".getBytes("UTF-8"))
    Files.write(dir.resolve("vocab.json"),
      """{"a": 0, "b": 1, "c": 2, "ab": 3, "abc": 4, "Ġx": 9}""".getBytes("UTF-8"))
    val merges = Bpe.loadMerges(spark, s"$dir/merges.txt")
    assert(merges == Vector(("a", "b"), ("ab", "c")))
    val vocab = Bpe.loadVocab(spark, s"$dir/vocab.json")
    assert(vocab("abc") == 4 && vocab("Ġx") == 9)
    val tok = Bpe.load(spark, s"$dir/merges.txt", Some(s"$dir/vocab.json"))
    val out = Seq((1L, "abc ab")).toDF("doc_id", "text")
      .select(tok.encode(col("text")).as("ids")).head().getSeq[Int](0)
    // "abc" -> [4]; " ab" maps to "Ġab" -> Ġ unknown(-1)... wait Ġ IS in
    // vocab only as Ġx; lone Ġ is absent -> -1, then "ab" -> 3
    assert(out == Seq(4, -1, 3))
  }

  test("whitespace maps to GPT-2 markers before merging") {
    val tok = Bpe.tokenizer(spark, Seq(("Ġ", "a")),
      Bpe.derivedVocab(Seq(("Ġ", "a")), Seq("Ġ", "a", "Ċ")))
    val out = Seq((1L, "a a\na")).toDF("doc_id", "text")
      .select(tok.encode(col("text")).as("ids")).head().getSeq[Int](0)
    // pretokens: "a", " a", "\n", "a" -> [a], [Ġa], [Ċ], [a]
    assert(out == Seq(1, 3, 2, 1))
  }

  test("tokenCount: NULL and empty text count 0; matches size(encode)") {
    val tok = Bpe.tokenizer(spark, Seq(("a", "b")),
      Bpe.derivedVocab(Seq(("a", "b")), Seq("a", "b", "Ġ")))
    val df = Seq((1L, Some("ab ab")), (2L, None), (3L, Some(""))).toDF("doc_id", "text")
    val counts = df.select(col("doc_id"), tok.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "ab" -> [ab]; " ab" -> "Ġab" -> (a,b) merges but (Ġ,ab) is no
    // rule -> [Ġ, ab]: 3 tokens total
    assert(counts == Map(1L -> 3L, 2L -> 0L, 3L -> 0L))
  }

  test("chunkIds: stride windows over ids, tail kept, empty docs vanish") {
    // 10 'ab's -> 10 tokens ((Ġ,a) outranks (a,b), so "Ġab" collapses
    // fully); chunkTokens 4, overlap 1, stride 3: ceil((10-1)/3) = 3
    // chunks at index starts 0/3/6, each 4 ids, last ends at id 9
    val merges = Seq(("Ġ", "a"), ("Ġa", "b"), ("a", "b"))
    val tok = Bpe.tokenizer(spark, merges,
      Bpe.derivedVocab(merges, Seq("a", "b", "Ġ")))
    val text = ("ab" +: Seq.fill(9)(" ab")).mkString
    val df = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val out = tok.chunkIds(df, "text", "doc_id", chunkTokens = 4, overlap = 1)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[Long]("doc_id")).forall(_ == 1L))
    assert(out.map(_.getAs[Long]("chunk_idx")).toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_.getAs[Int]("n_ids")).toSeq == Seq(4, 4, 4))
    val chunks = out.map(_.getSeq[Int](out.head.fieldIndex("ids")))
    // consecutive chunks share exactly `overlap` ids
    assert(chunks(0).last == chunks(1).head)
    assert(chunks(1).last == chunks(2).head)
  }

  test("fixture model: corpus words tokenize through full merge chains") {
    val m = new BpeModel(graft.gates.BpeGates.Merges,
      graft.gates.BpeGates.Vocab)
    def ids(w: String) = m.encodeWord(w).toSeq
    val v = graft.gates.BpeGates.Vocab
    assert(ids("Ġthe") == Seq(v("Ġthe")))         // 3-merge chain
    assert(ids("Ġstream") == Seq(v("Ġstream")))   // 5-merge chain
    assert(ids("Ġbatch") == Seq(v("Ġbatch")))
    assert(ids("Ġsort") == Seq(v("Ġsort")))
    assert(ids("Ġline") == Seq(v("Ġ"), v("l"), v("ine")))
    assert(ids("Ġwindow") == Seq(v("Ġw"), v("in"), v("d"), v("ow")))
  }

  test("train: the Sennrich example learns the hand-derived merges, in order") {
    import spark.implicits._
    val corpus = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
      .toDF("text")
    val merges = graft.operators.Bpe.train(corpus, "text", numMerges = 5)
    // pair mass: ug 20, pu 17 -> after (u,g): un 16, h+ug 15, p+un 12;
    // final round ties p+ug = hug+s = 5 -> lexicographic asc picks (hug, s)
    assert(merges === IndexedSeq(
      ("u", "g"), ("u", "n"), ("h", "ug"), ("p", "un"), ("hug", "s")))
    // determinism: second run identical
    assert(graft.operators.Bpe.train(corpus, "text", numMerges = 5) === merges)
    // the trained tokenizer segments accordingly: hugs -> 1 token,
    // pug -> p + ug, bun -> b + un
    val tok = graft.operators.Bpe.trainTokenizer(corpus, "text", numMerges = 5)
    val nTok = Seq("hugs", "pug", "bun").toDF("text")
      .select(tok.tokenCount(col("text"))).as[Long].collect()
    assert(nTok.toSeq === Seq(1L, 2L, 2L))
    // save -> load roundtrip encodes identically
    val dir = java.nio.file.Files.createTempDirectory("bpe-train").toString
    graft.operators.Bpe.saveMerges(spark, merges, s"$dir/merges.txt")
    val loaded = graft.operators.Bpe.load(spark, s"$dir/merges.txt")
    val viaLoaded = Seq("hugs", "pug", "bun").toDF("text")
      .select(loaded.tokenCount(col("text"))).as[Long].collect()
    assert(viaLoaded.toSeq === Seq(1L, 2L, 2L))
  }

  test("train: minPairCount stops before memorizing singleton pairs") {
    import spark.implicits._
    val corpus = Seq("ab", "cd", "ef").toDF("text") // every pair count 1
    assert(graft.operators.Bpe.train(corpus, "text", numMerges = 10).isEmpty)
    // whitespace-marked pre-tokens train like any symbol: " aa" repeated
    // makes (Ġ, a) a frequent pair
    val ws = Seq.fill(5)("aa aa").toDF("text")
    val m = graft.operators.Bpe.train(ws, "text", numMerges = 2)
    assert(m.contains(("Ġ", "a")) || m.contains(("a", "a")), m.toString)
  }
}
