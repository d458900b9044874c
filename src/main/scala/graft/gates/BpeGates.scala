package graft.gates

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/**
 * Driver-contract gates for LOADABLE BPE tokenization (§2.4 row 35
 * upgrade: real subword tokens, not the regex proxy).
 *
 * The fixture is a 27-merge GPT-2-format model (merges.txt +
 * vocab.json, written to a temp dir and loaded through the public file
 * API — the load path is part of what's gated). The oracle RE-DERIVES
 * the merge process in DuckDB: same pre-token regex, same whitespace→
 * marker mapping, then a recursive CTE that replays the merge rules in
 * rank order to a fixpoint per rule — equivalent to the min-rank-first
 * reference algorithm for any well-formed merges file (BpeModel
 * requires well-formedness at construction; see its Scaladoc for the
 * equivalence argument).
 */
object BpeGates {

  /** The planted merge rules, rank order. Each multi-char constituent
    * is the output of an earlier rule (well-formed), and the chains go
    * 5 deep (Ġ t → … → Ġstream), so the gate exercises real merge
    * recursion, not one-step pair joins. */
  private[graft] val Merges: IndexedSeq[(String, String)] = Vector(
    ("Ġ", "t"), ("Ġ", "s"), ("e", "r"), ("a", "t"), ("i", "n"), ("o", "r"),
    ("r", "e"), ("c", "h"), ("Ġt", "h"), ("Ġth", "e"), ("Ġ", "b"), ("Ġ", "a"),
    ("Ġ", "f"), ("Ġ", "m"), ("Ġ", "w"), ("Ġs", "t"), ("Ġst", "re"),
    ("Ġstre", "a"), ("Ġstrea", "m"), ("Ġb", "at"), ("Ġbat", "ch"),
    ("in", "e"), ("Ġa", "g"), ("Ġag", "g"), ("o", "w"), ("or", "t"),
    ("Ġs", "ort"))

  private[graft] val Alphabet: Seq[String] =
    "Ġabcdefghijklmnopqrstuvwxyz0123456789".map(_.toString)

  private[graft] val Vocab: Map[String, Int] = Bpe.derivedVocab(Merges, Alphabet)

  /** Write the fixture model files and load them through the public
    * API — every gate call exercises loadMerges + loadVocab. */
  private def fixtureTokenizer(s: SparkSession): graft.operators.BpeTokenizer = {
    val dir = Files.createTempDirectory("graft-bpe")
    val mergesTxt = ("#version: 0.2" +: Merges.map { case (a, b) => s"$a $b" })
      .mkString("", "\n", "\n")
    // tokens are marker chars + ASCII — no JSON escaping needed
    val vocabJson = Vocab.toSeq.sortBy(_._2)
      .map { case (t, i) => s""""$t": $i""" }.mkString("{", ", ", "}")
    Files.write(dir.resolve("merges.txt"),
      mergesTxt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.write(dir.resolve("vocab.json"),
      vocabJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Bpe.load(s, s"$dir/merges.txt", Some(s"$dir/vocab.json"))
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 row 35 (real tokenizer): per-doc token count + id-sequence
    // fingerprint under the planted model — value-checks every merge
    // decision on every document
    "q_bpe_tokens" -> { (s, dir) =>
      val tok = fixtureTokenizer(s)
      docs(s, dir)
        .select(col("doc_id"),
          coalesce(tok.encode(col("text")), array().cast("array<int>")).as("ids"))
        .select(col("doc_id"),
          size(col("ids")).cast("long").as("n_tokens"),
          md5(array_join(transform(col("ids"), _.cast("string")), ",")).as("ids_md5"))
    },
    // §2.4 row 109 — BPE TRAINING: the Sennrich hug/pug/pun/bun/hugs
    // plant trained live; every learned merge and its rank is
    // hand-derivable from the planted pair masses (incl. the final-round
    // tie broken lexicographically), so the oracle is the exact
    // expected merge table
    "q_bpe_train" -> { (s, _) =>
      import s.implicits._
      val corpus = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
        Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
        .toDF("text")
      val merges = graft.operators.Bpe.train(corpus, "text", numMerges = 5)
      merges.zipWithIndex
        .map { case ((a, b), i) => (i, a, b) }
        .toDF("rank", "left", "right")
    },
    // §2.4 row 63 under REAL tokens: fixed-size token-id windows with
    // overlap (chunkTokens 32, overlap 8) — the trainer-facing chunker
    "q_bpe_chunk" -> { (s, dir) =>
      val tok = fixtureTokenizer(s)
      tok.chunkIds(docs(s, dir), "text", "doc_id", chunkTokens = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_idx"),
          col("n_ids").cast("long").as("n_ids"),
          md5(array_join(transform(col("ids"), _.cast("string")), ",")).as("ids_md5"))
    }
  )

  // ------------------------------------------------------------- oracles

  private def mergesValues: String = Merges.zipWithIndex
    .map { case ((a, b), i) => s"(${i + 1},'$a','$b')" }.mkString(", ")

  private def vocabCaseArms: String = Vocab.toSeq.sortBy(_._2)
    .map { case (t, i) => s"WHEN '$t' THEN $i" }.mkString(" ")

  /** Shared derivation: per-doc ordered token ids, as
    * docagg(doc_id, n, s[comma-joined ids]) + docids(doc_id, ids). */
  private def bpeDeriveSql: String =
    s"""merges(rank, t1, t2) AS (VALUES $mergesValues),
       |pret AS (
       |  SELECT doc_id, generate_subscripts(pts, 1) AS ord, unnest(pts) AS pt
       |  FROM (SELECT doc_id,
       |          regexp_extract_all(coalesce(text,''), ' ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+') AS pts
       |        FROM documents)),
       |mapped AS (
       |  SELECT doc_id, ord,
       |         translate(pt, ' ' || chr(10) || chr(9) || chr(13), 'ĠĊĉč') AS w
       |  FROM pret),
       |init AS (
       |  SELECT w, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
       |  FROM (SELECT DISTINCT w FROM mapped)),
       |rec(w, s, r) AS (
       |  SELECT w, s, 1 FROM init
       |  UNION ALL
       |  SELECT rec.w,
       |    CASE WHEN contains(rec.s, ' '||t1||' '||t2||' ')
       |         THEN replace(rec.s, ' '||t1||' '||t2||' ', ' '||t1||t2||' ') ELSE rec.s END,
       |    CASE WHEN contains(rec.s, ' '||t1||' '||t2||' ') THEN rec.r ELSE rec.r + 1 END
       |  FROM rec JOIN merges ON merges.rank = rec.r),
       |enc AS (SELECT w, s FROM rec WHERE r = (SELECT max(rank) + 1 FROM merges)),
       |wid AS (
       |  SELECT w, list_transform(string_split(trim(s), ' '),
       |            t -> CASE t $vocabCaseArms ELSE -1 END) AS ids
       |  FROM enc),
       |docagg AS (
       |  SELECT m.doc_id,
       |         CAST(sum(len(ids)) AS BIGINT) AS n,
       |         string_agg(array_to_string(ids, ','), ',' ORDER BY m.ord) AS s
       |  FROM mapped m JOIN wid ON wid.w = m.w
       |  GROUP BY m.doc_id),
       |docids AS (
       |  SELECT m.doc_id, flatten(list(ids ORDER BY m.ord)) AS ids
       |  FROM mapped m JOIN wid ON wid.w = m.w
       |  GROUP BY m.doc_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_bpe_train" ->
      """SELECT * FROM (VALUES
        |  (0, 'u', 'g'),
        |  (1, 'u', 'n'),
        |  (2, 'h', 'ug'),
        |  (3, 'p', 'un'),
        |  (4, 'hug', 's')
        |) AS t(rank, "left", "right")""".stripMargin,
    "q_bpe_tokens" ->
      s"""WITH RECURSIVE
         |$bpeDeriveSql
         |SELECT d.doc_id,
         |       coalesce(n, CAST(0 AS BIGINT)) AS n_tokens,
         |       md5(coalesce(s, '')) AS ids_md5
         |FROM documents d LEFT JOIN docagg ON docagg.doc_id = d.doc_id""".stripMargin,
    "q_bpe_chunk" ->
      s"""WITH RECURSIVE
         |$bpeDeriveSql,
         |sized AS (
         |  SELECT doc_id, ids, len(ids) AS n,
         |         greatest(1, CAST(ceil((len(ids) - 8) / 24.0) AS BIGINT)) AS n_chunks
         |  FROM docids WHERE len(ids) > 0),
         |chunks AS (
         |  SELECT doc_id, chunk_idx,
         |         ids[CAST(chunk_idx * 24 + 1 AS BIGINT):CAST(chunk_idx * 24 + 32 AS BIGINT)] AS cids
         |  FROM (SELECT doc_id, ids, unnest(range(0, n_chunks)) AS chunk_idx FROM sized))
         |SELECT doc_id, chunk_idx,
         |       CAST(len(cids) AS BIGINT) AS n_ids,
         |       md5(array_to_string(cids, ',')) AS ids_md5
         |FROM chunks""".stripMargin
  )
}
