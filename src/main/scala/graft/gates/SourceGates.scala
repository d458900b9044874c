package graft.gates

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{JsonLines, PathKeys, TsvSource}

/**
 * Correctness-gate queries for the sources/sinks (SURVEY.md §2.2).
 *
 * These gates exercise real file IO: each query writes a small fixture
 * under a fresh temp directory, round-trips it through the graft
 * source/sink, and returns the result; the oracle is the equivalent
 * literal relation (`VALUES`) in DuckDB. The fixture content is fixed, so
 * the comparison is deterministic.
 */
object SourceGates {

  private def write(dir: Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    ()
  }

  /** Deterministic fixture tarball: `members` as regular entries plus one
    * directory entry (which the source must skip), optionally gzipped.
    * LONGFILE_POSIX: names over ustar's 100-char field are written as
    * PAX extended headers — the pseudo-entries the source must consume,
    * not surface. */
  private def writeTar(
    dest: Path, members: Seq[(String, String)], codec: String
  ): Unit = {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
    val fileOut = Files.newOutputStream(dest)
    val tar = new TarArchiveOutputStream(codec match {
      case "gzip" => new GzipCompressorOutputStream(fileOut)
      case "zstd" => new com.github.luben.zstd.ZstdOutputStream(fileOut)
      case _      => fileOut
    })
    tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    try {
      tar.putArchiveEntry(new TarArchiveEntry("sub/"))
      tar.closeArchiveEntry()
      members.foreach { case (name, content) =>
        val bytes = content.getBytes("UTF-8")
        val e = new TarArchiveEntry(name)
        e.setSize(bytes.length.toLong)
        tar.putArchiveEntry(e)
        tar.write(bytes)
        tar.closeArchiveEntry()
      }
    } finally tar.close()
  }

  /** Deterministic WARC fixture: records of (type, uri, contentType,
    * payload) written per ISO 28500; `perRecordGzip` writes each record
    * as its own gzip member (the Common Crawl layout). */
  private def writeWarc(
    dest: Path,
    records: Seq[(String, String, String, Array[Byte])],
    perRecordGzip: Boolean
  ): Unit = {
    import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
    val out = Files.newOutputStream(dest)
    try {
      records.zipWithIndex.foreach { case ((rtype, uri, ctype, payload), i) =>
        val sb = new StringBuilder
        sb.append("WARC/1.0\r\n")
        sb.append(s"WARC-Type: $rtype\r\n")
        sb.append(s"WARC-Record-ID: <urn:uuid:rec-$i>\r\n")
        sb.append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
        if (uri != null) sb.append(s"WARC-Target-URI: $uri\r\n")
        sb.append(s"Content-Type: $ctype\r\n")
        sb.append(s"Content-Length: ${payload.length}\r\n")
        sb.append("\r\n")
        val head = sb.toString.getBytes("UTF-8")
        val tail = "\r\n\r\n".getBytes("UTF-8")
        if (perRecordGzip) {
          val gz = new GzipCompressorOutputStream(out)
          gz.write(head); gz.write(payload); gz.write(tail)
          gz.finish()
        } else {
          out.write(head); out.write(payload); out.write(tail)
        }
      }
    } finally out.close()
  }

  /** The shared WARC gate fixture (both gates read the same files):
    * crawl1.warc — warcinfo + 40 HTML `response` records;
    * crawl2.warc.gz — 31 WET `conversion` records, one gzip member
    * each. Contents follow range()-re-derivable formulas. */
  private def warcFixtureDir(): Path = {
    val dir = Files.createTempDirectory("graft-warc")
    val responses = (0 until 40).map { i =>
      val html =
        s"<html><body><p>doc $i ${"ha " * (i % 13)}</p></body></html>"
      val payload =
        ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" +
          html).getBytes("UTF-8")
      ("response", s"http://site${i % 7}.example/p$i",
        "application/http; msgtype=response", payload)
    }
    val info = ("warcinfo", null: String, "application/warc-fields",
      "software: graft-fixture\r\n".getBytes("UTF-8"))
    writeWarc(dir.resolve("crawl1.warc"), info +: responses, perRecordGzip = false)
    val wets = (0 until 31).map { i =>
      ("conversion", s"http://wet$i.example/", "text/plain",
        s"wet doc $i: ${"tok " * (i % 11)}".getBytes("UTF-8"))
    }
    writeWarc(dir.resolve("crawl2.warc.gz"), wets, perRecordGzip = true)
    dir
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 row 18 — header-TSV source: cells trimmed, empty-after-trim → NULL
    "q_tsv_roundtrip" -> { (s, _) =>
      val dir = Files.createTempDirectory("graft-tsv")
      write(dir, "t.tsv",
        "id\tname\tscore\n" +
          "1\t  alpha  \t3.5\n" +
          "2\t\t4.0\n" +
          "3\tbeta\t   \n")
      TsvSource.read(s, dir.resolve("t.tsv").toString)
        .drop(TsvSource.PathCol)
    },
    // §2.2 rows 14-16 — JSON-lines round-trip: longs stay BIGINT, doubles
    // stay DOUBLE, NULL fields dropped on write and re-inferred as NULL
    "q_jsonlines_roundtrip" -> { (s, _) =>
      import s.implicits._
      val dir = Files.createTempDirectory("graft-jsonl")
      val in = Seq(
        (1L, 1.5, Option("x")),
        (2L, 2.0, Option.empty[String])
      ).toDF("a", "b", "c")
      JsonLines.write(in, dir.resolve("out").toString)
      val back = JsonLines.read(s, dir.resolve("out").toString + "/*.json")
      back.select(
        col("a"), col("b"), col("c"),
        lit(back.schema("a").dataType.simpleString).as("a_type"),
        lit(back.schema("b").dataType.simpleString).as("b_type")
      )
    },
    // §2.2 row 17 — glob matching nothing yields empty, not an error
    "q_glob_empty_ok" -> { (s, _) =>
      import s.implicits._
      val dir = Files.createTempDirectory("graft-empty")
      val df = TsvSource.readGlob(s, s"$dir/absent-*.tsv")
      Seq((df.count(), df.columns.length)).toDF("n_rows", "n_cols")
    },
    // archive ingestion — tar members as rows: 341 members across a
    // mixed plain/.tar.gz/.tar.zst glob (compression sniffed by magic
    // bytes, never extension), nested directories, one PAX long-name
    // member (>100 chars, exercising the extended header path), and a
    // directory entry that must be skipped. Member contents follow a
    // formula the oracle re-derives with range() + repeat(), so every
    // member's BYTES are value-checked, not just names/counts
    "q_tar_members" -> { (s, _) =>
      val dir = Files.createTempDirectory("graft-tar")
      val drop1 = (0 until 200).map(i =>
        s"d${i / 50}/f$i.txt" -> s"m$i:${"x" * (i % 37)}\n") :+
        (s"longdir-${"p" * 120}/deep.txt" -> "pax long name member\n")
      val drop2 = (200 until 300).map(i =>
        s"g/f$i.txt" -> s"z$i:${"y" * (i % 23)}\n")
      val drop3 = (300 until 340).map(i =>
        s"h/f$i.txt" -> s"w$i:${"v" * (i % 29)}\n")
      writeTar(dir.resolve("drop1.tar"), drop1, codec = "none")
      writeTar(dir.resolve("drop2.tar.gz"), drop2, codec = "gzip")
      writeTar(dir.resolve("drop3.tar.zst"), drop3, codec = "zstd")
      graft.sources.Archives.readTar(s, s"$dir/drop*")
        .select(
          regexp_extract(col("archive_path"), "[^/]+$", 0).as("archive"),
          col("member_name"),
          col("member_size"),
          md5(col("member_bytes")).as("member_md5"))
    },
    // §2.2 row 82 — tar-shard SINK roundtrip, gzip AND zstd arms: the
    // documents table written as rolling compressed tar shards (small
    // cap forces several shards per partition) under each codec, read
    // back with readTar, and gated member-by-member against the
    // original rows — names, sizes, and content hashes must survive
    // both containers
    "q_tar_shard_roundtrip" -> { (s, dir) =>
      val outGz = Files.createTempDirectory("graft-tarsink").toString
      val outZst = Files.createTempDirectory("graft-tarsink-zst").toString
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(
          concat(lit("doc_"), col("doc_id"), lit(".txt")).as("member_name"),
          col("text").cast("binary").as("member_bytes"))
        .repartition(4)
      val manifest = graft.sources.Archives.writeTarShards(
        docs, outGz, maxShardBytes = 16 << 10, codec = "gzip")
      assert(manifest.count() > 4, "shard rolling never triggered")
      val zdocs = docs.withColumn("member_name", concat(lit("z_"), col("member_name")))
      val zManifest = graft.sources.Archives.writeTarShards(
        zdocs, outZst, maxShardBytes = 16 << 10, codec = "zstd")
      assert(zManifest.count() > 4, "zstd shard rolling never triggered")
      graft.sources.Archives.readTar(s, s"$outGz/part-*")
        .unionByName(graft.sources.Archives.readTar(s, s"$outZst/part-*"))
        .select(
          col("member_name"),
          col("member_size"),
          md5(col("member_bytes")).as("member_md5"))
    },
    // WARC/WET ingestion — one row per record across a mixed
    // plain-.warc / per-record-gzipped-.warc.gz glob: types, URIs,
    // lengths, payload AND parsed-HTTP-body bytes all value-checked
    // against a formula the oracle re-derives with range(); the
    // warcinfo pseudo-record surfaces too (callers filter by type)
    "q_warc_records" -> { (s, _) =>
      val dir = warcFixtureDir()
      graft.sources.Warc.readWarc(s, s"$dir/crawl*")
        .select(
          regexp_extract(col("warc_path"), "[^/]+$", 0).as("warc"),
          col("record_index"),
          col("record_type"),
          col("target_uri"),
          col("content_length"),
          md5(col("payload")).as("payload_md5"),
          col("http_status"),
          md5(col("body")).as("body_md5"))
    },
    // WARC → text composition: responses strip their HTML (via the
    // HTTP Content-Type parsed off the payload), WET conversion text
    // passes through; whitespace-normalized so the oracle re-derives
    // the exact visible text
    "q_warc_to_text" -> { (s, _) =>
      val dir = warcFixtureDir()
      graft.sources.Warc.warcToText(graft.sources.Warc.readWarc(s, s"$dir/crawl*"))
        .select(
          regexp_extract(col("warc_path"), "[^/]+$", 0).as("warc"),
          col("record_index"), col("url"),
          trim(regexp_replace(col("text"), "\\s+", " ")).as("text_norm"))
    },
    // WARC SINK roundtrip — the documents table published as rolling
    // per-record-gzip WET shards (small cap forces several shards per
    // partition), read back with readWarc and gated record-by-record:
    // URIs, types, and body bytes must survive the container
    "q_warc_roundtrip" -> { (s, dir) =>
      val out = Files.createTempDirectory("graft-warcsink").toString
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(concat(lit("http://corpus.example/doc/"), col("doc_id")).as("url"),
          col("text"))
        .repartition(4)
      val manifest = graft.sources.Warc.writeWarcShards(
        docs, out, maxShardBytes = 16 << 10)
      assert(manifest.count() > 4, "warc shard rolling never triggered")
      graft.sources.Warc.readWarc(s, s"$out/part-*")
        .select(col("target_uri").as("url"), col("record_type"),
          md5(col("body")).as("text_md5"))
    },
    // §2.2 row 82 WRITE half in isolation — the r11 verdict's variance
    // attribution: q_tar_shard_roundtrip timed write+read through both
    // codecs in one number, so its swings couldn't be attributed. This
    // cell pays ONLY the sink cost (fresh temp dir per run, both
    // codecs); the oracle checks the aggregate member accounting
    "q_tar_shard_write" -> { (s, dir) =>
      import s.implicits._
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(
          concat(lit("doc_"), col("doc_id"), lit(".txt")).as("member_name"),
          col("text").cast("binary").as("member_bytes"))
        .repartition(4)
      val outGz = Files.createTempDirectory("graft-tarw-gz").toString
      val outZst = Files.createTempDirectory("graft-tarw-zst").toString
      val mGz = graft.sources.Archives.writeTarShards(
        docs, outGz, maxShardBytes = 16 << 10, codec = "gzip")
      val mZst = graft.sources.Archives.writeTarShards(
        docs, outZst, maxShardBytes = 16 << 10, codec = "zstd")
      mGz.withColumn("codec", lit("gzip"))
        .unionByName(mZst.withColumn("codec", lit("zstd")))
        .groupBy("codec")
        .agg(sum("n_members").as("total_members"),
          sum("member_bytes").as("total_bytes"))
    },
    // §2.2 row 82 READ half in isolation: shards are written ONCE into
    // a per-sf fixture dir (only if absent — bench reruns pay read-only
    // cost), then read back member-by-member under the roundtrip's
    // member-level oracle
    "q_tar_shard_read" -> { (s, dir) =>
      val fix = new java.io.File(
        s"/tmp/graft_tarfix_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
      val done = new java.io.File(fix, "_FIXTURE_DONE")
      if (!done.exists()) {
        val docs = s.read.parquet(s"$dir/documents.parquet")
          .select(
            concat(lit("doc_"), col("doc_id"), lit(".txt")).as("member_name"),
            col("text").cast("binary").as("member_bytes"))
          .repartition(4)
        graft.sources.Archives.writeTarShards(
          docs, s"$fix/gz", maxShardBytes = 16 << 10, codec = "gzip")
        graft.sources.Archives.writeTarShards(
          docs.withColumn("member_name", concat(lit("z_"), col("member_name"))),
          s"$fix/zst", maxShardBytes = 16 << 10, codec = "zstd")
        done.createNewFile()
      }
      graft.sources.Archives.readTar(s, s"$fix/gz/part-*")
        .unionByName(graft.sources.Archives.readTar(s, s"$fix/zst/part-*"))
        .select(
          col("member_name"),
          col("member_size"),
          md5(col("member_bytes")).as("member_md5"))
    },
    // document-text extraction seam — mixed txt/html/rtf/binary corpus
    // through the built-in extractors: format sniffed from magic bytes,
    // text re-derived by the oracle per format (html entity + tag
    // semantics, rtf control words), binary rows surface NULL text
    "q_doc_extract" -> { (s, _) =>
      import s.implicits._
      val rows: Seq[(Long, Array[Byte])] =
        (0 until 20).map(i => (i.toLong,
          s"plain doc $i body ${"w " * (i % 5)}".getBytes("UTF-8"))) ++
        (0 until 20).map(i => (100L + i,
          s"<html><body><p>web doc $i &amp; x${"<br>" * (i % 3)}</p></body></html>"
            .getBytes("UTF-8"))) ++
        (0 until 20).map(i => (200L + i,
          s"{\\rtf1\\ansi{\\fonttbl{\\f0 Arial;}}\\f0 rtf doc $i\\par line $i}"
            .getBytes("UTF-8"))) ++
        Seq((300L, Array[Byte](0x00, 0x01, 0x02)))
      val df = rows.toDF("doc_id", "payload")
      graft.operators.DocExtract.extractText(df, "payload")
        .select(col("doc_id"), col("doc_format"),
          trim(regexp_replace(col("text"), "\\s+", " ")).as("text_norm"))
    },
    // crawl-to-corpus COMPOSITION: readWarc → warcToText →
    // Web.withUrlParts → per-domain doc counts and total visible text —
    // the first three steps a real crawl pipeline runs, composed over
    // the shared WARC fixture and re-derived end-to-end by the oracle
    "q_warc_domains" -> { (s, _) =>
      val dir = warcFixtureDir()
      val text = graft.sources.Warc.warcToText(
        graft.sources.Warc.readWarc(s, s"$dir/crawl*"))
      graft.operators.Web.withUrlParts(text, "url")
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(trim(regexp_replace(col("text"), "\\s+", " "))))
            .as("text_chars"))
    },
    // §2.2 row 19 — ancestry ID extracted from the file path
    "q_ancestry_id" -> { (s, _) =>
      import s.implicits._
      val in = Seq(
        ("r1", "/data/in/ancestry=EU/part-0.tsv"),
        ("r2", "/data/in/ancestry=AF/part-1.tsv"),
        ("r3", "/data/in/ancestry=EAS/sub/part-2.tsv")
      ).toDF("row_id", TsvSource.PathCol)
      PathKeys.withAncestryId()(in)
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_tsv_roundtrip" ->
      """SELECT * FROM (VALUES
        |  ('1', 'alpha', '3.5'),
        |  ('2', NULL,    '4.0'),
        |  ('3', 'beta',  NULL)
        |) AS t(id, name, score)""".stripMargin,
    "q_jsonlines_roundtrip" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 1.5, 'x',  'bigint', 'double'),
        |  (CAST(2 AS BIGINT), 2.0, NULL, 'bigint', 'double')
        |) AS t(a, b, c, a_type, b_type)""".stripMargin,
    "q_glob_empty_ok" ->
      "SELECT CAST(0 AS BIGINT) AS n_rows, 0 AS n_cols",
    "q_tar_members" ->
      """SELECT archive, member_name,
        |       CAST(length(content) AS BIGINT) AS member_size,
        |       md5(content) AS member_md5
        |FROM (
        |  SELECT 'drop1.tar' AS archive,
        |         'd' || (i // 50) || '/f' || i || '.txt' AS member_name,
        |         'm' || i || ':' || repeat('x', CAST(i % 37 AS INT)) || chr(10) AS content
        |  FROM range(0, 200) t(i)
        |  UNION ALL
        |  SELECT 'drop2.tar.gz',
        |         'g/f' || i || '.txt',
        |         'z' || i || ':' || repeat('y', CAST(i % 23 AS INT)) || chr(10)
        |  FROM range(200, 300) t(i)
        |  UNION ALL
        |  SELECT 'drop3.tar.zst',
        |         'h/f' || i || '.txt',
        |         'w' || i || ':' || repeat('v', CAST(i % 29 AS INT)) || chr(10)
        |  FROM range(300, 340) t(i)
        |  UNION ALL
        |  SELECT 'drop1.tar',
        |         'longdir-' || repeat('p', 120) || '/deep.txt',
        |         'pax long name member' || chr(10)
        |)""".stripMargin,
    "q_tar_shard_roundtrip" ->
      """SELECT 'doc_' || doc_id || '.txt' AS member_name,
        |       CAST(octet_length(text::BLOB) AS BIGINT) AS member_size,
        |       md5(text) AS member_md5
        |FROM documents
        |UNION ALL
        |SELECT 'z_doc_' || doc_id || '.txt',
        |       CAST(octet_length(text::BLOB) AS BIGINT),
        |       md5(text)
        |FROM documents""".stripMargin,
    "q_warc_records" ->
      """WITH resp AS (
        |  SELECT i,
        |         '<html><body><p>doc ' || i || ' ' ||
        |           repeat('ha ', CAST(i % 13 AS INT)) || '</p></body></html>' AS html
        |  FROM range(0, 40) t(i)
        |), wet AS (
        |  SELECT i,
        |         'wet doc ' || i || ': ' || repeat('tok ', CAST(i % 11 AS INT)) AS txt
        |  FROM range(0, 31) t(i)
        |)
        |SELECT 'crawl1.warc' AS warc, CAST(0 AS BIGINT) AS record_index,
        |       'warcinfo' AS record_type, CAST(NULL AS VARCHAR) AS target_uri,
        |       CAST(octet_length(('software: graft-fixture' || chr(13) || chr(10))::BLOB)
        |            AS BIGINT) AS content_length,
        |       md5('software: graft-fixture' || chr(13) || chr(10)) AS payload_md5,
        |       CAST(NULL AS INT) AS http_status,
        |       md5('software: graft-fixture' || chr(13) || chr(10)) AS body_md5
        |UNION ALL
        |SELECT 'crawl1.warc', i + 1, 'response',
        |       'http://site' || (i % 7) || '.example/p' || i,
        |       CAST(octet_length(('HTTP/1.1 200 OK' || chr(13) || chr(10) ||
        |         'Content-Type: text/html; charset=utf-8' || chr(13) || chr(10) ||
        |         chr(13) || chr(10) || html)::BLOB) AS BIGINT),
        |       md5('HTTP/1.1 200 OK' || chr(13) || chr(10) ||
        |         'Content-Type: text/html; charset=utf-8' || chr(13) || chr(10) ||
        |         chr(13) || chr(10) || html),
        |       200,
        |       md5(html)
        |FROM resp
        |UNION ALL
        |SELECT 'crawl2.warc.gz', i, 'conversion',
        |       'http://wet' || i || '.example/',
        |       CAST(octet_length(txt::BLOB) AS BIGINT), md5(txt), NULL, md5(txt)
        |FROM wet""".stripMargin,
    "q_warc_to_text" ->
      """SELECT 'crawl1.warc' AS warc, CAST(i + 1 AS BIGINT) AS record_index,
        |       'http://site' || (i % 7) || '.example/p' || i AS url,
        |       trim('doc ' || i || ' ' || repeat('ha ', CAST(i % 13 AS INT)))
        |         AS text_norm
        |FROM range(0, 40) t(i)
        |UNION ALL
        |SELECT 'crawl2.warc.gz', CAST(i AS BIGINT),
        |       'http://wet' || i || '.example/',
        |       trim('wet doc ' || i || ': ' || repeat('tok ', CAST(i % 11 AS INT)))
        |FROM range(0, 31) t(i)""".stripMargin,
    "q_warc_roundtrip" ->
      """SELECT 'http://corpus.example/doc/' || doc_id AS url,
        |       'conversion' AS record_type,
        |       md5(text) AS text_md5
        |FROM documents""".stripMargin,
    "q_tar_shard_write" ->
      """SELECT codec,
        |       (SELECT count(*) FROM documents) AS total_members,
        |       (SELECT CAST(sum(octet_length(text::BLOB)) AS BIGINT)
        |        FROM documents) AS total_bytes
        |FROM (VALUES ('gzip'), ('zstd')) c(codec)""".stripMargin,
    "q_tar_shard_read" ->
      """SELECT 'doc_' || doc_id || '.txt' AS member_name,
        |       CAST(octet_length(text::BLOB) AS BIGINT) AS member_size,
        |       md5(text) AS member_md5
        |FROM documents
        |UNION ALL
        |SELECT 'z_doc_' || doc_id || '.txt',
        |       CAST(octet_length(text::BLOB) AS BIGINT),
        |       md5(text)
        |FROM documents""".stripMargin,
    "q_doc_extract" ->
      """SELECT CAST(i AS BIGINT) AS doc_id, 'txt' AS doc_format,
        |       trim('plain doc ' || i || ' body ' || repeat('w ', CAST(i % 5 AS INT)))
        |         AS text_norm
        |FROM range(0, 20) t(i)
        |UNION ALL
        |SELECT 100 + i, 'html',
        |       trim('web doc ' || i || ' & x')
        |FROM range(0, 20) t(i)
        |UNION ALL
        |SELECT 200 + i, 'rtf',
        |       'rtf doc ' || i || ' line ' || i
        |FROM range(0, 20) t(i)
        |UNION ALL
        |SELECT 300, 'bin', NULL""".stripMargin,
    "q_warc_domains" ->
      """WITH resp AS (
        |  SELECT 'site' || (i % 7) || '.example' AS domain,
        |         length(trim('doc ' || i || ' ' ||
        |           repeat('ha ', CAST(i % 13 AS INT)))) AS chars
        |  FROM range(0, 40) t(i)
        |), wet AS (
        |  SELECT 'wet' || i || '.example' AS domain,
        |         length(trim('wet doc ' || i || ': ' ||
        |           repeat('tok ', CAST(i % 11 AS INT)))) AS chars
        |  FROM range(0, 31) t(i)
        |), allr AS (
        |  SELECT domain, chars FROM resp
        |  UNION ALL SELECT domain, chars FROM wet
        |)
        |SELECT domain, count(*) AS n_docs,
        |       CAST(sum(chars) AS BIGINT) AS text_chars
        |FROM allr GROUP BY domain""".stripMargin,
    "q_ancestry_id" ->
      """SELECT * FROM (VALUES
        |  ('r1', '/data/in/ancestry=EU/part-0.tsv',  'EU'),
        |  ('r2', '/data/in/ancestry=AF/part-1.tsv',  'AF'),
        |  ('r3', '/data/in/ancestry=EAS/sub/part-2.tsv', 'EAS')
        |) AS t(row_id, source_file, ancestry)""".stripMargin
  )
}
