package graft.sources

import java.io.{ByteArrayInputStream, EOFException, InputStream}
import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC/WET ingestion (ISO 28500, the Common Crawl container) — the
 * crawl-native entry point feeding [[graft.operators.Web.stripHtml]]
 * and `withUrlParts`: one row per WARC record, read DISTRIBUTED with
 * the same shape as [[Archives.readTar]] (no driver loop, each archive
 * one `binaryFile` row expanded executor-side).
 *
 * Scale shape: a `.warc.gz` is a sequence of per-record gzip members
 * (the Common Crawl layout — enables record-level random access), but
 * like tar it carries no cross-record index, so one file is one task;
 * the crawl ships thousands of ~1 GiB files, which is exactly the
 * many-modest-archives parallelism [[Archives.readTar]] documents.
 * `GzipCompressorInputStream(_, true)` decompresses concatenated
 * members as one stream, so per-record-gzipped and whole-file-gzipped
 * WARCs both read; plain uncompressed `.warc`/`.wet` too (magic-byte
 * sniff, never extension).
 *
 * Both memory hazards carry the [[Archives.readTar]] guards: the
 * binaryFile 2 GiB single-row cap is enforced at PLAN TIME from
 * listing metadata, and a file whose DECOMPRESSED records blow past
 * `maxDecompressedBytes` fails executor-side naming the file.
 *
 * Record semantics:
 *  - every record surfaces (`warcinfo`, `request`, `response`,
 *    `metadata`, `conversion`, …) with its `record_type` — callers
 *    filter; `record_index` is the record's 0-based position in its
 *    file (re-derivable, the gate's oracle key).
 *  - `payload` is the record's raw content block. For
 *    `application/http` payloads (the `response` records of a full
 *    WARC) `body` is the HTTP message body (headers split at the first
 *    CRLFCRLF, status line parsed to `http_status`); for everything
 *    else (WET `conversion` records are already text) `body` ==
 *    `payload` and `http_status` is null.
 */
object Warc {

  /** Header names are case-insensitive (ISO 28500 §4). */
  private def header(h: Map[String, String], name: String): Option[String] =
    h.get(name.toLowerCase(java.util.Locale.ROOT))

  /** One CRLF- (or bare-LF-) terminated line as ISO-8859-1 (header
    * bytes are ASCII by spec; 8859-1 is byte-transparent for the
    * lenient path). Returns null at EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(64)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      sb.append(b.toChar)
      b = in.read()
    }
    val n = sb.length()
    if (n > 0 && sb.charAt(n - 1) == '\r') sb.setLength(n - 1)
    sb.toString
  }

  private def readFully(in: InputStream, n: Int, path: String, idx: Long): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n - off)
      if (k < 0) throw new EOFException(
        s"readWarc: $path record $idx truncated — Content-Length promised " +
          s"$n bytes, stream ended at $off")
      off += k
    }
    buf
  }

  private[graft] final case class Rec(
    warcPath: String,
    recordIndex: Long,
    recordType: String,
    recordId: String,
    targetUri: String,
    warcDate: String,
    contentType: String,
    contentLength: Long,
    payload: Array[Byte],
    httpStatus: java.lang.Integer,
    httpContentType: String,
    body: Array[Byte])

  /** Parse every record of one (decompressed) WARC stream — strict
    * buffer, same rationale as [[Archives.readTar]]'s eager member
    * read: the iterator must not outlive the stream. */
  private[graft] def parseAll(
    in: InputStream, warcPath: String, maxDecompressedBytes: Long
  ): Seq[Rec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var total = 0L
    var idx = 0L
    var line = readLine(in)
    while (line != null) {
      // tolerate blank separator lines between records
      while (line != null && line.isEmpty) line = readLine(in)
      if (line != null) {
        if (!line.startsWith("WARC/"))
          throw new IllegalStateException(
            s"readWarc: $warcPath record $idx: expected a WARC/x.y version " +
              s"line, got '${line.take(80)}' — not a WARC file, or corrupt")
        val h = scala.collection.mutable.Map.empty[String, String]
        var hl = readLine(in)
        while (hl != null && hl.nonEmpty) {
          val i = hl.indexOf(':')
          if (i > 0)
            h(hl.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)) =
              hl.substring(i + 1).trim
          hl = readLine(in)
        }
        val hdrs = h.toMap
        val len = header(hdrs, "Content-Length").map(_.toLong).getOrElse(
          throw new IllegalStateException(
            s"readWarc: $warcPath record $idx has no Content-Length — " +
              "malformed WARC"))
        require(len >= 0,
          s"readWarc: $warcPath record $idx has negative Content-Length " +
            s"$len — malformed WARC")
        require(len <= Int.MaxValue - 512,
          s"readWarc: $warcPath record $idx Content-Length $len exceeds the " +
            "single-record byte cap — split the crawl file upstream")
        total += len
        if (total > maxDecompressedBytes)
          throw new IllegalStateException(
            s"readWarc: decompressed records of $warcPath exceed " +
              s"maxDecompressedBytes=$maxDecompressedBytes (at record $idx). " +
              "Split the crawl file upstream, or raise maxDecompressedBytes " +
              "if executors have the memory.")
        val payload = readFully(in, len.toInt, warcPath, idx)
        val ctype = header(hdrs, "Content-Type").getOrElse("")
        // application/http payload: split HTTP headers from body at the
        // first CRLFCRLF and parse the status line; everything else
        // (WET conversion text, warcinfo fields) passes through
        var status: java.lang.Integer = null
        var httpCtype: String = null
        var body = payload
        if (ctype.toLowerCase(java.util.Locale.ROOT).startsWith("application/http")) {
          val sep = indexOfCrlfCrlf(payload)
          val headerEnd = if (sep >= 0) sep else payload.length
          if (sep >= 0) body = java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
          val httpHead = new String(payload, 0, headerEnd,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          HttpStatusRe.findFirstMatchIn(httpHead)
            .foreach(g => status = Integer.valueOf(g.group(1).toInt))
          HttpCtypeRe.findFirstMatchIn(httpHead)
            .foreach(g => httpCtype = g.group(1).trim)
        }
        out += Rec(
          warcPath, idx,
          header(hdrs, "WARC-Type").getOrElse(""),
          header(hdrs, "WARC-Record-ID").getOrElse(""),
          header(hdrs, "WARC-Target-URI").orNull,
          header(hdrs, "WARC-Date").orNull,
          ctype, len, payload, status, httpCtype, body)
        idx += 1
        line = readLine(in)
      }
    }
    out.toSeq
  }

  private val HttpStatusRe = """HTTP/\d\.\d\s+(\d{3})""".r
  private val HttpCtypeRe =
    """(?im)^content-type:\s*([^\r\n]+)""".r

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Gzip magic sniff; concatenated-member mode so per-record-gzipped
    * Common Crawl files read as one stream. */
  private def inputStreamFor(bytes: Array[Byte]): InputStream = {
    val raw = new ByteArrayInputStream(bytes)
    if (bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
      new GzipCompressorInputStream(raw, true)
    else raw
  }

  /**
   * Read every WARC/WET file matching `path` (file, directory, or glob)
   * into one row per record:
   * `(warc_path, record_index, record_type, record_id, target_uri,
   *   warc_date, content_type, content_length, payload, http_status,
   *   body)`.
   */
  def readWarc(
    spark: SparkSession,
    path: String,
    maxDecompressedBytes: Long = Archives.DefaultMaxDecompressedBytes
  ): DataFrame = {
    import spark.implicits._
    require(maxDecompressedBytes > 0,
      s"maxDecompressedBytes must be positive: $maxDecompressedBytes")
    val files = spark.read.format("binaryFile").load(path)
    val oversized = files
      .select("path", "length")
      .filter(col("length") > Archives.MaxArchiveOnDiskBytes)
      .as[(String, Long)]
      .take(5)
    if (oversized.nonEmpty) {
      val worst = oversized
        .map { case (p, n) => s"$p (${n >> 20} MiB)" }.mkString(", ")
      throw new IllegalArgumentException(
        s"readWarc: file(s) exceed the ${Archives.MaxArchiveOnDiskBytes >> 20} " +
          s"MiB single-file cap binaryFile can materialize as one row: $worst. " +
          "Split the crawl file upstream (Common Crawl ships ~1 GiB segments " +
          "for exactly this reason).")
    }
    files
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (warcPath, bytes) =>
        val in = inputStreamFor(bytes)
        try parseAll(in, warcPath, maxDecompressedBytes)
        finally in.close()
      }
      .toDF("warc_path", "record_index", "record_type", "record_id",
        "target_uri", "warc_date", "content_type", "content_length",
        "payload", "http_status", "http_content_type", "body")
  }

  /**
   * WARC SINK — the inverse of [[readWarc]], publishing a curated text
   * corpus as WET-style `conversion` records in rolling `.warc.gz`
   * shards (each record its OWN gzip member, the Common Crawl layout —
   * so consumers get record-level random access and [[readWarc]]'s
   * concatenated-member mode reads them back). Same distributed shape
   * as [[Archives.writeTarShards]]: each input partition writes its own
   * shard sequence (`part-<partition>-<seq>.warc.gz`), cutting a new
   * shard past `maxShardBytes` of RECORD bytes; task-start cleanup
   * drops a prior attempt's shards so retries are idempotent; output
   * goes through the Hadoop FileSystem API.
   *
   * Records are DETERMINISTIC: `WARC-Record-ID` derives from the md5 of
   * (uri, payload) — a content urn, not a random uuid — and `WARC-Date`
   * comes from `dateCol` (ISO 8601) or the fixed epoch default, so a
   * re-published corpus is byte-stable modulo gzip mtime (which the
   * writer zeroes via a fixed-deflater path: commons-compress writes no
   * name/mtime by default).
   *
   * Returns the shard manifest (shard_path, n_records, record_bytes) —
   * driver-local, the [[Archives.writeTarShards]] exactly-once
   * contract.
   */
  def writeWarcShards(
    df: DataFrame,
    dir: String,
    uriCol: String = "url",
    textCol: String = "text",
    dateCol: Option[String] = None,
    maxShardBytes: Long = 1L << 30,
    perRecordGzip: Boolean = true
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(maxShardBytes > 0, s"maxShardBytes must be positive: $maxShardBytes")
    val conf = new Archives.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(conf.value).mkdirs(dirPath)
    // WARC-Date renders from epoch micros in the JVM (ISO instant,
    // always UTC) — date_format would print in the SESSION time zone
    // while the header suffix says Z, silently shifting every instant
    // on non-UTC sessions; NULL dates fall back to the fixed default
    val dateExpr = dateCol.fold(lit(null).cast("long"))(c =>
      unix_micros(col(c).cast("timestamp")))

    val manifest: Array[(String, Long, Long)] = df
      .select(col(uriCol).cast("string"), col(textCol).cast("string"),
        dateExpr)
      .as[(String, String, Option[Long])]
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf.value)
          fs.globStatus(new org.apache.hadoop.fs.Path(
              dirPath, f"part-$pid%05d-*")) match {
            case null => ()
            case stale => stale.foreach(s => fs.delete(s.getPath, false))
          }
          val md = java.security.MessageDigest.getInstance("MD5")
          val shards = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
          var seq = 0
          var out: java.io.OutputStream = null
          var shardPath: String = null
          var nRecords = 0L
          var nBytes = 0L

          def open(): Unit = {
            shardPath = new org.apache.hadoop.fs.Path(
              dirPath, f"part-$pid%05d-$seq%04d.warc.gz").toString
            val raw = fs.create(new org.apache.hadoop.fs.Path(shardPath), true)
            // whole-shard gzip: ONE deflater per shard instead of one per
            // record — measured ~10x faster on small records; trade away
            // record-level random access (readWarc reads both layouts)
            out = if (perRecordGzip) raw
              else new org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream(raw)
            nRecords = 0L
            nBytes = 0L
          }
          def close(): Unit = if (out != null) {
            out.close()
            shards += ((shardPath, nRecords, nBytes))
            out = null
          }

          val dateFmt = java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
            .withZone(java.time.ZoneOffset.UTC)
          open()
          try {
            rows.foreach { case (uri, text, dateMicros) =>
              val date = dateMicros
                .map(us => dateFmt.format(java.time.Instant.ofEpochSecond(
                  Math.floorDiv(us, 1000000L))))
                .getOrElse("2000-01-01T00:00:00Z")
              val payload = Option(text).getOrElse("").getBytes("UTF-8")
              if (nBytes > 0 && nBytes + payload.length > maxShardBytes) {
                close(); seq += 1; open()
              }
              md.reset()
              md.update(Option(uri).getOrElse("").getBytes("UTF-8"))
              md.update(0.toByte)
              md.update(payload)
              val rid = md.digest().map("%02x".format(_)).mkString
              val head = new StringBuilder()
                .append("WARC/1.0\r\n")
                .append("WARC-Type: conversion\r\n")
                .append(s"WARC-Record-ID: <urn:md5:$rid>\r\n")
                .append(s"WARC-Date: $date\r\n")
              if (uri != null) head.append(s"WARC-Target-URI: $uri\r\n")
              head.append("Content-Type: text/plain\r\n")
                .append(s"Content-Length: ${payload.length}\r\n\r\n")
              if (perRecordGzip) {
                // one gzip member per record (Common Crawl layout:
                // record-level random access for consumers). close(),
                // not just finish(): close releases the member's native
                // Deflater immediately (finish alone leaves one Deflater
                // per RECORD to the GC — native-memory pressure at shard
                // scale); the close shield keeps the FS stream open
                val gz = new org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream(
                  org.apache.commons.io.output.CloseShieldOutputStream.wrap(out))
                gz.write(head.toString.getBytes("UTF-8"))
                gz.write(payload)
                gz.write("\r\n\r\n".getBytes("UTF-8"))
                gz.close()
              } else {
                out.write(head.toString.getBytes("UTF-8"))
                out.write(payload)
                out.write("\r\n\r\n".getBytes("UTF-8"))
              }
              nRecords += 1
              nBytes += payload.length
            }
            close()
          } finally if (out != null) out.close()
          shards.iterator
        }
      }
      .collect()

    spark.createDataFrame(manifest.toSeq)
      .toDF("shard_path", "n_records", "record_bytes")
  }

  /** The crawl-to-corpus projection: `response` (full WARC) and
    * `conversion` (WET) records as one text row each —
    * `(warc_path, record_index, url, warc_date, text)` — with HTML
    * responses (per the HTTP Content-Type parsed off the payload)
    * stripped via [[graft.operators.Web.stripHtml]] and WET/plain text
    * passed through. The step before every §2.4 text operator. */
  def warcToText(records: DataFrame): DataFrame = {
    val text = col("body").cast("string")
    val isHtml = col("record_type") === "response" &&
      lower(coalesce(col("http_content_type"), lit(""))).contains("html")
    records
      .filter(col("record_type").isin("response", "conversion"))
      .select(
        col("warc_path"), col("record_index"),
        col("target_uri").as("url"), col("warc_date"),
        when(isHtml, graft.operators.Web.stripHtml(text))
          .otherwise(text).as("text"))
  }
}
