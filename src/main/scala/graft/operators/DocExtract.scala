package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/**
 * Document-format text extraction behind a pluggable per-partition seam
 * — the non-HTML half of corpus ingestion (office docs, PDFs, ebooks
 * arriving as opaque bytes), built on the [[Multimodal.FrameDecoder]]
 * pattern: extractors are constructed per PARTITION via a factory
 * (never serialized, may hold non-serializable parser state), run
 * executor-side in `mapPartitions` (format parsers are JVM libraries,
 * not Catalyst expressions — the documented Multimodal carve-out), and
 * `dispose()` on partition exhaustion.
 *
 * Built-ins cover the formats the JDK parses deterministically with no
 * added dependency: plain text (UTF-8), HTML (the exact
 * [[Web.stripHtml]] semantics, spec-pinned equal to the Column
 * version), and a common-subset RTF reader. Heavier formats ride the
 * seam from deployment code — e.g. PDF via the public Apache PDFBox:
 *
 * {{{
 * val pdf = () => new DocExtract.DocExtractor {
 *   def extract(payload: Array[Byte], format: String): Option[String] =
 *     if (format != "pdf") None
 *     else Some(new PDFTextStripper().getText(PDDocument.load(payload)))
 * }
 * DocExtract.extractText(df, "bytes", factory = DocExtract.chain(pdf,
 *   DocExtract.Builtins))
 * }}}
 *
 * Scale shape: a pure per-row projection — no shuffle, runs unchanged
 * over `readStream` micro-batches; formats are sniffed from MAGIC
 * BYTES (never file extension), so one corpus column can mix formats.
 */
object DocExtract {

  /**
   * The extraction seam. `extract` returns `Some(text)` when this
   * extractor handles the payload, `None` to pass to the next in a
   * [[chain]] (unhandled rows surface with NULL text — loud in any
   * downstream non-null check, never a crash). `format` is the sniffed
   * tag ("txt" | "html" | "rtf" | "pdf" | "bin") so an extractor can
   * dispatch without re-sniffing.
   */
  trait DocExtractor {
    def extract(payload: Array[Byte], format: String): Option[String]
    def dispose(): Unit = ()
  }

  /** Magic-byte format sniff (extension-independent, like
    * [[graft.sources.Archives]] codec sniffing). */
  private[graft] def sniff(b: Array[Byte]): String = {
    // UTF-8 BOM (EF BB BF) is transparent to the sniff: a BOM-prefixed
    // HTML page must still classify html (in the ISO-8859-1 head view a
    // BOM reads as 'ï»¿', which no char-level trim catches)
    val off =
      if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
        (b(2) & 0xff) == 0xbf) 3
      else 0
    def startsWith(prefix: String): Boolean = {
      val p = prefix.getBytes("ISO-8859-1")
      b.length - off >= p.length && java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(b, off, off + p.length), p)
    }
    val head = new String(b, off, math.min(b.length - off, 256),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val headTrim = head.dropWhile(c => c == ' ' || c == '\t' || c == '\r' ||
      c == '\n')
    if (startsWith("{\\rtf")) "rtf"
    else if (startsWith("%PDF")) "pdf"
    else if (headTrim.take(64).toLowerCase(java.util.Locale.ROOT)
      .matches("(?s)(<!doctype html|<html).*")) "html"
    else if (isUtf8Text(b)) "txt"
    else "bin"
  }

  /** Valid UTF-8 with no NUL — the plain-text predicate. */
  private def isUtf8Text(b: Array[Byte]): Boolean = {
    if (b.exists(_ == 0)) return false
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try { dec.decode(java.nio.ByteBuffer.wrap(b)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }

  /** JVM-side [[Web.stripHtml]] — the SAME regex passes and entity
    * table, so the seam's HTML arm and the Column operator agree
    * byte-for-byte (DocExtractSpec pins it). */
  private[graft] def htmlToText(s: String): String = {
    val noScript = s.replaceAll("(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = noScript.replaceAll("(?is)<style[^>]*>.*?</style>", " ")
    val noComment = noStyle.replaceAll("(?s)<!--.*?-->", " ")
    val noTags = noComment.replaceAll("<[/!]?[a-zA-Z][^>]*>", " ")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (from, to)) => acc.replace(from, to) }
  }

  /**
   * Common-subset RTF text extraction (RTF is a public Microsoft spec;
   * this reads the subset every writer emits): group braces tracked,
   * known non-content destinations (`fonttbl`, `colortbl`,
   * `stylesheet`, `info`, `pict`, and every `{\*` group) skipped
   * whole, `\par`/`\line` → newline, `\tab` → tab, `\'hh` hex and
   * `\uN` unicode escapes decoded (with the standard skip-one
   * fallback), escaped `\\ \{ \}` unescaped, all other control words
   * dropped.
   */
  private[graft] def rtfToText(s: String): String = {
    val skipDests = Set("fonttbl", "colortbl", "stylesheet", "info", "pict")
    val out = new java.lang.StringBuilder
    var i = 0
    var skipDepth = 0 // >0: inside a skipped destination group
    var depth = 0
    val skipStack = scala.collection.mutable.ArrayDeque.empty[Int]
    while (i < s.length) {
      s.charAt(i) match {
        case '{' =>
          depth += 1
          // destination lookahead: {\* or {\destword
          val rest = s.substring(i + 1, math.min(s.length, i + 16))
          val isStar = rest.startsWith("\\*")
          val destWord = if (rest.startsWith("\\"))
            rest.drop(1).takeWhile(_.isLetter) else ""
          if (skipDepth == 0 && (isStar || skipDests(destWord))) {
            skipDepth = depth
            skipStack.append(depth)
          }
          i += 1
        case '}' =>
          if (skipDepth == depth) {
            skipStack.removeLastOption()
            skipDepth = skipStack.lastOption.getOrElse(0)
          }
          depth -= 1
          i += 1
        case '\\' if i + 1 < s.length =>
          val c = s.charAt(i + 1)
          if (c == '\\' || c == '{' || c == '}') {
            if (skipDepth == 0) out.append(c)
            i += 2
          } else if (c == '\'') {
            // \'hh needs two hex digits; a truncated or junk escape is
            // DROPPED, not a crash (the seam's junk-input contract)
            val ok = i + 4 <= s.length &&
              Character.digit(s.charAt(i + 2), 16) >= 0 &&
              Character.digit(s.charAt(i + 3), 16) >= 0
            if (ok) {
              if (skipDepth == 0)
                out.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar)
              i += 4
            } else i += 2 // drop the bad escape marker, keep scanning
          } else if (c.isLetter) {
            var j = i + 1
            while (j < s.length && s.charAt(j).isLetter) j += 1
            val word = s.substring(i + 1, j)
            var k = j
            if (k < s.length && (s.charAt(k) == '-' || s.charAt(k).isDigit)) {
              k += 1
              while (k < s.length && s.charAt(k).isDigit) k += 1
            }
            val param = s.substring(j, k)
            if (k < s.length && s.charAt(k) == ' ') k += 1 // delimiter space
            if (skipDepth == 0) word match {
              case "par" | "line" => out.append('\n')
              case "tab" => out.append('\t')
              case "u" =>
                // \uN: signed 16-bit code unit, then ONE fallback char
                // to skip (spec default \uc1)
                out.append(((param.toInt + 65536) % 65536).toChar)
                if (k < s.length && s.charAt(k) != '\\' &&
                  s.charAt(k) != '{' && s.charAt(k) != '}') k += 1
              case _ => ()
            } else if (word == "u") {
              // skipped groups still consume the fallback char
              if (k < s.length && s.charAt(k) != '\\' &&
                s.charAt(k) != '{' && s.charAt(k) != '}') k += 1
            }
            i = k
          } else i += 2 // \~ \- etc: drop
        case '\r' | '\n' => i += 1 // raw newlines are not content in RTF
        case ch =>
          if (skipDepth == 0) out.append(ch)
          i += 1
      }
    }
    out.toString
  }

  /** The built-in deterministic extractor: txt passthrough, html via
    * [[htmlToText]], rtf via [[rtfToText]]; pdf/bin unhandled (None →
    * NULL text unless a chained extractor takes them). */
  val Builtins: () => DocExtractor = () =>
    new DocExtractor {
      def extract(payload: Array[Byte], format: String): Option[String] =
        format match {
          case "txt" => Some(new String(payload, "UTF-8"))
          case "html" => Some(htmlToText(new String(payload, "UTF-8")))
          case "rtf" => Some(rtfToText(new String(payload, "ISO-8859-1")))
          case _ => None
        }
    }

  /** First-Some chain of extractors; `dispose` runs on every link. */
  def chain(factories: (() => DocExtractor)*): () => DocExtractor = () => {
    val links = factories.map(_())
    new DocExtractor {
      def extract(payload: Array[Byte], format: String): Option[String] =
        links.iterator.map(_.extract(payload, format)).collectFirst {
          case Some(t) => t
        }
      override def dispose(): Unit = links.foreach(_.dispose())
    }
  }

  /**
   * Extract text from a binary document column: adds `doc_format` (the
   * magic-byte sniff), `text` (NULL when no extractor handles the
   * format — count them with [[Checks.NonNullRate]]), and `n_chars`.
   * NULL payloads yield NULL text with format "bin".
   */
  def extractText(
    df: DataFrame,
    bytesCol: String,
    factory: () => DocExtractor = Builtins,
    formatCol: String = "doc_format",
    textCol: String = "text",
    nCharsCol: String = "n_chars"
  ): DataFrame = {
    Cols.requireAbsent(df, formatCol, textCol, nCharsCol)
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(formatCol, StringType, nullable = false),
      StructField(textCol, StringType, nullable = true),
      StructField(nCharsCol, LongType, nullable = true)))
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { it =>
      val ex = factory()
      val mapped = it.map { row =>
        val payload = row.get(bytesIdx) match {
          case null => null
          case b: Array[Byte] => b
          case other => throw new IllegalArgumentException(
            s"extractText: '$bytesCol' must be BINARY, got ${other.getClass}")
        }
        val (fmt, text) =
          if (payload == null) ("bin", None)
          else {
            val f = sniff(payload)
            (f, ex.extract(payload, f))
          }
        org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq(
          fmt, text.orNull, text.map(_.length.toLong).orNull))
      }
      // dispose on exhaustion (the FrameDecoder convention)
      new Iterator[org.apache.spark.sql.Row] {
        def hasNext: Boolean = {
          val h = mapped.hasNext
          if (!h) ex.dispose()
          h
        }
        def next(): org.apache.spark.sql.Row = mapped.next()
      }
    }(enc)
  }
}
