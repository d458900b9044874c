package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import graft.operators.{DocExtract, Web}

object DocExtractSpec {
  // local[32] runs tasks in this JVM, so statics see every partition
  val constructed = new AtomicInteger(0)
  val disposed = new AtomicInteger(0)
}

class DocExtractSpec extends SparkSpec {
  import spark.implicits._

  test("sniff: magic bytes, never extension") {
    assert(DocExtract.sniff("{\\rtf1 hi}".getBytes) === "rtf")
    assert(DocExtract.sniff("%PDF-1.7 x".getBytes) === "pdf")
    assert(DocExtract.sniff("<html><p>x".getBytes) === "html")
    assert(DocExtract.sniff("<!DOCTYPE html><p>x".getBytes) === "html")
    assert(DocExtract.sniff("  \n<HTML>x".getBytes) === "html")
    assert(DocExtract.sniff("just words".getBytes) === "txt")
    assert(DocExtract.sniff("unicode é ok".getBytes("UTF-8")) === "txt")
    assert(DocExtract.sniff(Array[Byte](0x50, 0x4b, 0x00, 0x01)) === "bin") // NUL
    assert(DocExtract.sniff(Array[Byte](0xff.toByte, 0xfe.toByte, 0x41)) === "bin")
  }

  test("sniff: UTF-8 BOM is transparent — BOM-prefixed HTML is html, not txt") {
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    assert(DocExtract.sniff(bom ++ "<html><p>x</p></html>".getBytes("UTF-8")) === "html")
    assert(DocExtract.sniff(bom ++ "plain".getBytes("UTF-8")) === "txt")
  }

  test("rtfToText: truncated or junk hex escapes are dropped, never a crash") {
    // the bad escape marker drops; trailing chars stay as literal text
    assert(DocExtract.rtfToText("{\\rtf1 ok\\'a") === "oka")
    assert(DocExtract.rtfToText("{\\rtf1 a\\'zqb}") === "azqb")
  }

  test("htmlToText equals the Web.stripHtml Column pass, byte for byte") {
    val fixtures = Seq(
      "<html><head><script>var x=1;</script><style>p{}</style></head>" +
        "<body><!-- c --><p>Hello &amp; goodbye &lt;tag&gt;</p></body></html>",
      "no tags at all",
      "<p>unclosed",
      "a &nbsp; b &quot;q&quot; &#39;s&#39;")
    val viaColumn = fixtures.toDF("h")
      .select(Web.stripHtml(col("h"))).as[String].collect()
    val viaJvm = fixtures.map(DocExtract.htmlToText)
    assert(viaJvm === viaColumn.toSeq)
  }

  test("rtfToText: common-subset control words, destinations, escapes") {
    // destination groups skipped whole; \par -> newline; \tab -> tab
    assert(DocExtract.rtfToText(
      """{\rtf1\ansi{\fonttbl{\f0 Arial;}}\f0 hello\par world\tab end}""") ===
      "hello\nworld\tend")
    // hex and unicode escapes; \uN consumes one fallback char
    assert(DocExtract.rtfToText(
      "{\\rtf1 caf\\'e9 \\" + "u8364?!}") === "café €!")
    // literal braces and backslash
    assert(DocExtract.rtfToText("""{\rtf1 a\{b\}c\\d}""") === "a{b}c\\d")
    // {\* groups skipped; raw newlines are not content
    assert(DocExtract.rtfToText("{\\rtf1 {\\*\\generator X}one\ntwo}") === "onetwo")
    // nested skipped groups do not resurrect content
    assert(DocExtract.rtfToText(
      """{\rtf1{\info{\title Secret}}visible}""") === "visible")
  }

  test("extractText: builtins, NULL payloads, unhandled formats -> NULL text") {
    val rows = Seq(
      (1L, "plain body".getBytes("UTF-8")),
      (2L, "<html><p>web &amp; text</p></html>".getBytes("UTF-8")),
      (3L, """{\rtf1 rtf body\par two}""".getBytes("UTF-8")),
      (4L, "%PDF-1.4 whatever".getBytes("UTF-8")),
      (5L, null)
    ).toDF("doc_id", "payload")
    val out = DocExtract.extractText(rows, "payload")
      .select(col("doc_id"), col("doc_format"),
        trim(regexp_replace(col("text"), "\\s+", " ")).as("t"), col("n_chars"))
      .as[(Long, String, Option[String], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === (("txt", Some("plain body"))))
    assert(out(2L) === (("html", Some("web & text"))))
    assert(out(3L) === (("rtf", Some("rtf body two"))))
    assert(out(4L) === (("pdf", None))) // builtins don't fake PDFs
    assert(out(5L) === (("bin", None)))
  }

  test("seam: a chained deployment extractor takes PDFs; per-partition lifecycle") {
    DocExtractSpec.constructed.set(0)
    DocExtractSpec.disposed.set(0)
    val fakePdf: () => DocExtract.DocExtractor = () => {
      DocExtractSpec.constructed.incrementAndGet()
      new DocExtract.DocExtractor {
        def extract(payload: Array[Byte], format: String): Option[String] =
          if (format == "pdf") Some(s"pdf:${payload.length}") else None
        override def dispose(): Unit = {
          DocExtractSpec.disposed.incrementAndGet(); ()
        }
      }
    }
    val rows = Seq(
      (1L, "%PDF-1.4 xxxx".getBytes("UTF-8")),
      (2L, "plain".getBytes("UTF-8"))
    ).toDF("doc_id", "payload").repartition(2)
    val out = DocExtract.extractText(rows, "payload",
        factory = DocExtract.chain(fakePdf, DocExtract.Builtins))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "pdf:13")
    assert(out(2L) === "plain")
    // one extractor per non-empty partition, each disposed
    assert(DocExtractSpec.constructed.get() === DocExtractSpec.disposed.get())
    assert(DocExtractSpec.constructed.get() >= 1)
  }

  test("guards: output column collisions fail loudly") {
    val df = Seq((1L, "x".getBytes)).toDF("doc_id", "payload")
    intercept[IllegalArgumentException] {
      DocExtract.extractText(df.withColumn("text", lit("t")), "payload")
    }
  }
}
