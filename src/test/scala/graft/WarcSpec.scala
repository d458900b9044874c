package graft

import java.io.ByteArrayInputStream
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Warc

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(
    rtype: String, uri: String, ctype: String, payload: Array[Byte]
  ): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $rtype\r\n")
    sb.append("WARC-Record-ID: <urn:uuid:x>\r\n")
    if (uri != null) sb.append(s"WARC-Target-URI: $uri\r\n")
    sb.append(s"Content-Type: $ctype\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
    sb.toString.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("parseAll: http response split, status, content-type, WET passthrough") {
    val html = "<p>hi</p>"
    val http = ("HTTP/1.1 301 Moved\r\nLocation: /x\r\n" +
      "Content-Type: text/html\r\n\r\n" + html).getBytes("UTF-8")
    val bytes = rec("response", "http://a/", "application/http; msgtype=response", http) ++
      rec("conversion", "http://b/", "text/plain", "plain text".getBytes("UTF-8"))
    val out = Warc.parseAll(new ByteArrayInputStream(bytes), "f.warc", 1L << 20)
    assert(out.length === 2)
    assert(out(0).recordIndex === 0L && out(0).recordType === "response")
    assert(out(0).httpStatus === 301)
    assert(out(0).httpContentType === "text/html")
    assert(new String(out(0).body, "UTF-8") === html)
    assert(new String(out(0).payload, "UTF-8").startsWith("HTTP/1.1 301"))
    assert(out(1).httpStatus === null)
    assert(new String(out(1).body, "UTF-8") === "plain text")
  }

  test("parseAll: http payload with no CRLFCRLF keeps full payload as body") {
    val http = "HTTP/1.1 200 OK\r\nTruncated: yes".getBytes("UTF-8")
    val out = Warc.parseAll(new ByteArrayInputStream(
      rec("response", "http://a/", "application/http", http)), "f.warc", 1L << 20)
    assert(out.head.httpStatus === 200)
    assert(out.head.body === out.head.payload)
  }

  test("parseAll guards: truncation, missing Content-Length, non-WARC, cap") {
    val good = rec("conversion", "http://a/", "text/plain", "x".getBytes)
    // truncated payload
    val cut = good.dropRight(4) // drop the record separator AND the payload byte's slack
    intercept[Exception] {
      Warc.parseAll(new ByteArrayInputStream(cut.dropRight(1)), "t.warc", 1L << 20)
    }
    // missing Content-Length
    val noLen = ("WARC/1.0\r\nWARC-Type: metadata\r\n\r\n").getBytes("UTF-8")
    val e = intercept[IllegalStateException] {
      Warc.parseAll(new ByteArrayInputStream(noLen), "t.warc", 1L << 20)
    }
    assert(e.getMessage.contains("Content-Length"))
    // garbage instead of a version line
    val e2 = intercept[IllegalStateException] {
      Warc.parseAll(new ByteArrayInputStream("hello world\r\n".getBytes), "t.warc", 1L << 20)
    }
    assert(e2.getMessage.contains("WARC/"))
    // negative Content-Length: named error, not NegativeArraySizeException
    val neg = ("WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: -1\r\n\r\n").getBytes("UTF-8")
    val e4 = intercept[IllegalArgumentException] {
      Warc.parseAll(new ByteArrayInputStream(neg), "t.warc", 1L << 20)
    }
    assert(e4.getMessage.contains("negative Content-Length"))
    // decompressed cap
    val e3 = intercept[IllegalStateException] {
      Warc.parseAll(new ByteArrayInputStream(good ++ good), "t.warc", 1L)
    }
    assert(e3.getMessage.contains("maxDecompressedBytes"))
  }

  test("readWarc: whole-file gzip reads the same as plain") {
    val dir = Files.createTempDirectory("warc-gz")
    val bytes = rec("conversion", "http://a/", "text/plain", "alpha".getBytes) ++
      rec("conversion", "http://b/", "text/plain", "beta".getBytes)
    Files.write(dir.resolve("p.warc"), bytes)
    val gz = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(gz)
    g.write(bytes); g.close()
    Files.write(dir.resolve("g.warc.gz"), gz.toByteArray)
    val out = Warc.readWarc(spark, s"$dir/*")
      .select(regexp_extract(col("warc_path"), "[^/]+$", 0), col("record_index"),
        col("body").cast("string"))
      .as[(String, Long, String)].collect().toSet
    assert(out === Set(
      ("p.warc", 0L, "alpha"), ("p.warc", 1L, "beta"),
      ("g.warc.gz", 0L, "alpha"), ("g.warc.gz", 1L, "beta")))
  }

  test("warcToText: html stripped for html responses only, conversion passthrough") {
    val dir = Files.createTempDirectory("warc-text")
    val htmlResp = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><b>bold</b> move</html>").getBytes("UTF-8")
    val jsonResp = ("HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n" +
      """{"a":"<tag>"}""").getBytes("UTF-8")
    val bytes = rec("response", "http://h/", "application/http; msgtype=response", htmlResp) ++
      rec("response", "http://j/", "application/http; msgtype=response", jsonResp) ++
      rec("conversion", "http://w/", "text/plain", "wet <keep> text".getBytes("UTF-8")) ++
      rec("warcinfo", null, "application/warc-fields", "k: v\r\n".getBytes("UTF-8"))
    Files.write(dir.resolve("m.warc"), bytes)
    val out = Warc.warcToText(Warc.readWarc(spark, s"$dir/m.warc"))
      .select(col("url"), trim(regexp_replace(col("text"), "\\s+", " ")))
      .as[(String, String)].collect().toMap
    // warcinfo filtered; html stripped; json NOT stripped; wet untouched
    assert(out === Map(
      "http://h/" -> "bold move",
      "http://j/" -> """{"a":"<tag>"}""",
      "http://w/" -> "wet <keep> text"))
  }

  test("writeWarcShards: roundtrip, rolling, deterministic ids, stale cleanup") {
    val out = Files.createTempDirectory("warc-sink").toString
    val docs = (1 to 50).map(i => (s"http://d/$i", s"text of doc $i " + ("x" * 100)))
      .toDF("url", "text").repartition(3)
    val m1 = Warc.writeWarcShards(docs, out, maxShardBytes = 1000)
      .collect()
    assert(m1.length > 3, "rolling never triggered")
    val back = Warc.readWarc(spark, s"$out/part-*")
      .select(col("target_uri"), col("record_type"), col("record_id"),
        col("body").cast("string"))
      .as[(String, String, String, String)].collect()
    assert(back.length === 50)
    assert(back.forall(_._2 === "conversion"))
    assert(back.map(r => r._1 -> r._4).toMap ===
      (1 to 50).map(i => s"http://d/$i" -> (s"text of doc $i " + ("x" * 100))).toMap)
    // record ids are content-derived (urn:md5), so a REWRITE into the
    // same dir produces the same ids and no duplicate shards linger
    val ids1 = back.map(_._3).sorted
    val m2 = Warc.writeWarcShards(docs, out, maxShardBytes = 1000).collect()
    assert(m2.length === m1.length)
    val again = Warc.readWarc(spark, s"$out/part-*")
      .select(col("record_id")).as[String].collect().sorted
    assert(again === ids1)
  }

  test("writeWarcShards: whole-shard gzip arm round-trips identically") {
    val out = Files.createTempDirectory("warc-sink-wg").toString
    val docs = (1 to 30).map(i => (s"http://w/$i", s"doc $i body"))
      .toDF("url", "text").repartition(2)
    Warc.writeWarcShards(docs, out, maxShardBytes = 500, perRecordGzip = false)
    val back = Warc.readWarc(spark, s"$out/part-*")
      .select(col("target_uri"), col("body").cast("string"))
      .as[(String, String)].collect().toMap
    assert(back === (1 to 30).map(i => s"http://w/$i" -> s"doc $i body").toMap)
  }

  test("readWarc guards: bad maxDecompressedBytes") {
    intercept[IllegalArgumentException] {
      Warc.readWarc(spark, "/tmp/none", maxDecompressedBytes = 0)
    }
  }
}
