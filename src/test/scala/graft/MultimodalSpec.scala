package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{DecodedMedia, MediaRecord}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val jpegHeader = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 1, 2)
  private val pngHeader = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10)

  test("withMetadata: byte length, magic hex, md5, sniffed format") {
    val df = Seq(
      (1L, jpegHeader),
      (2L, pngHeader),
      (3L, "plain text".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val meta = Multimodal.withMetadata(df, "payload")
      .select("doc_id", "byte_len", "magic_hex", "format")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    assert(meta(1L) == ((6L, "FFD8FFE0", "jpeg")))
    assert(meta(2L)._3 == "png")
    assert(meta(3L)._3 == "unknown")
    assert(meta(3L)._1 == 10L)
  }

  test("sampleFrames: one media row explodes to n deterministic frame rows") {
    val media = Seq(MediaRecord(1L, jpegHeader), MediaRecord(2L, pngHeader)).toDS()
    val frames = Multimodal.sampleFrames(media, 3).collect()
    assert(frames.length == 6)
    assert(frames.map(f => (f.doc_id, f.frame_idx)).toSet ==
      (for (d <- 1L to 2L; i <- 0 until 3) yield (d, i)).toSet)
    // content derives from payload and index — distinct across both
    assert(frames.map(_.frame.toSeq).distinct.length == 6)
  }

  test("resize: deterministic content-derived payload, schema preserved") {
    val media = Seq(MediaRecord(1L, jpegHeader)).toDS()
    val r1 = Multimodal.resize(media, 64, 64).head
    val r2 = Multimodal.resize(media, 64, 64).head
    val other = Multimodal.resize(media, 32, 32).head
    assert(r1.doc_id == 1L && r1.payload.toSeq == r2.payload.toSeq)
    assert(r1.payload.toSeq != other.payload.toSeq) // dims change content
  }

  test("decodeFeatures: deterministic stub, real schema, partition batching") {
    val media = (1L to 100L)
      .map(i => MediaRecord(i, s"payload-$i".getBytes("UTF-8")))
      .toDS().repartition(3)
    val out: Seq[DecodedMedia] =
      Multimodal.decodeFeatures(media, featureDim = 8, batchSize = 16)
        .collect().toSeq
    assert(out.length == 100)
    assert(out.forall(_.features.length == 8))
    assert(out.forall(d => d.width >= 1 && d.width <= 64))
    // deterministic: re-running yields identical features per doc
    val again = Multimodal.decodeFeatures(media, featureDim = 8, batchSize = 16)
      .collect().map(d => d.doc_id -> d.features.toSeq).toMap
    out.foreach(d => assert(again(d.doc_id) == d.features.toSeq))
    // distinct payloads get distinct features (content-derived, not constant)
    assert(out.map(_.features.toSeq).distinct.size > 90)
  }
}
