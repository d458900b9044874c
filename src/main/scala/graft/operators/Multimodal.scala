package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column plumbing.
 *
 * Media payloads are opaque `binary` columns with typed metadata alongside
 * — the columnar layout a 100 TB multimodal corpus needs (parquet stores
 * the bytes inline per row group; column pruning skips them entirely when
 * a query only touches metadata).
 *
 * Metadata extraction is pure Catalyst expressions. Decoding is a
 * batched per-partition stage ([[decodeFeatures]]) whose actual
 * decode step is STUBBED with a deterministic fake — no image/audio codec
 * ships in this environment — while the Spark-side contract (schema,
 * batching, partition-parallel execution, typed encoders) is real and
 * tested.
 */
object Multimodal {

  /** A media row: opaque payload plus its id. */
  final case class MediaRecord(doc_id: Long, payload: Array[Byte])

  /** Decoded (stub) features: fixed-width embedding + fake dimensions. */
  final case class DecodedMedia(
    doc_id: Long,
    width: Int,
    height: Int,
    features: Array[Float]
  )

  /** Hex magic numbers of common containers, for expression-level sniffing. */
  val MagicPrefixes: Map[String, String] = Map(
    "FFD8FF" -> "jpeg",
    "89504E47" -> "png",
    "47494638" -> "gif",
    "25504446" -> "pdf",
    "494433" -> "mp3",
    "52494646" -> "riff" // wav/avi
  )

  /** First 8 hex chars of a payload: hex only the first 4 BYTES — hexing
    * the whole blob would materialize a 2×-payload string per row (ruinous
    * for multi-MB media payloads) just to keep 8 chars. */
  private def magicHex(bin: Column): Column =
    upper(hex(substring(bin, 1, 4)))

  /** First-bytes container sniff over a binary column (hex-prefix match). */
  def sniffFormat(bin: Column): Column = {
    val hexHead = magicHex(bin)
    MagicPrefixes.foldLeft(lit("unknown")) { case (acc, (prefix, name)) =>
      when(hexHead.startsWith(prefix), lit(name)).otherwise(acc)
    }
  }

  /**
   * Expression-level metadata for a binary payload column: byte length,
   * leading magic bytes (hex), MD5 content hash, sniffed format. Pure
   * projection — runs inside the scan, no shuffle, payload column is
   * never moved beyond the executor that read it.
   */
  def withMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumns(Map(
      "byte_len" -> length(col(binCol)).cast("long"),
      "magic_hex" -> magicHex(col(binCol)),
      "payload_md5" -> md5(col(binCol)),
      "format" -> sniffFormat(col(binCol))
    ))

  /** One sampled frame of a media payload. */
  final case class FrameRecord(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /**
   * Batched resize over media payloads.
   *
   * The pixel work is a STUB (no codec in this environment): the resized
   * payload is deterministically derived as UTF-8 of
   * "md5hex(payload):<w>x<h>", so the oracle can re-derive it. The Spark
   * shape is real: typed Dataset in/out, per-partition init amortizing
   * codec setup, payload never leaves its executor.
   */
  /** Lowercase md5 hex of a payload — the stub content derivation shared
    * by resize and sampleFrames; the DuckDB oracle formulas in LlmGates
    * mirror this exact encoding. */
  private def md5Hex(digest: java.security.MessageDigest, payload: Array[Byte]): String =
    digest.digest(payload).map(b => f"$b%02x").mkString

  def resize(
    media: Dataset[MediaRecord],
    width: Int,
    height: Int
  ): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { rec =>
        // >>> STUB RESIZE <<< a real deployment decodes + scales here
        val hex = md5Hex(digest, rec.payload)
        MediaRecord(rec.doc_id, s"$hex:${width}x$height".getBytes("UTF-8"))
      }
    }
  }

  /**
   * Frame sampling: one media row explodes into `n` frame rows — the
   * 1→N row shape (and its shuffle-free, partition-local execution) is
   * the real contract; frame content is a deterministic STUB
   * ("md5hex(payload):<idx>" as UTF-8) standing in for decoded frames.
   */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[FrameRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { rec =>
        // >>> STUB FRAME DECODE <<< a real deployment seeks + decodes here
        val hex = md5Hex(digest, rec.payload)
        (0 until n).iterator.map(i =>
          FrameRecord(rec.doc_id, i, s"$hex:$i".getBytes("UTF-8")))
      }
    }
  }

  /**
   * Batched decode + feature extraction over media payloads.
   *
   * The decode step is a STUB: a real deployment would decode the image /
   * resample the audio here with a codec library; this environment has
   * none, so features are derived deterministically from the payload's
   * MD5 bytes. Everything around the stub is the real scale shape:
   * typed Dataset in/out, per-partition batching (amortizes codec init,
   * the expensive part of real decoders), no driver involvement.
   */
  def decodeFeatures(
    media: Dataset[MediaRecord],
    featureDim: Int = 8,
    batchSize: Int = 64
  ): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init — stands in for codec/model initialization
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { rec =>
          // >>> STUB DECODE <<< deterministic fake in place of a codec:
          val h = digest.digest(rec.payload)
          val feats = Array.tabulate(featureDim)(i => (h(i % h.length) & 0xff) / 255.0f)
          DecodedMedia(
            rec.doc_id,
            width = ((h(0) & 0xff) % 64) + 1,
            height = ((h(1) & 0xff) % 64) + 1,
            features = feats
          )
        }
      }
    }
  }
}
