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
 * Metadata extraction is pure Catalyst expressions. Decode / resize are
 * batched per-partition stages: payloads carrying a JDK-decodable image
 * format (PNG/JPEG/GIF/BMP via `javax.imageio`) get REAL pixel work —
 * actual decode → per-band luminance features ([[decodeFeatures]]) and
 * actual nearest-neighbor rescale → PNG re-encode ([[resize]]) — with
 * per-partition [[ImageDecoder]] reader reuse amortizing codec setup.
 * Undecodable payloads (non-image bytes, truncated images) fall back to a
 * deterministic MD5-derived stub, which doubles as the DuckDB-oracle
 * branch for the text fixtures. [[sampleFrames]] does REAL multi-frame
 * decode for animated GIF via [[GifFrames]] (the one animated format the
 * JDK reads); audio/video codecs don't ship in the JDK, so other A/V
 * formats keep the stub content under the real 1→N shape behind the
 * [[FrameDecoder]] seam.
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

  // ---------------------------------------------------- real pixel work

  /** Leading-bytes sniff for the JDK-decodable image formats. Byte-level
    * (no hex string materialized) because it runs per row in the decode
    * hot path; a payload that matches but fails to decode (truncated,
    * magic-colliding text) still falls back to the stub. */
  private def imageFormat(payload: Array[Byte]): Option[String] = {
    def at(i: Int, b: Int): Boolean = payload(i) == b.toByte
    if (payload.length < 4) None
    else if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) Some("png")
    else if (at(0, 0xff) && at(1, 0xd8) && at(2, 0xff)) Some("jpeg")
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8')) Some("gif")
    else if (at(0, 'B') && at(1, 'M')) Some("bmp")
    else None
  }

  /**
   * Per-partition image decoder: one `javax.imageio.ImageReader` per
   * format, reused across every row the partition decodes — reader
   * construction (registry scan + plugin init) is the fixed cost
   * `ImageIO.read` would otherwise pay per row. Instantiated inside
   * `mapPartitions`, never serialized (readers aren't Serializable).
   */
  private final class ImageDecoder {
    javax.imageio.ImageIO.setUseCache(false) // in-memory streams; no temp-file churn
    private val readers =
      scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]

    private def readerFor(fmt: String): Option[javax.imageio.ImageReader] =
      readers.get(fmt).orElse {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        if (!it.hasNext) None
        else {
          val r = it.next()
          readers(fmt) = r
          Some(r)
        }
      }

    /** Decode a payload, or None if it isn't a (valid) JDK-readable image. */
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      for {
        fmt <- imageFormat(payload)
        reader <- readerFor(fmt)
        img <- try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          try {
            reader.setInput(iis, true, true)
            Option(reader.read(0))
          } finally iis.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      } yield img

    /** Release reader-held native/buffer resources. Idempotent — safe to
      * call from an exhaustion hook that may fire more than once. */
    def dispose(): Unit = {
      readers.valuesIterator.foreach(_.dispose())
      readers.clear()
    }
  }

  /** Run `cleanup` when `it` reports exhaustion — how per-partition
    * decoder state is released without relying on GC (ImageReaders hold
    * codec buffers; thousands of short partitions would otherwise
    * accumulate them until a collection happens to run). Rows that never
    * drain the iterator (task kill) still fall back to GC, which is the
    * JVM's own backstop for abandoned readers. */
  private def onExhaustion[T](it: Iterator[T])(cleanup: () => Unit): Iterator[T] =
    new Iterator[T] {
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) cleanup()
        h
      }
      override def next(): T = it.next()
    }

  /**
   * Pixel features of a decoded image: `dim` horizontal bands, each the
   * mean luminance (r+g+b over 3·255, in [0,1]) of its rows. Integer
   * pixel sums + one double division per band, so the POST-DECODE math is
   * bit-deterministic across partitionings and JVMs; end-to-end
   * determinism additionally requires the codec to be (PNG/BMP/GIF are
   * lossless everywhere; JPEG output can differ across JDK vendors'
   * decoders). Alpha is IGNORED — translucent pixels contribute their
   * raw RGB, not a composited value. Bands past the image height
   * (height < dim) are 0.
   */
  private def bandLuminance(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    Array.tabulate(dim) { i =>
      val r0 = (i.toLong * h / dim).toInt
      val r1 = ((i + 1).toLong * h / dim).toInt
      if (r1 <= r0 || w == 0) 0.0f
      else {
        var sum = 0L
        var y = r0
        while (y < r1) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        (sum.toDouble / (3.0 * 255.0 * w * (r1 - r0))).toFloat
      }
    }
  }

  /** Nearest-neighbor rescale: target pixel (x, y) copies source pixel
    * (x·sw/w, y·sh/h). Pure integer sampling — chosen over Graphics2D
    * interpolation because it is exactly reproducible everywhere. The
    * output is TYPE_INT_RGB: alpha is DROPPED, with translucent source
    * pixels keeping their raw (un-composited) RGB — a deliberate
    * semantic choice that keeps resize a pure pixel copy. */
  private def nearestResize(
    img: java.awt.image.BufferedImage,
    w: Int,
    h: Int
  ): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val sw = img.getWidth.toLong
    val sh = img.getHeight.toLong
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out.setRGB(x, y, img.getRGB((x * sw / w).toInt, (y * sh / h).toInt))
        x += 1
      }
      y += 1
    }
    out
  }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Lowercase md5 hex of a payload — the stub content derivation shared
    * by resize and sampleFrames; the DuckDB oracle formulas in LlmGates
    * mirror this exact encoding. */
  private def md5Hex(digest: java.security.MessageDigest, payload: Array[Byte]): String =
    digest.digest(payload).map(b => f"$b%02x").mkString

  /**
   * Batched resize over media payloads.
   *
   * Image payloads (PNG/JPEG/GIF/BMP) get a REAL rescale: decode via the
   * partition's reused [[ImageDecoder]], nearest-neighbor sample to
   * `width`×`height`, re-encode as PNG. Undecodable payloads keep the
   * deterministic stub — UTF-8 of "md5hex(payload):<w>x<h>" — which the
   * DuckDB oracle re-derives for the text fixtures. Typed Dataset in/out,
   * per-partition codec init, payload never leaves its executor.
   */
  def resize(
    media: Dataset[MediaRecord],
    width: Int,
    height: Int
  ): Dataset[MediaRecord] = {
    require(width > 0 && height > 0, s"resize dims must be positive: ${width}x$height")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new ImageDecoder
      val digest = java.security.MessageDigest.getInstance("MD5")
      onExhaustion(rows.map { rec =>
        decoder.decode(rec.payload) match {
          case Some(img) =>
            MediaRecord(rec.doc_id, encodePng(nearestResize(img, width, height)))
          case None =>
            val hex = md5Hex(digest, rec.payload)
            MediaRecord(rec.doc_id, s"$hex:${width}x$height".getBytes("UTF-8"))
        }
      })(() => decoder.dispose())
    }
  }

  /**
   * Per-partition frame decoder — the injection seam for [[sampleFrames]].
   * The JDK ships no audio/video codec, so graft cannot decode real
   * frames here; a deployment that has one on the executor classpath
   * (jcodec, a JNI ffmpeg binding, …) implements this trait and the
   * operator's distribution shape — 1→N partition-local explode, payload
   * never shuffled, per-partition codec init — is unchanged.
   *
   * Instances are constructed per PARTITION via the factory passed to
   * [[sampleFrames]] (never serialized, may hold non-serializable codec
   * state, single-threaded within a task); `dispose` runs on partition
   * exhaustion for native-resource cleanup.
   */
  trait FrameDecoder {
    /** Decode/sample frame `frameIdx` of `nFrames` from `payload`. */
    def decodeFrame(payload: Array[Byte], frameIdx: Int, nFrames: Int): Array[Byte]
    def dispose(): Unit = ()
  }

  /** The default [[FrameDecoder]] factory: the documented deterministic
    * STUB — frame i of a payload is UTF-8 "md5hex(payload):<i>" (the
    * DuckDB oracle in LlmGates re-derives this exact encoding). */
  val Md5StubFrames: () => FrameDecoder = () =>
    new FrameDecoder {
      private val digest = java.security.MessageDigest.getInstance("MD5")
      private var lastPayload: Array[Byte] = _
      private var lastHex: String = _
      def decodeFrame(payload: Array[Byte], frameIdx: Int, nFrames: Int): Array[Byte] = {
        // frames of one payload share the hash — compute it once per row
        // (eq, not equals: the same row's array reference, not a scan)
        if (lastHex == null || (payload ne lastPayload)) {
          lastPayload = payload
          lastHex = md5Hex(digest, payload)
        }
        s"$lastHex:$frameIdx".getBytes("UTF-8")
      }
    }

  /**
   * REAL multi-frame decoding for the one animated format the JDK can
   * read: animated GIF. Frame `i` of `nFrames` requested maps to stored
   * frame `⌊i·m/n⌋` of the GIF's `m` image descriptors (even temporal
   * sampling — the frame-sample policy a video pipeline uses), decoded
   * via the partition's reused GIF `ImageReader` and re-encoded as PNG
   * (lossless, so downstream [[decodeFeatures]] sees exact pixels).
   * Stored frames are returned AS STORED: GIF inter-frame disposal /
   * patch compositing is NOT applied — frame k of an optimized GIF may
   * be a partial patch raster, not the composited screen. Non-GIF and
   * undecodable payloads fall back to the [[Md5StubFrames]] stub bytes
   * (the operator-wide fallback convention). The open input stream and
   * frame count are cached per payload, so the n frames of one row pay
   * one header parse.
   */
  val GifFrames: () => FrameDecoder = () =>
    new FrameDecoder {
      private val stub = Md5StubFrames()
      private var reader: javax.imageio.ImageReader = _
      private var iis: javax.imageio.stream.ImageInputStream = _
      private var lastPayload: Array[Byte] = _
      private var lastCount: Int = 0

      private def closeInput(): Unit = {
        if (iis != null) {
          try iis.close() catch { case scala.util.control.NonFatal(_) => () }
          iis = null
        }
        lastPayload = null
        lastCount = 0
      }

      /** (Re)open the reader on a new payload; returns the frame count
        * (0 = unreadable → caller stubs). */
      private def open(payload: Array[Byte]): Int = {
        if (payload eq lastPayload) lastCount
        else {
          closeInput()
          try {
            if (reader == null) {
              val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
              if (!it.hasNext) return 0
              reader = it.next()
            }
            iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(payload))
            // seekForwardOnly = false: frame sampling random-accesses
            // stored frames
            reader.setInput(iis, false, true)
            lastPayload = payload
            lastCount = reader.getNumImages(true)
            lastCount
          } catch {
            case scala.util.control.NonFatal(_) => closeInput(); 0
          }
        }
      }

      def decodeFrame(payload: Array[Byte], frameIdx: Int, nFrames: Int): Array[Byte] = {
        val isGif = imageFormat(payload).contains("gif")
        val m = if (isGif) open(payload) else 0
        if (m <= 0) stub.decodeFrame(payload, frameIdx, nFrames)
        else try {
          encodePng(reader.read((frameIdx.toLong * m / nFrames).toInt))
        } catch {
          case scala.util.control.NonFatal(_) =>
            stub.decodeFrame(payload, frameIdx, nFrames)
        }
      }

      override def dispose(): Unit = {
        closeInput()
        if (reader != null) { reader.dispose(); reader = null }
      }
    }

  /**
   * Frame sampling: one media row explodes into `n` frame rows — the
   * 1→N row shape (and its shuffle-free, partition-local execution) is
   * the real contract. Frame CONTENT comes from the injected
   * [[FrameDecoder]] factory: [[GifFrames]] does REAL multi-frame
   * decode for animated GIF (the one JDK-readable animated format); the
   * default [[Md5StubFrames]] is the deterministic stub for formats
   * whose codecs the JDK lacks (MultimodalSpec shows an external codec
   * riding the same seam).
   */
  def sampleFrames(
    media: Dataset[MediaRecord],
    n: Int,
    decoder: () => FrameDecoder = Md5StubFrames
  ): Dataset[FrameRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val dec = decoder()
      onExhaustion(rows.flatMap { rec =>
        (0 until n).iterator.map(i =>
          FrameRecord(rec.doc_id, i, dec.decodeFrame(rec.payload, i, n)))
      })(() => dec.dispose())
    }
  }

  /**
   * Batched decode + feature extraction over media payloads.
   *
   * Image payloads get REAL pixel work: `javax.imageio` decode (reader
   * reused across the partition), actual width/height, and per-band mean
   * luminance features ([[bandLuminance]] — integer pixel sums, so the
   * floats are bit-deterministic). Undecodable payloads fall back to the
   * deterministic MD5-derived stub the DuckDB oracle re-derives for text
   * fixtures. The scale shape is the same either way: typed Dataset
   * in/out, per-partition batching amortizing codec init, no driver
   * involvement, payload never shuffled.
   */
  def decodeFeatures(
    media: Dataset[MediaRecord],
    featureDim: Int = 8,
    batchSize: Int = 64
  ): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init — codec readers + stub digest, built once
      val decoder = new ImageDecoder
      val digest = java.security.MessageDigest.getInstance("MD5")
      onExhaustion(rows.grouped(batchSize).flatMap { batch =>
        batch.map { rec =>
          decoder.decode(rec.payload) match {
            case Some(img) =>
              DecodedMedia(
                rec.doc_id, img.getWidth, img.getHeight,
                bandLuminance(img, featureDim))
            case None =>
              // deterministic stub for non-image payloads
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
      })(() => decoder.dispose())
    }
  }
}
