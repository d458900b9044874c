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

  test("sampleFrames: an injected decoder produces real frame content, same operator") {
    // a "codec" that actually derives frame content from the payload —
    // stands in for a deployment's jcodec/ffmpeg FrameDecoder; dispose
    // must fire per partition (native-resource contract)
    val disposed = spark.sparkContext.collectionAccumulator[Int]("disposed")
    val fake: () => Multimodal.FrameDecoder = () =>
      new Multimodal.FrameDecoder {
        def decodeFrame(payload: Array[Byte], i: Int, n: Int): Array[Byte] =
          payload.reverse ++ Array(i.toByte, n.toByte)
        override def dispose(): Unit = disposed.add(1)
      }
    val media = Seq(MediaRecord(1L, jpegHeader), MediaRecord(2L, pngHeader)).toDS()
    val frames = Multimodal.sampleFrames(media, 2, fake).collect()
      .map(f => (f.doc_id, f.frame_idx) -> f.frame.toSeq).toMap
    assert(frames.size == 4)
    assert(frames((1L, 0)) == (jpegHeader.reverse ++ Array[Byte](0, 2)).toSeq)
    assert(frames((2L, 1)) == (pngHeader.reverse ++ Array[Byte](1, 2)).toSeq)
    assert(!disposed.value.isEmpty, "dispose() never ran on partition exhaustion")
  }

  test("GifFrames: real animated-GIF frames decode with even temporal sampling") {
    // 6 stored solid-gray frames (j·40); sampling 3 must hit stored
    // frames 0/2/4 — grays 0/80/160 — with real pixels, not stub bytes
    val gif = graft.gates.LlmGates.encodeAnimatedGif(
      (0 until 6).map { j =>
        val v = j * 40
        graft.gates.LlmGates.solidFrame(4, 8, (v << 16) | (v << 8) | v)
      })
    val media = Seq(MediaRecord(7L, gif)).toDS()
    val frames = Multimodal.sampleFrames(media, 3, Multimodal.GifFrames).collect()
      .sortBy(_.frame_idx)
    assert(frames.map(f => (f.doc_id, f.frame_idx)).toSeq ==
      Seq((7L, 0), (7L, 1), (7L, 2)))
    val grays = frames.map { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame))
      assert(img.getWidth == 4 && img.getHeight == 8)
      img.getRGB(2, 3) & 0xff
    }
    assert(grays.toSeq == Seq(0, 80, 160), grays.toSeq.toString)
    // oversampling a short GIF repeats stored frames (⌊i·m/n⌋), still real
    val over = Multimodal.sampleFrames(media, 12, Multimodal.GifFrames).collect()
    assert(over.length == 12)
    val overGrays = over.sortBy(_.frame_idx).map { f =>
      javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame)).getRGB(0, 0) & 0xff
    }
    assert(overGrays.toSeq == Seq(0, 0, 40, 40, 80, 80, 120, 120, 160, 160, 200, 200))
  }

  test("GifFrames: non-GIF and truncated payloads fall back to the md5 stub") {
    val gif = graft.gates.LlmGates.encodeAnimatedGif(
      Seq(graft.gates.LlmGates.solidFrame(2, 2, 0x123456)))
    val truncated = gif.take(20) // valid magic, unreadable body
    val media = Seq(
      MediaRecord(1L, jpegHeader), MediaRecord(2L, truncated)).toDS()
    val frames = Multimodal.sampleFrames(media, 2, Multimodal.GifFrames).collect()
    val stub = Multimodal.sampleFrames(media, 2).collect()
    assert(frames.map(f => (f.doc_id, f.frame_idx) -> f.frame.toSeq).toMap ==
      stub.map(f => (f.doc_id, f.frame_idx) -> f.frame.toSeq).toMap)
  }

  test("resize: deterministic content-derived payload, schema preserved") {
    val media = Seq(MediaRecord(1L, jpegHeader)).toDS()
    val r1 = Multimodal.resize(media, 64, 64).head
    val r2 = Multimodal.resize(media, 64, 64).head
    val other = Multimodal.resize(media, 32, 32).head
    assert(r1.doc_id == 1L && r1.payload.toSeq == r2.payload.toSeq)
    assert(r1.payload.toSeq != other.payload.toSeq) // dims change content
  }

  // ------------------------------------------------- real pixel work

  /** PNG-encode a programmatically built image. */
  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def rgbImage(w: Int, h: Int)(color: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color(x, y))
    img
  }

  test("decodeFeatures: real PNG decode — actual dims + known band luminance") {
    // 8×4 image, one uniform color per row: black, white, red, rgb(30,60,90)
    val rows = Array(0x000000, 0xffffff, 0xff0000, 0x1e3c5a)
    val fixture = png(rgbImage(8, 4)((_, y) => rows(y)))
    val media = Seq(MediaRecord(7L, fixture)).toDS()
    val out = Multimodal.decodeFeatures(media, featureDim = 4).head
    assert(out.width == 8 && out.height == 4)
    val expected = Seq(0.0f, 1.0f, (255.0 / 765.0).toFloat, (180.0 / 765.0).toFloat)
    assert(out.features.toSeq == expected)
  }

  test("decodeFeatures: image rows take the real branch, text rows the stub") {
    val fixture = png(rgbImage(3, 3)((_, _) => 0xffffff))
    val media = Seq(
      MediaRecord(1L, fixture),
      MediaRecord(2L, "not an image".getBytes("UTF-8"))
    ).toDS()
    val out = Multimodal.decodeFeatures(media, featureDim = 2)
      .collect().map(d => d.doc_id -> d).toMap
    assert(out(1L).width == 3 && out(1L).height == 3)
    assert(out(1L).features.forall(_ == 1.0f)) // all-white
    // the text row reproduces the md5-derived stub exactly
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("not an image".getBytes("UTF-8"))
    assert(out(2L).width == ((h(0) & 0xff) % 64) + 1)
    assert(out(2L).features.toSeq ==
      Seq((h(0) & 0xff) / 255.0f, (h(1) & 0xff) / 255.0f))
  }

  test("resize: real nearest-neighbor rescale round-trips quadrant pixels") {
    val colors = Array(Array(0xff0000, 0x00ff00), Array(0x0000ff, 0xffffff))
    val fixture = png(rgbImage(2, 2)((x, y) => colors(y)(x)))
    val media = Seq(MediaRecord(1L, fixture)).toDS()
    val resized = Multimodal.resize(media, 4, 4).head.payload
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth == 4 && img.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((img.getRGB(x, y) & 0xffffff) == colors(y / 2)(x / 2),
        s"pixel ($x,$y)")
  }

  test("resize: BMP input decodes too and comes back as PNG") {
    val src = rgbImage(4, 2)((_, _) => 0x123456)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "bmp", baos)
    val media = Seq(MediaRecord(1L, baos.toByteArray)).toDS()
    val out = Multimodal.resize(media, 2, 2).head.payload
    assert(out.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert((img.getRGB(1, 1) & 0xffffff) == 0x123456)
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

  private val Wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
  private val Aiff = javax.sound.sampled.AudioFileFormat.Type.AIFF
  private val Au = javax.sound.sampled.AudioFileFormat.Type.AU

  test("decodeAudioFeatures: real WAV decode — rate, channels, frames, window RMS") {
    // 8 windows of 6 samples, window j a ±(j·4000) square wave → RMS
    // exactly j·4000/32768 (dyadic, float-exact)
    val samples = (0 until 8).flatMap(j => graft.gates.LlmGates.squareRun(j * 4000, 6)).toArray
    val wav = graft.gates.LlmGates.encodeAudio(Wave, 8000, 1, samples, bigEndian = false)
    val d = Multimodal.decodeAudioFeatures(Seq(MediaRecord(1L, wav)).toDS(), 8).head()
    assert((d.sample_rate, d.channels, d.n_samples) == ((8000, 1, 48L)))
    assert(d.features.toSeq == (0 until 8).map(j => j * 4000 / 32768.0f))
  }

  test("decodeAudioFeatures: big-endian stereo AIFF converts exactly") {
    // L=+8192 R=−16384 throughout; BE storage must byte-swap, channels
    // pool per window: RMS = √((8192²+16384²)/2)/32768 everywhere
    val samples = Array.tabulate[Short](32)(i => if (i % 2 == 0) 8192 else -16384)
    val aiff = graft.gates.LlmGates.encodeAudio(Aiff, 16000, 2, samples, bigEndian = true)
    val d = Multimodal.decodeAudioFeatures(Seq(MediaRecord(1L, aiff)).toDS(), 8).head()
    assert((d.sample_rate, d.channels, d.n_samples) == ((16000, 2, 16L)))
    val want = (math.sqrt((8192.0 * 8192 + 16384.0 * 16384) / 2) / 32768.0).toFloat
    assert(d.features.toSeq == Seq.fill(8)(want))
  }

  test("decodeAudioFeatures: μ-law AU transcodes through the JDK codec") {
    // PCM → μ-law → AU file → decode: lossy but deterministic; stream
    // properties exact, RMS within μ-law quantization error of the source
    val pcmFmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, true)
    val ulawFmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, true)
    val samples = graft.gates.LlmGates.squareRun(12000, 16)
    val bytes = new Array[Byte](32)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = ((s >> 8) & 0xff).toByte; bytes(2 * i + 1) = (s & 0xff).toByte
    }
    val pcmAis = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), pcmFmt, 16L)
    val ulawAis = javax.sound.sampled.AudioSystem.getAudioInputStream(ulawFmt, pcmAis)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ulawAis, Au, baos)
    val d = Multimodal.decodeAudioFeatures(Seq(MediaRecord(1L, baos.toByteArray)).toDS(), 4).head()
    assert((d.sample_rate, d.channels, d.n_samples) == ((8000, 1, 16L)))
    d.features.foreach(f => assert(math.abs(f - 12000 / 32768.0) < 0.02, f.toString))
  }

  test("decodeAudioFeatures: non-audio and truncated payloads take the md5 stub") {
    val wav = graft.gates.LlmGates.encodeAudio(
      Wave, 8000, 1, graft.gates.LlmGates.squareRun(5000, 10), bigEndian = false)
    val text = "not audio at all".getBytes("UTF-8")
    val out = Multimodal.decodeAudioFeatures(
      Seq(MediaRecord(1L, text), MediaRecord(2L, wav.take(16))).toDS(), 8)
      .collect().map(d => d.doc_id -> d).toMap
    // text: stub derivation — hash-byte dims, byte-length n_samples
    val h = java.security.MessageDigest.getInstance("MD5").digest(text)
    assert(out(1L).sample_rate == ((h(0) & 0xff) % 64) + 1)
    assert(out(1L).channels == ((h(1) & 0xff) % 64) + 1)
    assert(out(1L).n_samples == text.length.toLong)
    assert(out(1L).features.toSeq == (0 until 8).map(i => (h(i) & 0xff) / 255.0f))
    // truncated WAV header: sniffs as RIFF/WAVE but fails decode → stub
    assert(out(2L).n_samples == 16L)
  }

  test("WavFrames: real PCM windows re-encoded as WAVs, even temporal sampling") {
    val samples = (0 until 6).flatMap(seg => graft.gates.LlmGates.squareRun(seg * 5000, 10)).toArray
    val wav = graft.gates.LlmGates.encodeAudio(Wave, 8000, 1, samples, bigEndian = false)
    val frames = Multimodal.sampleFrames(
      Seq(MediaRecord(9L, wav)).toDS(), 3, Multimodal.WavFrames).collect().sortBy(_.frame_idx)
    assert(frames.map(f => (f.doc_id, f.frame_idx)).toSeq == Seq((9L, 0), (9L, 1), (9L, 2)))
    // every frame is itself a decodable 20-sample WAV; window i holds
    // segments 2i (first 10) and 2i+1 (last 10)
    frames.foreach { f =>
      val d = Multimodal.decodeAudioFeatures(
        Seq(MediaRecord(f.frame_idx.toLong, f.frame)).toDS(), 2).head()
      assert((d.sample_rate, d.channels, d.n_samples) == ((8000, 1, 20L)))
      assert(d.features.toSeq ==
        Seq((2 * f.frame_idx) * 5000 / 32768.0f, (2 * f.frame_idx + 1) * 5000 / 32768.0f))
    }
  }

  test("WavFrames: oversampling a short stream yields empty-but-valid WAV windows") {
    // 3 sample frames sampled 8 ways: the ⌊i·3/8⌋ window boundaries
    // leave windows 2/5/7 populated with one sample each (1000, −2000,
    // 3000 respectively), the rest 0-sample WAVs
    val wav = graft.gates.LlmGates.encodeAudio(
      Wave, 8000, 1, Array[Short](1000, -2000, 3000), bigEndian = false)
    val frames = Multimodal.sampleFrames(
      Seq(MediaRecord(1L, wav)).toDS(), 8, Multimodal.WavFrames).collect()
    assert(frames.length == 8)
    val decoded = Multimodal.decodeAudioFeatures(
      frames.toSeq.map(f => MediaRecord(f.frame_idx.toLong, f.frame)).toDS(), 1)
      .collect().map(d => d.doc_id -> d).toMap
    assert(decoded.values.forall(d => d.sample_rate == 8000 && d.channels == 1))
    assert(decoded.filter(_._2.n_samples > 0L).keySet == Set(2L, 5L, 7L))
    assert(decoded(2L).features.toSeq == Seq(1000 / 32768.0f))
    assert(decoded(5L).features.toSeq == Seq(2000 / 32768.0f))
    assert(decoded(7L).features.toSeq == Seq(3000 / 32768.0f))
    assert(decoded(1L).n_samples == 0L && decoded(1L).features.toSeq == Seq(0.0f))
  }

  test("AviFrames: raw-DIB AVI frames decode bit-exactly with even sampling") {
    // 6 solid-gray 4×8 frames (j·40) in a raw BI_RGB AVI; sampling 3
    // must hit stored frames 0/2/4 with exact pixels
    val avi = graft.gates.LlmGates.encodeAvi(
      (0 until 6).map { j =>
        val v = j * 40
        graft.gates.LlmGates.solidFrame(4, 8, (v << 16) | (v << 8) | v)
      })
    val frames = Multimodal.sampleFrames(
      Seq(MediaRecord(3L, avi)).toDS(), 3, Multimodal.AviFrames).collect().sortBy(_.frame_idx)
    val grays = frames.map { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame))
      assert(img.getWidth == 4 && img.getHeight == 8)
      img.getRGB(2, 3) & 0xff
    }
    assert(grays.toSeq == Seq(0, 80, 160), grays.toSeq.toString)
  }

  test("AviFrames: BGR channel order and bottom-up row order decode correctly") {
    // one frame, row y solid color from a per-row palette: catches a
    // swapped channel (red≠blue) and a flipped vertical axis
    val rows = Array(0xff0000, 0x00ff00, 0x0000ff, 0x804020)
    val src = rgbImage(3, 4)((_, y) => rows(y))
    for (topDown <- Seq(false, true)) {
      val avi = graft.gates.LlmGates.encodeAvi(Seq(src), topDown = topDown)
      val f = Multimodal.sampleFrames(
        Seq(MediaRecord(1L, avi)).toDS(), 1, Multimodal.AviFrames).head()
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame))
      for (y <- 0 until 4; x <- 0 until 3)
        assert((img.getRGB(x, y) & 0xffffff) == rows(y), s"topDown=$topDown ($x,$y)")
    }
  }

  test("AviFrames: MJPEG frames decode through the JDK JPEG reader") {
    val avi = graft.gates.LlmGates.encodeAvi(
      (0 until 4).map(j => graft.gates.LlmGates.solidFrame(16, 16, 0x406080 + j)),
      mjpeg = true)
    val frames = Multimodal.sampleFrames(
      Seq(MediaRecord(1L, avi)).toDS(), 2, Multimodal.AviFrames).collect()
    assert(frames.length == 2)
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame))
      assert(img.getWidth == 16 && img.getHeight == 16)
      // JPEG is lossy: solid mid-tone survives within a small tolerance
      val rgb = img.getRGB(8, 8)
      assert(math.abs(((rgb >> 16) & 0xff) - 0x40) < 12, f"red ${rgb}%08x")
      assert(math.abs((rgb & 0xff) - 0x80) < 12, f"blue ${rgb}%08x")
    }
  }

  test("AviFrames: frames wrapped in rec-LISTs (interleaved AVI shape) still demux") {
    // real-world interleaved AVIs group frame chunks inside LIST('rec ')
    // wrappers within movi; the demuxer's generic LIST recursion must
    // find them. Build one by re-wrapping a flat AVI's movi body.
    val flat = graft.gates.LlmGates.encodeAvi(
      (0 until 2).map(j => graft.gates.LlmGates.solidFrame(4, 4, j * 100)))
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def indexOf(hay: Array[Byte], needle: String): Int = {
      val n = needle.getBytes("ISO-8859-1")
      hay.indices.find(i => i + n.length <= hay.length &&
        n.indices.forall(j => hay(i + j) == n(j))).get
    }
    // movi LIST: "LIST" size "movi" <chunks> — rebuild with the chunks
    // wrapped in one LIST('rec ')
    val moviTag = indexOf(flat, "movi")
    val moviSizeOff = moviTag - 4
    val moviSize = (flat(moviSizeOff) & 0xff) | ((flat(moviSizeOff + 1) & 0xff) << 8) |
      ((flat(moviSizeOff + 2) & 0xff) << 16) | ((flat(moviSizeOff + 3) & 0xff) << 24)
    val chunks = flat.slice(moviTag + 4, moviTag + moviSize)
    val rec = "LIST".getBytes("ISO-8859-1") ++ le32(4 + chunks.length) ++
      "rec ".getBytes("ISO-8859-1") ++ chunks
    val newMovi = "LIST".getBytes("ISO-8859-1") ++ le32(4 + rec.length) ++
      "movi".getBytes("ISO-8859-1") ++ rec
    val head = flat.take(moviSizeOff - 4) // up to the movi LIST header
    val wrapped = head ++ newMovi
    // fix the RIFF size (offset 4): total - 8
    val riffSize = le32(wrapped.length - 8)
    riffSize.indices.foreach(i => wrapped(4 + i) = riffSize(i))
    val frames = Multimodal.sampleFrames(
      Seq(MediaRecord(1L, wrapped)).toDS(), 2, Multimodal.AviFrames).collect()
      .sortBy(_.frame_idx)
    val grays = frames.map { f =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame)).getRGB(1, 1)
    }
    assert(grays.toSeq == Seq(0xff000000, 0xff000064), grays.map(_.toHexString).toSeq)
  }

  test("AviFrames: a crafted header claiming huge dimensions stubs instead of allocating") {
    val avi = graft.gates.LlmGates.encodeAvi(
      Seq(graft.gates.LlmGates.solidFrame(4, 4, 0x112233)))
    // patch biWidth (offset strf-body + 4) to 2^30 — the stride·height
    // math would overflow without the dimension sanity gate
    def indexOf(hay: Array[Byte], needle: String): Int = {
      val n = needle.getBytes("ISO-8859-1")
      hay.indices.find(i => i + n.length <= hay.length &&
        n.indices.forall(j => hay(i + j) == n(j))).get
    }
    val patched = avi.clone()
    val strfBody = indexOf(patched, "strf") + 8
    val huge = 1 << 30
    patched(strfBody + 4) = (huge & 0xff).toByte
    patched(strfBody + 5) = ((huge >> 8) & 0xff).toByte
    patched(strfBody + 6) = ((huge >> 16) & 0xff).toByte
    patched(strfBody + 7) = ((huge >> 24) & 0xff).toByte
    val media = Seq(MediaRecord(1L, patched)).toDS()
    val real = Multimodal.sampleFrames(media, 2, Multimodal.AviFrames).collect()
    val stub = Multimodal.sampleFrames(media, 2).collect()
    assert(real.map(f => (f.doc_id, f.frame_idx) -> f.frame.toSeq).toMap ==
      stub.map(f => (f.doc_id, f.frame_idx) -> f.frame.toSeq).toMap)
  }

  test("decodeAudioFeatures: a zero-channel header stubs instead of dividing by zero") {
    val wav = graft.gates.LlmGates.encodeAudio(
      Wave, 8000, 1, graft.gates.LlmGates.squareRun(1000, 8), bigEndian = false)
    // WAV fmt chunk: channels is a u16 at fmt-body + 2
    def indexOf(hay: Array[Byte], needle: String): Int = {
      val n = needle.getBytes("ISO-8859-1")
      hay.indices.find(i => i + n.length <= hay.length &&
        n.indices.forall(j => hay(i + j) == n(j))).get
    }
    val patched = wav.clone()
    val fmtBody = indexOf(patched, "fmt ") + 8
    patched(fmtBody + 2) = 0
    patched(fmtBody + 3) = 0
    val d = Multimodal.decodeAudioFeatures(
      Seq(MediaRecord(1L, patched)).toDS(), 4).head()
    // stub branch: n_samples = payload byte length (the md5 fallback)
    assert(d.n_samples == patched.length.toLong)
  }

  test("AviFrames: non-AVI and truncated payloads fall back to the md5 stub") {
    val avi = graft.gates.LlmGates.encodeAvi(
      Seq(graft.gates.LlmGates.solidFrame(4, 4, 0x112233)))
    val media = Seq(
      MediaRecord(1L, jpegHeader), // not an AVI
      MediaRecord(2L, avi.take(40)) // RIFF magic, truncated tree
    ).toDS()
    val real = Multimodal.sampleFrames(media, 2, Multimodal.AviFrames).collect()
    val stub = Multimodal.sampleFrames(media, 2).collect()
    assert(real.map(f => (f.doc_id, f.frame_idx) -> f.frame.toSeq).toMap ==
      stub.map(f => (f.doc_id, f.frame_idx) -> f.frame.toSeq).toMap)
  }

  test("WavFrames: non-audio payloads fall back to the md5 stub") {
    val media = Seq(MediaRecord(1L, jpegHeader), MediaRecord(2L, pngHeader)).toDS()
    val real = Multimodal.sampleFrames(media, 2, Multimodal.WavFrames).collect()
    val stub = Multimodal.sampleFrames(media, 2).collect()
    assert(real.map(f => (f.doc_id, f.frame_idx) -> f.frame.toSeq).toMap ==
      stub.map(f => (f.doc_id, f.frame_idx) -> f.frame.toSeq).toMap)
  }

  private def grayPng(w: Int, h: Int)(g: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = g(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("imageDHash: hand-derived hashes, NULL for undecodable payloads") {
    val media = Seq(
      MediaRecord(1L, grayPng(9, 8)((x, _) => x * 10)),          // ramp
      MediaRecord(2L, grayPng(9, 8)((_, _) => 100)),             // flat
      MediaRecord(3L, grayPng(9, 8)((x, _) => math.min(x, 4) * 10)),
      MediaRecord(4L, grayPng(9, 8)((x, y) => if (x == 0 && y == 0) 10 else x * 10)),
      MediaRecord(5L, grayPng(18, 16)((x, _) => (x / 2) * 10)),  // 2x ramp
      MediaRecord(6L, "not an image".getBytes("UTF-8"))
    ).toDS()
    val got = Multimodal.imageDHash(media).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L) === Some(-1L))
    assert(got(2L) === Some(0L))
    assert(got(3L) === Some(0x0F0F0F0F0F0F0F0FL))
    assert(got(4L) === Some(-2L))
    assert(got(5L) === Some(-1L), "nearest resize of the doubled ramp = the ramp")
    assert(got(6L) === None)
  }

  test("imageDHash: definitional parity on random 9x8 gray images") {
    val rnd = new scala.util.Random(47)
    val imgs = (0 until 20).map { i =>
      val px = Array.fill(8, 9)(rnd.nextInt(256))
      (i.toLong, px)
    }
    val media = imgs.map { case (id, px) =>
      MediaRecord(id, grayPng(9, 8)((x, y) => px(y)(x)))
    }.toDS()
    val got = Multimodal.imageDHash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    imgs.foreach { case (id, px) =>
      var want = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (px(y)(x + 1) > px(y)(x)) want |= 1L << (y * 8 + x)
      assert(got(id) === want, s"image $id")
    }
  }

  test("imageNearDups: the ramp family pairs up, nothing else") {
    val media = Seq(
      MediaRecord(1L, grayPng(9, 8)((x, _) => x * 10)),
      MediaRecord(2L, grayPng(9, 8)((_, _) => 100)),
      MediaRecord(3L, grayPng(9, 8)((x, _) => math.min(x, 4) * 10)),
      MediaRecord(4L, grayPng(9, 8)((x, y) => if (x == 0 && y == 0) 10 else x * 10)),
      MediaRecord(5L, grayPng(18, 16)((x, _) => (x / 2) * 10)),
      MediaRecord(6L, "not an image".getBytes("UTF-8"))
    ).toDS()
    val got = Multimodal.imageNearDups(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 4L, 1), (1L, 5L, 0), (4L, 5L, 1)))
  }

  test("imageDedupStreamSink: MemoryStream batches keep exactly what a batch dedup keeps") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ramp(scale: Int) = grayPng(9 * scale, 8 * scale)((x, _) => (x / scale) * 10)
    val flat = grayPng(9, 8)((_, _) => 100)
    val half = grayPng(9, 8)((x, _) => math.min(x, 4) * 10)
    val oneBit = grayPng(9, 8)((x, y) => if (x == 0 && y == 0) 10 else x * 10)
    val batches: Seq[Seq[MediaRecord]] = Seq(
      Seq(MediaRecord(1L, ramp(1)), MediaRecord(2L, flat),
        MediaRecord(3L, oneBit),                              // within-batch copy of 1
        MediaRecord(4L, "text".getBytes("UTF-8"))),           // undecodable: kept
      Seq(MediaRecord(11L, ramp(2)),                          // cross-batch copy of 1
        MediaRecord(12L, half),                               // new
        MediaRecord(13L, "more text".getBytes("UTF-8"))))
    val idx = java.nio.file.Files
      .createTempDirectory("graft-dstream-spec").toString + "/dhash"
    val got = scala.collection.mutable.Buffer[Long]()
    val stream = MemoryStream[MediaRecord]
    val q = stream.toDS().writeStream
      .foreachBatch(Multimodal.imageDedupStreamSink(idx) { (survivors, _) =>
        got ++= survivors.collect().map(_.doc_id)
      })
      .start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // batch-mode reference over the union: greedy lowest-id keeper
    val union = spark.createDataset(batches.flatten)
    val losers = Multimodal.imageNearDups(union, maxHamming = 3)
      .select("id_b").collect().map(_.getLong(0)).toSet
    val want = batches.flatten.map(_.doc_id).filterNot(losers).toSet
    assert(got.toSet == want, s"stream ${got.sorted} vs batch ${want.toSeq.sorted}")
    assert(got.toSet == Set(1L, 2L, 4L, 12L, 13L))
    // the grown artifact is PRE-BANDED (band rows, not flat hashes) and
    // holds exactly the surviving decodables
    val grownDf = spark.read.parquet(idx)
    assert(grownDf.columns.toSet ==
      Set("band", "band_key", "index_id", "index_hash"))
    val grown = grownDf.select("index_id")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(grown == Set(1L, 2L, 12L))
  }

  test("imageDedupStreamSink: a replayed micro-batch recomputes the SAME survivors") {
    // the retry contract: after a sink+append whose checkpoint commit
    // failed, the replay must not self-match the hashes the first
    // attempt appended (that would deliver a near-empty batch to an
    // idempotent sink, losing the survivors' content permanently)
    def ramp(scale: Int) = grayPng(9 * scale, 8 * scale)((x, _) => (x / scale) * 10)
    val batch = Seq(
      MediaRecord(1L, ramp(1)),
      MediaRecord(2L, grayPng(9, 8)((_, _) => 100)),
      MediaRecord(3L, grayPng(9, 8)((x, y) => if (x == 0 && y == 0) 10 else x * 10)),
      MediaRecord(4L, "text".getBytes("UTF-8"))).toDS()
    val idx = java.nio.file.Files
      .createTempDirectory("graft-dstream-retry").toString + "/dhash"
    var delivered: Set[Long] = Set.empty
    val sink = Multimodal.imageDedupStreamSink(idx) { (survivors, _) =>
      delivered = survivors.collect().map(_.doc_id).toSet
    }
    sink(batch, 0L)
    val first = delivered
    assert(first == Set(1L, 2L, 4L))
    sink(batch, 0L) // the replay
    assert(delivered == first, s"replay delivered $delivered, not $first")
    // duplicate index rows are harmless: a later batch still matches
    val later = Seq(MediaRecord(11L, ramp(2))).toDS()
    sink(later, 1L)
    assert(delivered == Set.empty[Long])
  }

  test("imageDedupStreamSink: replays are idempotent across within-batch transitive chains") {
    // a ~ b ~ c with a !~ c (hamming(a,b)=3, hamming(b,c)=3,
    // hamming(a,c)=6): first attempt keeps {a}; a NAIVE replay that
    // only excluded same-id index matches would see survivor a's
    // appended row eat b BEFORE within-batch pairing, so c never pairs
    // with b and {a, c} gets delivered - the anti-join on the batch's
    // own id set restores the exact first-attempt index view
    val a = grayPng(9, 8)((x, _) => x * 10)                       // all-ascending row
    val b = grayPng(9, 8)((x, y) =>                               // bits 0-2 cleared
      if (y == 0 && x <= 3) 30 else x * 10)
    val c = grayPng(9, 8)((x, y) =>                               // bits 0-5 cleared
      if (y == 0 && x <= 6) 60 else x * 10)
    // derivation check: the chain is exactly the shape claimed above
    val hs = Multimodal.imageDHash(Seq(
        MediaRecord(1L, a), MediaRecord(2L, b), MediaRecord(3L, c)).toDS())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(2L)) == 3)
    assert(java.lang.Long.bitCount(hs(2L) ^ hs(3L)) == 3)
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) == 6)
    val batch = Seq(
      MediaRecord(1L, a), MediaRecord(2L, b), MediaRecord(3L, c)).toDS()
    val idx = java.nio.file.Files
      .createTempDirectory("graft-dstream-chain").toString + "/dhash"
    var delivered: Set[Long] = Set.empty
    val sink = Multimodal.imageDedupStreamSink(idx) { (survivors, _) =>
      delivered = survivors.collect().map(_.doc_id).toSet
    }
    sink(batch, 0L)
    assert(delivered == Set(1L))
    sink(batch, 0L) // replay after a failed checkpoint commit
    assert(delivered == Set(1L), s"replay delivered $delivered, not {1}")
  }

  test("imageDedupStreamSink: flat pre-banded dirs and band mismatches fail loud") {
    // a pre-r16 stream's flat (doc_id, dhash) directory must fail with
    // a message naming the rebuild, not an unresolved-column error
    val flat = java.nio.file.Files
      .createTempDirectory("graft-dstream-flat").toString + "/dhash"
    Multimodal.imageDHash(Seq(
        MediaRecord(1L, grayPng(9, 8)((x, _) => x * 10))).toDS())
      .write.mode("overwrite").parquet(flat)
    val sink = Multimodal.imageDedupStreamSink(flat) { (_, _) => () }
    val e = intercept[IllegalArgumentException] {
      sink(Seq(MediaRecord(2L, grayPng(9, 8)((_, _) => 7))).toDS(), 0L)
    }
    assert(e.getMessage.contains("hammingBandedIndexWrite"), e.getMessage)
    // a restart with different bands fails naming the contract
    val idx = java.nio.file.Files
      .createTempDirectory("graft-dstream-bands").toString + "/dhash"
    Multimodal.imageDedupStreamSink(idx) { (_, _) => () }(
      Seq(MediaRecord(1L, grayPng(9, 8)((x, _) => x * 10))).toDS(), 0L)
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.imageDedupStreamSink(idx, bands = 2) { (_, _) => () }(
        Seq(MediaRecord(2L, grayPng(9, 8)((_, _) => 7))).toDS(), 1L)
    }
    assert(e2.getMessage.contains("bands"), e2.getMessage)
  }

  test("imageDedupStreamSink: an all-undecodable first batch leaves a usable artifact") {
    // zero decodable survivors write no parquet part files — the next
    // batch must read the (pinned-schema) empty artifact, not crash on
    // schema inference
    val idx = java.nio.file.Files
      .createTempDirectory("graft-dstream-empty").toString + "/dhash"
    var delivered: Set[Long] = Set.empty
    val sink = Multimodal.imageDedupStreamSink(idx) { (survivors, _) =>
      delivered = survivors.collect().map(_.doc_id).toSet
    }
    sink(Seq(MediaRecord(1L, "not an image".getBytes("UTF-8"))).toDS(), 0L)
    assert(delivered == Set(1L)) // undecodables always survive
    sink(Seq(MediaRecord(2L, grayPng(9, 8)((x, _) => x * 10))).toDS(), 1L)
    assert(delivered == Set(2L))
    // and the decodable survivor grew the artifact
    assert(spark.read.parquet(idx).select("index_id")
      .distinct().collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("imageNearDupsAgainst: batch probes the persisted dHash table; media NULLs stay out") {
    val index = Multimodal.imageDHash(Seq(
      MediaRecord(1L, grayPng(9, 8)((x, _) => x * 10)),           // -1
      MediaRecord(2L, grayPng(9, 8)((_, _) => 100)),              // 0
      MediaRecord(6L, "not an image".getBytes("UTF-8"))           // NULL
    ).toDS())
    val out = java.nio.file.Files
      .createTempDirectory("graft-dhash-spec").toString
    index.write.mode("overwrite").parquet(out)
    val batch = Seq(
      MediaRecord(100L, grayPng(18, 16)((x, _) => (x / 2) * 10)), // -1: hits 1
      MediaRecord(101L, grayPng(9, 8)((x, y) =>
        if (x == 0 && y == 0) 10 else x * 10)),                   // -2: hits 1 at 1
      MediaRecord(102L, grayPng(9, 8)((_, _) => 55)),             // 0: hits 2
      MediaRecord(103L, "text again".getBytes("UTF-8"))           // NULL: never
    ).toDS()
    val got = Multimodal.imageNearDupsAgainst(
        batch, spark.read.parquet(out), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((100L, 1L, 0), (101L, 1L, 1), (102L, 2L, 0)))
  }

  // --------------------------------------- r14: video/audio near-dup

  private def grayFrame(g: Int => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) {
      val v = g(x); img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("videoDHash: fold matches the hand derivation; containers agree; order matters") {
    val ramp = grayFrame(x => x * 10)
    val half = grayFrame(x => math.min(x, 4) * 10)
    val flat = grayFrame(_ => 100)
    val gif = graft.gates.LlmGates.encodeAnimatedGif(Seq(ramp, half, flat))
    val avi = graft.gates.LlmGates.encodeAvi(Seq(ramp, half, flat))
    val swapped = graft.gates.LlmGates.encodeAnimatedGif(Seq(half, ramp, flat))
    val media = Seq(
      MediaRecord(1L, gif), MediaRecord(2L, avi), MediaRecord(3L, swapped),
      MediaRecord(4L, "not video".getBytes("UTF-8"))).toDS()
    val got = Multimodal.videoDHash(media, n = 3).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // -1 xor rotl(0x0F0F..., 21)=0xE1E1... xor 0 = 0x1E1E1E1E1E1E1E1E
    assert(got(1L) === Some(0x1E1E1E1E1E1E1E1EL))
    // same pixels through the RIFF demux -> identical signature
    assert(got(2L) === got(1L))
    // frame ORDER changes the rotation assignment -> different signature
    assert(got(3L).isDefined && got(3L) != got(1L))
    // zero decodable frames -> NULL
    assert(got(4L) === None)
  }

  test("videoNearDups: re-encoded and one-bit-edited clips pair, unrelated don't") {
    val ramp = grayFrame(x => x * 10)
    val half = grayFrame(x => math.min(x, 4) * 10)
    val flat = grayFrame(_ => 100)
    val rampFlip = {
      val img = grayFrame(x => x * 10)
      img.setRGB(0, 0, (10 << 16) | (10 << 8) | 10); img
    }
    val media = Seq(
      MediaRecord(1L, graft.gates.LlmGates.encodeAnimatedGif(Seq(ramp, half, flat))),
      MediaRecord(2L, graft.gates.LlmGates.encodeAvi(Seq(ramp, half, flat))),
      MediaRecord(3L, graft.gates.LlmGates.encodeAnimatedGif(Seq(rampFlip, half, flat))),
      MediaRecord(4L, graft.gates.LlmGates.encodeAnimatedGif(Seq(flat, flat, flat)))
    ).toDS()
    val got = Multimodal.videoNearDups(media, n = 3, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("audioFingerprint: contour bits exact; amplitude and container invariant") {
    val Wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    val Aiff = javax.sound.sampled.AudioFileFormat.Type.AIFF
    val ramp = Array.tabulate(65)(j => ((j + 1) * 300).toShort)
    val scaled = Array.tabulate(65)(j => ((j + 1) * 450).toShort)
    val flat = Array.fill(65)(1000.toShort)
    val dip = ramp.clone(); dip(1) = 150.toShort
    val media = Seq(
      MediaRecord(1L, graft.gates.LlmGates.encodeAudio(Wave, 8000, 1, ramp, bigEndian = false)),
      MediaRecord(2L, graft.gates.LlmGates.encodeAudio(Wave, 8000, 1, scaled, bigEndian = false)),
      MediaRecord(3L, graft.gates.LlmGates.encodeAudio(Aiff, 8000, 1, ramp, bigEndian = true)),
      MediaRecord(4L, graft.gates.LlmGates.encodeAudio(Wave, 8000, 1, flat, bigEndian = false)),
      MediaRecord(5L, graft.gates.LlmGates.encodeAudio(Wave, 8000, 1, dip, bigEndian = false)),
      MediaRecord(6L, "not audio".getBytes("UTF-8"))).toDS()
    val got = Multimodal.audioFingerprint(media).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L) === Some(-1L))        // strictly rising contour
    assert(got(2L) === Some(-1L))        // volume-scaled: same contour
    assert(got(3L) === Some(-1L))        // AIFF re-encode: same samples
    assert(got(4L) === Some(0L))         // flat: no strict rise
    assert(got(5L) === Some(-2L))        // one dipped window: bit 0 only
    assert(got(6L) === None)             // undecodable
    val pairs = Multimodal.audioNearDups(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === Set(
      (1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0),
      (1L, 5L, 1), (2L, 5L, 1), (3L, 5L, 1)))
  }

  test("videoDedupStreamSink: MemoryStream batches keep what a batch dedup keeps") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ramp = grayFrame(x => x * 10)
    val half = grayFrame(x => math.min(x, 4) * 10)
    val flat = grayFrame(_ => 100)
    val rampFlip = {
      val img = grayFrame(x => x * 10)
      img.setRGB(0, 0, (10 << 16) | (10 << 8) | 10); img
    }
    val batches: Seq[Seq[MediaRecord]] = Seq(
      Seq(
        MediaRecord(1L, graft.gates.LlmGates.encodeAnimatedGif(Seq(ramp, half, flat))),
        MediaRecord(2L, graft.gates.LlmGates.encodeAnimatedGif(Seq(rampFlip, half, flat))), // within-batch copy
        MediaRecord(3L, "not video".getBytes("UTF-8"))),
      Seq(
        MediaRecord(11L, graft.gates.LlmGates.encodeAvi(Seq(ramp, half, flat))), // cross-batch re-encode
        MediaRecord(12L, graft.gates.LlmGates.encodeAnimatedGif(Seq(flat, flat, flat))), // new
        MediaRecord(13L, "more text".getBytes("UTF-8"))))
    val idx = java.nio.file.Files
      .createTempDirectory("graft-vstream-spec").toString + "/vhash"
    val got = scala.collection.mutable.Buffer[Long]()
    val stream = MemoryStream[MediaRecord]
    val q = stream.toDS().writeStream
      .foreachBatch(Multimodal.videoDedupStreamSink(idx, n = 3) { (survivors, _) =>
        got ++= survivors.collect().map(_.doc_id)
      })
      .start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val union = spark.createDataset(batches.flatten)
    val losers = Multimodal.videoNearDups(union, n = 3, maxHamming = 3)
      .select("id_b").collect().map(_.getLong(0)).toSet
    val want = batches.flatten.map(_.doc_id).filterNot(losers).toSet
    assert(got.toSet == want, s"stream ${got.sorted} vs batch ${want.toSeq.sorted}")
    assert(got.toSet == Set(1L, 3L, 12L, 13L))
    // grown artifact: pre-banded rows of exactly the surviving decodables
    val grown = spark.read.parquet(idx)
    assert(grown.columns.toSet == Set("band", "band_key", "index_id", "index_hash"))
    assert(grown.select("index_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L, 12L))
  }

  test("audioDedupStreamSink: MemoryStream batches keep what a batch dedup keeps") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val Wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    val Aiff = javax.sound.sampled.AudioFileFormat.Type.AIFF
    val ramp = Array.tabulate(65)(j => ((j + 1) * 300).toShort)
    val scaled = Array.tabulate(65)(j => ((j + 1) * 450).toShort)
    val flat = Array.fill(65)(1000.toShort)
    val dip = ramp.clone(); dip(1) = 150.toShort
    val batches: Seq[Seq[MediaRecord]] = Seq(
      Seq(
        MediaRecord(1L, graft.gates.LlmGates.encodeAudio(Wave, 8000, 1, ramp, bigEndian = false)),
        MediaRecord(2L, graft.gates.LlmGates.encodeAudio(Wave, 8000, 1, dip, bigEndian = false)), // within-batch copy
        MediaRecord(3L, "not audio".getBytes("UTF-8"))),
      Seq(
        MediaRecord(11L, graft.gates.LlmGates.encodeAudio(Aiff, 8000, 1, ramp, bigEndian = true)), // cross-batch re-encode
        MediaRecord(12L, graft.gates.LlmGates.encodeAudio(Wave, 8000, 1, scaled, bigEndian = false)), // volume-scaled copy
        MediaRecord(13L, graft.gates.LlmGates.encodeAudio(Wave, 8000, 1, flat, bigEndian = false)), // new
        MediaRecord(14L, "more text".getBytes("UTF-8"))))
    val idx = java.nio.file.Files
      .createTempDirectory("graft-astream-spec").toString + "/afp"
    val got = scala.collection.mutable.Buffer[Long]()
    val stream = MemoryStream[MediaRecord]
    val q = stream.toDS().writeStream
      .foreachBatch(Multimodal.audioDedupStreamSink(idx) { (survivors, _) =>
        got ++= survivors.collect().map(_.doc_id)
      })
      .start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val union = spark.createDataset(batches.flatten)
    val losers = Multimodal.audioNearDups(union, maxHamming = 3)
      .select("id_b").collect().map(_.getLong(0)).toSet
    val want = batches.flatten.map(_.doc_id).filterNot(losers).toSet
    assert(got.toSet == want, s"stream ${got.sorted} vs batch ${want.toSeq.sorted}")
    assert(got.toSet == Set(1L, 3L, 13L, 14L))
    // band-mismatched restart of a twin sink fails loud too (shared guard)
    val e = intercept[IllegalArgumentException] {
      Multimodal.audioDedupStreamSink(idx, bands = 2) { (_, _) => () }(
        spark.createDataset(batches.head), 9L)
    }
    assert(e.getMessage.contains("audioDedupStreamSink"), e.getMessage)
  }
}
