package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.MultimodalPipeline
import graft.llm.MultimodalPipeline.{MediaFeatures, MediaRecord}

/** Multimodal pipeline tests: real PNG/WAV decode through the JDK
  * codecs, plus Spark-side plumbing — schema, batch shape, determinism,
  * partition independence. */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  /** Encode a 2x2 PNG with known pixel colors via the JDK codec. */
  private def pngBytes(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, pixels, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("adversarial PNG header is quarantined, not a task-killing throw") {
    // valid PNG signature + IHDR declaring 65500x65500: ImageIO throws
    // an UNCHECKED IllegalArgumentException (width*height overflows the
    // raster), which decode must swallow into the None/quarantine path
    val good = pngBytes(Array(0xff0000), 1, 1)
    val evil = good.clone()
    // IHDR width at offset 16, height at 20 (big-endian)
    def put(off: Int, v: Int): Unit = {
      evil(off) = (v >>> 24).toByte; evil(off + 1) = (v >>> 16).toByte
      evil(off + 2) = (v >>> 8).toByte; evil(off + 3) = v.toByte
    }
    put(16, 65500); put(20, 65500)
    assert(MultimodalPipeline.decodeImage(evil).isEmpty,
      "huge-dimension header must quarantine")
  }

  /** Encode 16-bit mono PCM samples as a WAV via the JDK writer. */
  private def wavBytes(samples: Array[Short], rate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false) // signed LE mono
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real PNG decode extracts pixel statistics") {
    // 2x2: red, green, blue, white — channel means are exactly
    // (1+0+0+1)/4 = 0.5 each, width/height 2, aspect 1
    val png = pngBytes(Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff), 2, 2)
    val f = MultimodalPipeline.decodeImage(png).get
    assert(f(0) == 2.0f && f(1) == 2.0f, "width/height")
    assert(math.abs(f(2) - 0.5f) < 1e-6, s"mean R ${f(2)}")
    assert(math.abs(f(3) - 0.5f) < 1e-6, s"mean G ${f(3)}")
    assert(math.abs(f(4) - 0.5f) < 1e-6, s"mean B ${f(4)}")
    assert(f(6) > 0.0f, "luma stddev positive for mixed pixels")
    assert(f(7) == 1.0f, "aspect ratio")
  }

  test("real WAV decode extracts sample statistics") {
    // Full-scale square wave at 8 kHz alternating every sample:
    // RMS = peak = 1 (32768/32768 on the negative rail dominates
    // rounding), zero-crossing rate = 1 (every adjacent pair crosses)
    val n = 800
    val samples = Array.tabulate[Short](n)(i =>
      if (i % 2 == 0) 32767 else -32768)
    val wav = wavBytes(samples, 8000f)
    val f = MultimodalPipeline.decodeAudio(wav).get
    assert(f(0) == 1.0f, "mono")
    assert(f(1) == 8000f, "sample rate")
    assert(f(2) == 16f, "bits per sample")
    assert(f(3) == n.toFloat, "frame count")
    assert(math.abs(f(4) - 1.0f) < 1e-3, s"RMS ${f(4)}")
    assert(math.abs(f(5) - 1.0f) < 1e-3, s"peak ${f(5)}")
    assert(math.abs(f(6) - 1.0f) < 1e-2, s"zero-crossing rate ${f(6)}")
    assert(math.abs(f(7) - 0.1f) < 1e-6, s"duration ${f(7)}")
    // silence for contrast: RMS/peak/zcr all zero
    val silent = MultimodalPipeline.decodeAudio(
      wavBytes(Array.fill[Short](100)(0), 8000f)).get
    assert(silent(4) == 0f && silent(5) == 0f && silent(6) == 0f)
  }

  test("extractFeatures decodes media payloads end-to-end in Spark") {
    import spark.implicits._
    val png = pngBytes(Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff), 2, 2)
    val wav = wavBytes(Array.tabulate[Short](800)(i =>
      if (i % 2 == 0) 32767 else -32768), 8000f)
    val in = spark.createDataset(Seq(
      MediaRecord(1L, "image", png),
      MediaRecord(2L, "audio", wav),
      MediaRecord(3L, "text", "plain text payload".getBytes)))
    val out = MultimodalPipeline.extractFeatures(in)
      .collect().map(f => f.media_id -> f).toMap
    // image row carries pixel-derived features, not a byte histogram
    assert(out(1L).features(0) == 2.0f && out(1L).features(1) == 2.0f)
    // audio row carries sample-derived features
    assert(out(2L).features(1) == 8000f && math.abs(out(2L).features(4) - 1f) < 1e-3)
    // text row falls back to the normalized byte histogram
    assert(math.abs(out(3L).features.map(_.toDouble).sum - 1.0) < 0.01)
  }

  test("extractFeatures preserves ids and emits fixed-width vectors") {
    val media = MultimodalPipeline.documentsAsMedia(spark, sfDir)
    val feats = MultimodalPipeline.extractFeatures(media).collect()
    assert(feats.length == media.count())
    assert(feats.forall(_.features.length == MultimodalPipeline.FeatDim))
    assert(feats.forall(f => f.n_bytes > 0))
    assert(feats.map(_.media_id).distinct.length == feats.length)
  }

  test("decode is deterministic and partition-count independent") {
    val media = MultimodalPipeline.documentsAsMedia(spark, sfDir)
    val once = MultimodalPipeline.extractFeatures(media)
      .collect().map(f => f.media_id -> f.checksum).toMap
    val repartitioned = MultimodalPipeline.extractFeatures(media.repartition(7))
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(once == repartitioned)
  }

  test("text payload fallback histogram is normalized") {
    val feats = MultimodalPipeline.extractFeatures(
      MultimodalPipeline.documentsAsMedia(spark, sfDir)).head(20)
    feats.foreach { f =>
      val s = f.features.map(_.toDouble).sum
      assert(s > 0.99 && s <= 1.01, s"histogram sums to $s")
    }
  }

  test("header parser reads real PNG and WAV container bytes") {
    import spark.implicits._
    // A minimal valid PNG signature + IHDR: 640x480
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0x80, /* width 640 */ 0, 0, 1, 0xE0 /* height 480 */)
      .map(_.toByte)
    // A minimal RIFF/WAVE fmt chunk: stereo, 44100 Hz, 16-bit
    val wav = new Array[Byte](44)
    "RIFF".getBytes.copyToArray(wav, 0)
    "WAVE".getBytes.copyToArray(wav, 8)
    "fmt ".getBytes.copyToArray(wav, 12)
    wav(22) = 2 // channels (LE16)
    wav(24) = 0x44.toByte; wav(25) = 0xAC.toByte // 44100 (LE32)
    wav(34) = 16 // bits/sample (LE16)
    // WAV with a JUNK chunk BEFORE fmt (pro-audio layout): the parser
    // must walk the chunk list, not assume fmt at offset 12
    val wav2 = new Array[Byte](64)
    "RIFF".getBytes.copyToArray(wav2, 0)
    "WAVE".getBytes.copyToArray(wav2, 8)
    "JUNK".getBytes.copyToArray(wav2, 12)
    wav2(16) = 4 // JUNK size (LE32) -> fmt starts at 24
    "fmt ".getBytes.copyToArray(wav2, 24)
    wav2(28) = 16 // fmt size
    wav2(34) = 1 // mono (LE16 at fmt+10)
    wav2(36) = 0x80.toByte; wav2(37) = 0x3E.toByte // 16000 Hz (LE32 at fmt+12)
    wav2(46) = 24 // bits/sample (LE16 at fmt+22)
    val media = Seq(
      MediaRecord(1L, "image", png),
      MediaRecord(2L, "audio", wav),
      MediaRecord(3L, "text", "not a container".getBytes),
      MediaRecord(4L, "audio", wav2)).toDS()
    val meta = MultimodalPipeline.extractMeta(media).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(1L).format == "png" && meta(1L).width == 640 && meta(1L).height == 480)
    assert(meta(2L).format == "wav" && meta(2L).width == 2 &&
      meta(2L).height == 16 && meta(2L).sample_rate == 44100)
    assert(meta(3L).format == "unknown" && meta(3L).sample_rate == -1)
    assert(meta(4L).format == "wav" && meta(4L).width == 1 &&
      meta(4L).height == 24 && meta(4L).sample_rate == 16000)
  }

  test("synthetic binary payloads round-trip the typed schema") {
    import spark.implicits._
    val in = spark.createDataset(Seq(
      MediaRecord(1L, "image", Array[Byte](1, 2, 3, 4)),
      MediaRecord(2L, "audio", Array[Byte](9, 9)),
      MediaRecord(3L, "image", Array.empty[Byte])))
    val out: Array[MediaFeatures] =
      MultimodalPipeline.extractFeatures(in).collect().sortBy(_.media_id)
    assert(out.map(_.n_bytes).toSeq == Seq(4, 2, 0))
    assert(out.forall(_.features.length == MultimodalPipeline.FeatDim))
  }
}
