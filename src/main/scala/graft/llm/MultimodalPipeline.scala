package graft.llm

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed multimodal decode/feature-extract pipeline.
  *
  * Models the shape of an image/audio feature stage on a 100 TB
  * corpus: an opaque `binary` payload column plus typed metadata,
  * processed per partition so the decoder amortizes its initialization
  * once per task (the reason this is `mapPartitions`, not a per-row
  * UDF). The decode is REAL for the two container formats the JDK
  * ships codecs for — PNG via `javax.imageio` (pixel statistics) and
  * PCM WAV via `javax.sound.sampled` (sample statistics) — and falls
  * back to a deterministic byte-histogram extractor for payloads that
  * are neither (text bytes, unknown formats): on a real corpus the
  * non-decodable row is data to quarantine, not an exception.
  *
  * Scale notes: payloads stream through one task at a time —
  * nothing is collected; feature width is fixed (FeatDim), so the
  * output is a stable columnar schema; partition count (and therefore
  * decoder-init count) is the input's, controllable upstream via
  * `spark.sql.files.maxPartitionBytes`.
  */
object MultimodalPipeline {

  /** Input record: opaque payload + typed metadata, the storage shape
    * for media columns (payload would be image/audio bytes). */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "text"
      payload: Array[Byte])

  /** Output record: fixed-width feature vector + provenance. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      features: Array[Float])

  val FeatDim = 8

  /** Rolling checksum over the raw payload — provenance, independent
    * of whether the payload decodes. */
  private def payloadChecksum(payload: Array[Byte]): Long = {
    var checksum = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      checksum = checksum * 31 + (payload(i) & 0xff)
      i += 1
    }
    checksum
  }

  /** Fallback extractor for non-media payloads (text bytes, unknown
    * containers, corrupt files): per-bucket byte histograms normalized
    * to [0,1). Deterministic in the bytes, so quarantined rows still
    * get a stable, comparable feature vector. */
  def byteHistogram(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Long](FeatDim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % FeatDim) += 1
      i += 1
    }
    val n = math.max(payload.length, 1)
    val feats = new Array[Float](FeatDim)
    i = 0
    while (i < FeatDim) { feats(i) = hist(i).toFloat / n; i += 1 }
    feats
  }

  /** REAL image decode via the JDK's PNG codec: full pixel pass,
    * returning [width, height, mean R, mean G, mean B, mean luma,
    * stddev luma, aspect ratio] with channel means in [0,1]. None if
    * the payload does not decode (wrong format, truncated file). */
  def decodeImage(payload: Array[Byte]): Option[Array[Float]] = {
    // NonFatal, not just IOException: ImageIO throws unchecked errors on
    // adversarial headers (e.g. IllegalArgumentException when IHDR
    // declares width*height > Int.MaxValue). A corrupt container is data
    // to quarantine, never a task-killing exception.
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val w = im.getWidth
      val h = im.getHeight
      var sr, sg, sb, sl, sl2 = 0.0
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        // bulk scanline read — per-pixel getRGB(x, y) pays a ColorModel
        // conversion call per pixel, several times slower for a full pass
        im.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          // ITU-R BT.601 luma weights
          val l = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += l; sl2 += l * l
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      val meanL = sl / n
      val varL = math.max(sl2 / n - meanL * meanL, 0.0)
      Array[Float](
        w.toFloat, h.toFloat,
        (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat,
        (sb / n / 255.0).toFloat, (meanL / 255.0).toFloat,
        (math.sqrt(varL) / 255.0).toFloat,
        w.toFloat / h.toFloat)
    }
  }

  /** REAL audio decode via the JDK's WAV reader: full sample pass over
    * the PCM frames, returning [channels, sample rate, bits/sample,
    * frame count, RMS, peak, zero-crossing rate, duration seconds]
    * with amplitudes normalized to [0,1] full scale. None if the
    * payload is not an audio stream the JDK can read. */
  def decodeAudio(payload: Array[Byte]): Option[Array[Float]] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch {
        case _: UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    Option(ais).flatMap { in =>
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val channels = fmt.getChannels
        val pcm = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        if (!pcm || (bits != 8 && bits != 16)) None
        else {
          val bytes = in.readAllBytes()
          val bytesPerSample = bits / 8
          val nSamples = bytes.length / bytesPerSample
          val fullScale = if (bits == 16) 32768.0 else 128.0
          var sum2 = 0.0
          var peak = 0.0
          var crossings = 0L
          var prevNeg = false
          var i = 0
          var s = 0
          while (s < nSamples) {
            val v =
              if (bits == 16) {
                val lo = bytes(i) & 0xff
                val hi = bytes(i + 1).toInt // WAV 16-bit is signed LE
                ((hi << 8) | lo).toDouble
              } else (bytes(i) & 0xff) - 128.0 // WAV 8-bit is unsigned
            val a = v / fullScale
            sum2 += a * a
            if (math.abs(a) > peak) peak = math.abs(a)
            val neg = a < 0
            if (s > 0 && neg != prevNeg) crossings += 1
            prevNeg = neg
            i += bytesPerSample
            s += 1
          }
          val frames = nSamples / math.max(channels, 1)
          val rms = if (nSamples > 0) math.sqrt(sum2 / nSamples) else 0.0
          val zcr = if (nSamples > 1) crossings.toDouble / (nSamples - 1) else 0.0
          Some(Array[Float](
            channels.toFloat, fmt.getSampleRate, bits.toFloat, frames.toFloat,
            rms.toFloat, peak.toFloat, zcr.toFloat,
            (frames / math.max(fmt.getSampleRate, 1.0f))))
        }
      } finally in.close()
    }
  }

  /** Decoder dispatch: container sniff ([[parseHeader]]) → codec →
    * fallback. The header parse is what keeps the fallback cheap at
    * scale — text/unknown payloads never enter a codec attempt. */
  def decode(payload: Array[Byte]): (Long, Array[Float]) = {
    val feats = parseHeader(payload)._1 match {
      case "png" => decodeImage(payload).getOrElse(byteHistogram(payload))
      case "wav" => decodeAudio(payload).getOrElse(byteHistogram(payload))
      case _ => byteHistogram(payload)
    }
    (payloadChecksum(payload), feats)
  }

  /** Typed container metadata parsed from real header bytes. */
  final case class MediaMeta(
      media_id: Long,
      format: String,  // "png" | "wav" | "unknown"
      width: Int,      // png: pixels; wav: channels; else -1
      height: Int,     // png: pixels; wav: bits/sample; else -1
      sample_rate: Int) // wav only; else -1

  /** Container-header parser: PNG IHDR (width/height, big-endian at
    * offsets 16/20 after the 8-byte signature) and RIFF/WAVE fmt
    * (channels/sample-rate/bits, little-endian at offsets 22/24/34).
    * This is the first stage of any media pipeline — dimension/rate
    * filtering happens *before* full decode, and needs no codec, only
    * the container spec. It also gates [[decode]]'s codec dispatch, so
    * non-media payloads never pay a codec attempt. */
  def parseHeader(payload: Array[Byte]): (String, Int, Int, Int) = {
    def be32(o: Int): Int =
      ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
    def le32(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
        ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    val pngMagic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (payload.length >= 24 && payload.take(8).sameElements(pngMagic))
      ("png", be32(16), be32(20), -1)
    else if (payload.length >= 12 &&
        payload.take(4).sameElements("RIFF".getBytes) &&
        payload.slice(8, 12).sameElements("WAVE".getBytes)) {
      // walk the chunk list for 'fmt ' — it need not be first (pro
      // audio tools emit bext/LIST/JUNK chunks ahead of it); chunks are
      // [tag:4][size:LE32][payload, word-aligned]
      // offsets tracked in Long: a declared chunk size near Int.MaxValue
      // must walk off the end (→ "unknown"), not wrap negative and index
      // out of bounds — corrupt containers are data, not exceptions
      var o = 12L
      var found = -1L
      while (found < 0 && o + 8 <= payload.length) {
        val size = le32(o.toInt + 4).toLong & 0xffffffffL
        if (payload.slice(o.toInt, o.toInt + 4).sameElements("fmt ".getBytes))
          found = o
        else o += 8 + size + (size & 1)
      }
      val fmtAt = found.toInt
      if (found >= 0 && found + 24 <= payload.length)
        ("wav", le16(fmtAt + 10), le16(fmtAt + 22), le32(fmtAt + 12))
      else ("unknown", -1, -1, -1)
    }
    else ("unknown", -1, -1, -1)
  }

  /** Header-metadata stage: the pre-decode filter pass of a media
    * pipeline (drop undersized images / wrong-rate audio before paying
    * for decode). Pure projection shape at scale. */
  def extractMeta(in: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import in.sparkSession.implicits._
    in.mapPartitions(_.map { r =>
      val (fmt, a, b, rate) = parseHeader(r.payload)
      MediaMeta(r.media_id, fmt, a, b, rate)
    })
  }

  /** The pipeline: one decoder "session" per partition, streamed rows. */
  def extractFeatures(in: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import in.sparkSession.implicits._
    in.mapPartitions { records =>
      // Per-task decoder init: ImageIO's disk-backed cache is wrong for
      // in-memory payload decode (a temp-file write per image); switch
      // it off once per task, not once per row. A codec with a real
      // native context would initialize here the same way.
      javax.imageio.ImageIO.setUseCache(false)
      records.map { r =>
        val (checksum, feats) = decode(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length, checksum, feats)
      }
    }
  }

  /** Documents table lifted into the media shape (text bytes as the
    * opaque payload) — the corpus-side adapter used by tests. */
  def documentsAsMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"), lit("text").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }
}
