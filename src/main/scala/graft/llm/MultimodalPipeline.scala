package graft.llm

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed multimodal decode/feature-extract pipeline.
  *
  * Models the shape of an image/audio feature stage on a 100 TB
  * corpus: an opaque `binary` payload column plus typed metadata,
  * processed per partition so a real decoder could amortize native
  * library/model initialization once per task (the reason this is
  * `mapPartitions`, not a per-row UDF). The decode itself is STUBBED —
  * media codecs are not available in this environment — with a
  * deterministic byte-level extractor standing in; the Spark-side
  * plumbing (schema, encoders, partition-batched execution, feature
  * vector shape) is real and tested in MultimodalSpec.
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

  /** STUB decoder: stands in for image decode / audio resample /
    * frame sampling. Deterministic in the payload bytes: per-bucket
    * byte histograms normalized to [0,1), plus a rolling checksum.
    * A real implementation replaces only this function; the pipeline
    * around it is unchanged. */
  def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var checksum = 1125899906842597L
    val hist = new Array[Long](FeatDim)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      checksum = checksum * 31 + b
      hist(b % FeatDim) += 1
      i += 1
    }
    val n = math.max(payload.length, 1)
    val feats = new Array[Float](FeatDim)
    i = 0
    while (i < FeatDim) { feats(i) = hist(i).toFloat / n; i += 1 }
    (checksum, feats)
  }

  /** Typed container metadata parsed from real header bytes. */
  final case class MediaMeta(
      media_id: Long,
      format: String,  // "png" | "wav" | "unknown"
      width: Int,      // png: pixels; wav: channels; else -1
      height: Int,     // png: pixels; wav: bits/sample; else -1
      sample_rate: Int) // wav only; else -1

  /** REAL container-header parser — not a stub: PNG IHDR
    * (width/height, big-endian at offsets 16/20 after the 8-byte
    * signature) and RIFF/WAVE fmt (channels/sample-rate/bits,
    * little-endian at offsets 22/24/34). This is the first stage of
    * any media pipeline — dimension/rate filtering happens *before*
    * full decode, and needs no codec, only the container spec. The
    * full pixel/sample decode behind it remains [[decodeStub]]
    * (codecs unavailable here). */
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
      // A real decoder would initialize its native context here, once
      // per task, and close it when the iterator drains.
      records.map { r =>
        val (checksum, feats) = decodeStub(r.payload)
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
