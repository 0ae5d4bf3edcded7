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
