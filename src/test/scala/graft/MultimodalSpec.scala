package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.MultimodalPipeline
import graft.llm.MultimodalPipeline.{MediaFeatures, MediaRecord}

/** Spark-side plumbing tests for the stub-decoder multimodal pipeline:
  * schema, batch shape, determinism, partition independence. */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("extractFeatures preserves ids and emits fixed-width vectors") {
    val media = MultimodalPipeline.documentsAsMedia(spark, sfDir)
    val feats = MultimodalPipeline.extractFeatures(media).collect()
    assert(feats.length == media.count())
    assert(feats.forall(_.features.length == MultimodalPipeline.FeatDim))
    assert(feats.forall(f => f.n_bytes > 0))
    assert(feats.map(_.media_id).distinct.length == feats.length)
  }

  test("decode stub is deterministic and partition-count independent") {
    val media = MultimodalPipeline.documentsAsMedia(spark, sfDir)
    val once = MultimodalPipeline.extractFeatures(media)
      .collect().map(f => f.media_id -> f.checksum).toMap
    val repartitioned = MultimodalPipeline.extractFeatures(media.repartition(7))
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(once == repartitioned)
  }

  test("feature histogram is normalized") {
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
