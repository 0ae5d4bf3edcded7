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
