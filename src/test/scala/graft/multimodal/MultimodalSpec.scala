package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.asMediaTable(Fixtures.table(spark, sf0001, "documents"), "doc_id", "text")

  test("media table schema: long id, kind enum, binary payload") {
    val s = media.schema
    assert(s("media_id").dataType.typeName == "long")
    assert(s("payload").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction: dim, byte counts, deterministic across runs") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length == media.count())
    assert(f1.forall(_.features.length == Multimodal.FeatureDim))
    // histogram is normalized by byte count -> sums to ~1
    assert(f1.forall(f => math.abs(f.features.sum - 1f) < 1e-3))
    assert(f1.zip(f2).forall { case (a, b) =>
      a.media_id == b.media_id && a.features.sameElements(b.features) &&
        a.width == b.width && a.height == b.height
    })
  }

  test("decode stub golden values") {
    val (w, h, feats) = Multimodal.MediaDecoder.decodeStub("ab".getBytes("UTF-8"))
    assert(w == 16 + ('a' & 0x3f) && h == 16 + ('b' & 0x3f))
    assert(feats.sum == 1.0f)
  }

  test("partition-batched path survives repartitioning (plumbing, not plan)") {
    val out = Multimodal.extractFeatures(media.repartition(8, col("media_id")))
      .collect().sortBy(_.media_id).map(_.n_bytes).toSeq
    val base = Multimodal.extractFeatures(media)
      .collect().sortBy(_.media_id).map(_.n_bytes).toSeq
    assert(out == base)
  }
}
