package graft.multimodal

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("media table: binary payload round-trips, metadata deterministic") {
    val m = Multimodal.mediaFromDocuments(spark, sf).collect()
    assert(m.length == 500)
    m.foreach { r =>
      assert(r.bytes.nonEmpty)
      assert(Set("image", "audio", "video")(r.kind))
      assert(r.kind == Seq("image", "audio", "video")((r.media_id % 3).toInt))
    }
  }

  test("feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, sf)).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, sf)).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq, "features not deterministic")
    f1.foreach { r =>
      assert(r.entropy > 0 && r.entropy <= 8.0) // byte entropy bound
      assert(r.mean_byte > 0 && r.mean_byte < 256)
      assert(r.thumb_w <= 64 && r.thumb_h <= 64)
      if (r.kind != "video") assert(r.frames_sampled == 1)
    }
  }
}
