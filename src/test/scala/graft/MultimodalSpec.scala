package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))

  test("frame sampling explodes 1→N with deterministic strides, no shuffle") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, everyK = 4)
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
    val byDoc = frames.collect().groupBy(_.doc_id)
    val m = media.collect().map(r => r.doc_id -> r.media.length).toMap
    byDoc.foreach { case (id, fs) =>
      val expected = (0 until math.max(1, m(id) / 16) by 4).toSeq
      assert(fs.map(_.frame_idx).sorted.toSeq == expected)
      assert(fs.forall(_.frame_bytes.length <= 16))
    }
  }

  test("resize stub halves metadata consistently with payload") {
    val resized = Multimodal.resizeStub(media, stride = 4).collect()
    val orig = media.collect().map(r => r.doc_id -> r).toMap
    resized.foreach { r =>
      val o = orig(r.doc_id)
      assert(r.media.length == (o.media.length + 3) / 4)
      assert(r.width == math.max(1, o.width / 4))
    }
  }

  test("feature extraction matches the decode stub row-by-row") {
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    media.collect().take(20).foreach { r =>
      val f = feats(r.doc_id)
      val want = Multimodal.decodeStub(r.media)
      assert(f.byte_len == r.media.length.toLong)
      assert(Seq(f.f1, f.f2, f.f3, f.f4) == want.toSeq)
    }
  }
}
