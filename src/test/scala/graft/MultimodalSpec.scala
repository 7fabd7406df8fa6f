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

  test("PNG roundtrip: ImageIO decode returns exactly the encoded pattern") {
    Seq(0L, 1L, 7L, 123L, 9999L).foreach { id =>
      val png = Multimodal.encodePng(id)
      // real PNG container: magic bytes
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      val px = Multimodal.decodePngGray(png)
      val (w, h) = Multimodal.pngDims(id)
      assert(px.length == w * h)
      px.zipWithIndex.foreach { case (p, k) =>
        assert(p == Multimodal.pixelAt(id, k), s"doc $id pixel $k")
      }
    }
  }

  test("PNG feature extraction computes stats from actually-decoded pixels") {
    val feats = Multimodal.extractFeatures(
      Multimodal.pngMediaFromDocuments(Tables.documents(spark, sf)))
      .collect().map(f => f.doc_id -> f).toMap
    feats.keys.take(20).foreach { id =>
      val px = Multimodal.decodePngGray(Multimodal.encodePng(id))
      val (f1, f2, f3, f4) = Multimodal.grayFeatures(px)
      val f = feats(id)
      assert(f.kind == "image/png" && f.byte_len == px.length.toLong)
      assert(f.f1 == f1 && f.f2 == f2 && f.f3 == f3 && f.f4 == f4)
    }
    // sanity on the math itself for one hand-checked case: doc 0 is 4x3,
    // pixels 0,7,14,...,77 → mean 38.5
    val px0 = Multimodal.decodePngGray(Multimodal.encodePng(0L))
    assert(px0.toSeq == (0 until 12).map(k => (k * 7) % 256))
    assert(Multimodal.grayFeatures(px0)._1 == px0.sum.toDouble / 12)
  }

  test("WAV roundtrip: javax.sound decode returns exactly the encoded PCM pattern") {
    Seq(0L, 1L, 7L, 123L, 9999L).foreach { id =>
      val wav = Multimodal.encodeWav(id)
      // real RIFF/WAVE container: magic bytes
      assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
      assert(wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E')
      val ss = Multimodal.decodeWavPcm(wav)
      assert(ss.length == Multimodal.wavSamples(id))
      ss.zipWithIndex.foreach { case (s, k) =>
        assert(s == Multimodal.sampleAt(id, k), s"doc $id sample $k")
      }
    }
  }

  test("WAV feature extraction computes stats from actually-decoded samples") {
    val feats = Multimodal.extractFeatures(
      Multimodal.wavMediaFromDocuments(Tables.documents(spark, sf)))
      .collect().map(f => f.doc_id -> f).toMap
    feats.keys.take(20).foreach { id =>
      val ss = Multimodal.decodeWavPcm(Multimodal.encodeWav(id))
      val (f1, f2, f3, f4) = Multimodal.pcmFeatures(ss)
      val f = feats(id)
      assert(f.kind == "audio/wav" && f.byte_len == ss.length.toLong)
      assert(f.f1 == f1 && f.f2 == f2 && f.f3 == f3 && f.f4 == f4)
      // the normalized peak is a genuine amplitude in (0, 1]
      assert(f.f4 > 0.0 && f.f4 <= 1.0)
    }
  }

  test("PNG encode/decode happens on executors without a shuffle") {
    val feats = Multimodal.extractFeatures(
      Multimodal.pngMediaFromDocuments(Tables.documents(spark, sf)))
    assert(!feats.queryExecution.executedPlan.toString.contains("Exchange"))
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
