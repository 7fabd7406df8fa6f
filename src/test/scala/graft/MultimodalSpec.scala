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

  test("real PNG resize: decoded output is the nearest-neighbor subsample") {
    val pngs = Multimodal.pngMediaFromDocuments(Tables.documents(spark, sf))
    val resized = Multimodal.resizeImages(pngs, stride = 2).collect()
      .map(r => r.doc_id -> r).toMap
    resized.keys.take(10).foreach { id =>
      val (w, h) = Multimodal.pngDims(id)
      val r = resized(id)
      assert(r.width == (w + 1) / 2 && r.height == (h + 1) / 2)
      val px = Multimodal.decodePngGray(r.media)
      assert(px.length == r.width * r.height)
      for (y <- 0 until r.height; x <- 0 until r.width)
        assert(px(y * r.width + x) ==
          Multimodal.pixelAt(id, (y * 2) * w + x * 2), s"doc $id ($x,$y)")
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

  test("AVI roundtrip: MJPEG frames decode to exactly the encoded block pattern") {
    Seq(0L, 1L, 7L, 123L, 9999L).foreach { id =>
      val avi = Multimodal.encodeAviMjpeg(id)
      // real RIFF/AVI container: magic bytes
      assert(avi(0) == 'R' && avi(1) == 'I' && avi(2) == 'F' && avi(3) == 'F')
      assert(avi(8) == 'A' && avi(9) == 'V' && avi(10) == 'I' && avi(11) == ' ')
      val frames = Multimodal.decodeAviFrames(avi)
      val (w, h) = Multimodal.videoDims(id)
      assert(frames.length == Multimodal.videoFrameCount(id))
      frames.zipWithIndex.foreach { case (px, f) =>
        assert(px.length == w * h)
        px.zipWithIndex.foreach { case (p, k) =>
          val want = Multimodal.videoBlockVal(id, f, (k % w) / 8)
          assert(p == want, s"doc $id frame $f pixel $k: got $p want $want")
        }
      }
    }
  }

  test("video feature extraction computes stats from actually-decoded frames") {
    val feats = Multimodal.extractFeatures(
      Multimodal.aviMediaFromDocuments(Tables.documents(spark, sf)))
      .collect().map(f => f.doc_id -> f).toMap
    feats.keys.take(20).foreach { id =>
      val frames = Multimodal.decodeAviFrames(Multimodal.encodeAviMjpeg(id))
      val (n, f1, f2, f3, f4) = Multimodal.videoFeatures(frames)
      val f = feats(id)
      assert(f.kind == "video/avi" && f.byte_len == n)
      assert(f.f1 == f1 && f.f2 == f2 && f.f3 == f3 && f.f4 == f4)
    }
  }

  test("real AVI frame sampling emits every k-th decoded frame, no shuffle") {
    val clips = Multimodal.aviMediaFromDocuments(Tables.documents(spark, sf))
    val stats = Multimodal.sampleAviFrames(clips, everyK = 2)
    assert(!stats.queryExecution.executedPlan.toString.contains("Exchange"))
    val byDoc = stats.collect().groupBy(_.doc_id)
    byDoc.keys.take(10).foreach { id =>
      val fs = byDoc(id).sortBy(_.frame_idx)
      val (w, h) = Multimodal.videoDims(id)
      assert(fs.map(_.frame_idx).toSeq ==
        (0 until Multimodal.videoFrameCount(id) by 2).toSeq)
      fs.foreach { st =>
        val px = (0 until w * h).map(k =>
          Multimodal.videoBlockVal(id, st.frame_idx, (k % w) / 8))
        assert(st.n_px == (w * h).toLong)
        assert(st.mean == px.sum.toDouble / px.length.toDouble)
      }
    }
  }

  test("unknown media kind fails loudly instead of silently faking features") {
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(media).collect()
    }
    assert(ex.getMessage.contains("no codec") ||
      Option(ex.getCause).exists(_.getMessage.contains("no codec")))
  }
}
