package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract runs per-partition in batches over a typed Dataset.
  *
  * IMAGE decode is REAL: `kind = "image/png"` payloads are actual PNG
  * bytes, decoded executor-side through `javax.imageio` (in the JDK),
  * and features (mean/std/histogram fractions of the gray channel) come
  * from the decoded pixels. The synthetic corpus encodes a
  * closed-form pixel pattern ([[pixelAt]]), so the DuckDB oracle can
  * recompute the decoded-pixel statistics exactly — the correctness
  * gate covers the full encode → PNG → decode → features path.
  *
  * AUDIO decode is REAL too: `kind = "audio/wav"` payloads are actual
  * RIFF/WAVE files (16-bit mono PCM) built and decoded through
  * `javax.sound.sampled` (in the JDK); features are mean/RMS/zero-
  * crossing-rate/peak of the decoded samples, oracle-checked the same
  * way ([[sampleAt]] closed form).
  *
  * VIDEO decode is REAL as well: `kind = "video/avi"` payloads are
  * actual RIFF/AVI containers carrying an MJPEG stream (one baseline
  * JPEG per frame), parsed chunk-by-chunk ([[decodeAviFrames]]) and
  * frame-decoded through the same `javax.imageio` JPEG codec players
  * use for MJPG. The synthetic frames are built from constant 8×8
  * blocks encoded at quality 1.0 — DC-only coefficients with a unit
  * quantizer — so the lossy codec roundtrips them exactly
  * (MultimodalSpec pins this) and the DuckDB oracle can recompute the
  * decoded statistics from the closed form [[videoBlockVal]].
  *
  * Shared plumbing is identical for all three kinds: the schema
  * (binary payload + metadata), the Encoder-backed Dataset, the
  * mapPartitions batch shape (codec handles amortized per PARTITION,
  * not per row), and the partitioning (features stay on the partition
  * that holds the bytes — no shuffle).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, kind: String, media: Array[Byte],
                         width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, kind: String, byte_len: Long,
                           f1: Double, f2: Double, f3: Double, f4: Double)

  /** One reusable ImageIO reader for `fmt` ("png"/"jpeg"). Allocating
    * the reader once per PARTITION (not per image) skips the
    * per-call service-provider scan, and the explicit memory-backed
    * input stream skips ImageIO's default disk-backed stream cache —
    * both are per-image constant costs that dominate tiny images. */
  def imageReader(fmt: String): javax.imageio.ImageReader = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
    require(it.hasNext, s"no ImageIO reader for $fmt")
    it.next()
  }

  /** Decode one image with a caller-owned reader (single-threaded use;
    * one per partition). */
  def readImageWith(reader: javax.imageio.ImageReader,
                    bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally iis.close()
  }

  private def graySamples(img: java.awt.image.BufferedImage): Array[Int] = {
    require(img != null, "undecodable image payload")
    val w = img.getWidth
    val out = new Array[Int](w * img.getHeight)
    val raster = img.getRaster
    var k = 0
    while (k < out.length) { out(k) = raster.getSample(k % w, k / w, 0); k += 1 }
    out
  }

  // ── real PNG codec path (javax.imageio) ───────────────────────────

  /** Deterministic gray value of pixel `k` (row-major) for document
    * `docId` — the closed form the oracle mirrors in SQL. */
  def pixelAt(docId: Long, k: Int): Int = ((docId * 31 + k * 7) % 256).toInt

  /** Small varied dimensions so row groups mix image sizes. */
  def pngDims(docId: Long): (Int, Int) =
    ((4 + docId % 5).toInt, (3 + docId % 4).toInt)

  /** One reusable PNG writer — allocated once per partition like
    * [[imageReader]]/[[jpegWriter]]. */
  def pngWriter(): javax.imageio.ImageWriter =
    javax.imageio.ImageIO.getImageWritersByFormatName("png").next()

  /** Encode one image with a caller-owned writer through a
    * memory-backed stream (no provider lookup, no disk stream cache). */
  def writePngWith(writer: javax.imageio.ImageWriter,
                   img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(img)
    ios.close()
    bos.toByteArray
  }

  /** REAL encode: the pattern as an actual PNG via the JDK's ImageIO.
    * PNG is lossless, so decode returns exactly [[pixelAt]] values. */
  def encodePng(docId: Long): Array[Byte] =
    encodePngWith(pngWriter(), docId)

  def encodePngWith(writer: javax.imageio.ImageWriter, docId: Long): Array[Byte] = {
    val (w, h) = pngDims(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var k = 0
    while (k < w * h) { raster.setSample(k % w, k / w, 0, pixelAt(docId, k)); k += 1 }
    writePngWith(writer, img)
  }

  /** REAL decode: PNG bytes → gray samples, row-major. Standalone form
    * (fresh reader); hot paths thread a per-partition reader through
    * [[decodePngGrayWith]]. */
  def decodePngGray(bytes: Array[Byte]): Array[Int] =
    decodePngGrayWith(imageReader("png"), bytes)

  def decodePngGrayWith(reader: javax.imageio.ImageReader,
                        bytes: Array[Byte]): Array[Int] =
    graySamples(readImageWith(reader, bytes))

  /** Decoded-pixel features in exact-integer-then-IEEE arithmetic (the
    * oracle repeats the identical op sequence, so doubles match
    * bit-for-bit): mean, population std, fraction < 128, fraction ≥ 192. */
  def grayFeatures(px: Array[Int]): (Double, Double, Double, Double) = {
    val n = px.length
    var sum = 0L; var sumSq = 0L; var low = 0L; var high = 0L
    var i = 0
    while (i < n) {
      val p = px(i)
      sum += p
      sumSq += p.toLong * p
      if (p < 128) low += 1
      if (p >= 192) high += 1
      i += 1
    }
    val nd = n.toDouble
    val mean = sum.toDouble / nd
    val variance = (sumSq.toDouble - sum.toDouble * sum.toDouble / nd) / nd
    (mean, math.sqrt(variance), low.toDouble / nd, high.toDouble / nd)
  }

  // ── real WAV codec path (javax.sound.sampled) ─────────────────────

  /** Deterministic signed 16-bit PCM sample `k` for document `docId` —
    * the closed form the oracle mirrors in SQL. */
  def sampleAt(docId: Long, k: Int): Int =
    (((docId * 37 + k * 11) % 65536) - 32768).toInt

  /** Varied clip lengths (200–299 samples) so batches mix sizes. */
  def wavSamples(docId: Long): Int = (200 + docId % 100).toInt

  /** REAL encode: the PCM pattern as an actual RIFF/WAVE file via the
    * JDK's javax.sound.sampled (16-bit mono little-endian, 8 kHz).
    * WAV PCM is lossless, so decode returns exactly [[sampleAt]]. */
  def encodeWav(docId: Long): Array[Byte] = {
    val n = wavSamples(docId)
    val pcm = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val s = sampleAt(docId, k)
      pcm(2 * k) = (s & 0xff).toByte
      pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL decode: WAV bytes → signed 16-bit samples. */
  def decodeWavPcm(bytes: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian && fmt.getChannels == 1,
      s"unexpected wav format: $fmt")
    val raw = ais.readAllBytes()
    val out = new Array[Int](raw.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = (raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)
      i += 1
    }
    out
  }

  /** Decoded-sample features, exact-integer sums then IEEE ops (the
    * oracle repeats the identical sequence): mean, RMS, zero-crossing
    * rate, normalized peak. */
  def pcmFeatures(ss: Array[Int]): (Double, Double, Double, Double) = {
    val n = ss.length
    var sum = 0L; var sumSq = 0L; var cross = 0L; var peak = 0L
    var i = 0
    while (i < n) {
      val s = ss(i)
      sum += s
      sumSq += s.toLong * s
      val a = math.abs(s.toLong); if (a > peak) peak = a
      if (i > 0 && ((ss(i - 1) < 0) != (s < 0))) cross += 1
      i += 1
    }
    val nd = n.toDouble
    (sum.toDouble / nd, math.sqrt(sumSq.toDouble / nd),
      cross.toDouble / (n - 1).toDouble, peak.toDouble / 32768.0)
  }

  // ── real MJPEG-in-AVI codec path (RIFF container + ImageIO JPEG) ──

  /** Frames per clip (2–5) and frame dims (16×8 or 24×8) vary per doc
    * so batches mix sizes; dims are multiples of the JPEG 8×8 block. */
  def videoFrameCount(docId: Long): Int = (2 + docId % 4).toInt
  def videoDims(docId: Long): (Int, Int) = ((16 + 8 * (docId % 2)).toInt, 8)

  /** Deterministic gray value of constant 8×8 block `b` of frame `f` —
    * the closed form the oracle mirrors in SQL. Constant blocks have
    * DC-only DCTs, and at quality 1.0 the DC quantizer is 1, so the
    * lossy JPEG roundtrip is exact for them (spec-pinned). */
  def videoBlockVal(docId: Long, f: Int, b: Int): Int =
    ((docId * 13 + f * 41 + b * 17) % 256).toInt

  /** One reusable JPEG writer pinned at quality 1.0 — like
    * [[imageReader]], allocated once per partition, not per frame. */
  def jpegWriter(): javax.imageio.ImageWriter =
    javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()

  private def encodeFrameJpegWith(writer: javax.imageio.ImageWriter,
                                  docId: Long, f: Int): Array[Byte] = {
    val (w, h) = videoDims(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var x = 0
    while (x < w) {
      val v = videoBlockVal(docId, f, x / 8)
      var y = 0
      while (y < h) { raster.setSample(x, y, 0, v); y += 1 }
      x += 1
    }
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close()
    bos.toByteArray
  }

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    cc(id) ++ le32(body.length.toLong) ++ body ++ pad
  }
  private def riffList(listType: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", cc(listType) ++ body)

  /** REAL encode: an actual RIFF/AVI file (avih + vids/MJPG strh/strf
    * headers, movi list of 00dc JPEG chunks, idx1 index) any AVI-aware
    * player can open. */
  def encodeAviMjpeg(docId: Long): Array[Byte] =
    encodeAviMjpegWith(jpegWriter(), docId)

  def encodeAviMjpegWith(writer: javax.imageio.ImageWriter,
                         docId: Long): Array[Byte] = {
    val (w, h) = videoDims(docId)
    val nF = videoFrameCount(docId)
    val frames = (0 until nF).map(f => encodeFrameJpegWith(writer, docId, f))
    val maxF = frames.map(_.length).max
    val avih = le32(100000L) ++ le32(maxF * 10L) ++ le32(0L) ++ le32(0x10L) ++
      le32(nF.toLong) ++ le32(0L) ++ le32(1L) ++ le32(maxF.toLong) ++
      le32(w.toLong) ++ le32(h.toLong) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L)
    val strh = cc("vids") ++ cc("MJPG") ++ le32(0L) ++ le16(0) ++ le16(0) ++
      le32(0L) ++ le32(1L) ++ le32(10L) ++ le32(0L) ++ le32(nF.toLong) ++
      le32(maxF.toLong) ++ le32(0xffffffffL) ++ le32(0L) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40L) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++
      le16(24) ++ cc("MJPG") ++ le32(w.toLong * h * 3) ++
      le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L)
    val hdrl = riffList("hdrl", riffChunk("avih", avih) ++
      riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", strf)))
    val movi = riffList("movi", frames.flatMap(riffChunk("00dc", _)).toArray)
    var off = 4L
    val idx = frames.flatMap { fb =>
      val e = cc("00dc") ++ le32(0x10L) ++ le32(off) ++ le32(fb.length.toLong)
      off += 8 + fb.length + (fb.length % 2)
      e
    }.toArray
    val body = cc("AVI ") ++ hdrl ++ movi ++ riffChunk("idx1", idx)
    cc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def tagAt(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** REAL decode: walk the RIFF chunk tree to the movi list, pull each
    * video chunk's JPEG payload, and decode it with the shared ImageIO
    * reader → one gray-sample array per frame. */
  def decodeAviFramesWith(reader: javax.imageio.ImageReader,
                          bytes: Array[Byte]): Array[Array[Int]] = {
    require(bytes.length >= 12 && tagAt(bytes, 0) == "RIFF" &&
      tagAt(bytes, 8) == "AVI ", "not a RIFF/AVI payload")
    val frames = Array.newBuilder[Array[Int]]
    var p = 12
    while (p + 8 <= bytes.length) {
      val id = tagAt(bytes, p)
      val sz = leU32(bytes, p + 4).toInt
      if (id == "LIST" && tagAt(bytes, p + 8) == "movi") {
        var q = p + 12
        val end = p + 8 + sz
        while (q + 8 <= end) {
          val cid = tagAt(bytes, q)
          val csz = leU32(bytes, q + 4).toInt
          if (cid.endsWith("dc") || cid.endsWith("db")) {
            val payload = java.util.Arrays.copyOfRange(bytes, q + 8, q + 8 + csz)
            frames += graySamples(readImageWith(reader, payload))
          }
          q += 8 + csz + (csz % 2)
        }
      }
      p += 8 + sz + (sz % 2)
    }
    val out = frames.result()
    require(out.nonEmpty, "AVI payload has no video frames")
    out
  }

  def decodeAviFrames(bytes: Array[Byte]): Array[Array[Int]] =
    decodeAviFramesWith(imageReader("jpeg"), bytes)

  /** Decoded-frame features, exact-integer sums then IEEE ops in the
    * order the oracle repeats: mean, population std, and fraction < 128
    * over ALL frames' pixels, plus a temporal feature — mean absolute
    * per-pixel delta between consecutive frames (motion energy). */
  def videoFeatures(frames: Array[Array[Int]]): (Long, Double, Double, Double, Double) = {
    var sum = 0L; var sumSq = 0L; var low = 0L; var n = 0L
    frames.foreach { px =>
      var i = 0
      while (i < px.length) {
        val v = px(i)
        sum += v; sumSq += v.toLong * v; if (v < 128) low += 1
        i += 1
      }
      n += px.length
    }
    var motion = 0L
    var f = 1
    while (f < frames.length) {
      val a = frames(f - 1); val b = frames(f)
      var i = 0
      while (i < a.length) { motion += math.abs(b(i) - a(i)).toLong; i += 1 }
      f += 1
    }
    val nd = n.toDouble
    val mean = sum.toDouble / nd
    val variance = (sumSq.toDouble - sum.toDouble * sum.toDouble / nd) / nd
    val f4 =
      if (frames.length < 2) 0.0
      else motion.toDouble / (frames(0).length.toLong * (frames.length - 1)).toDouble
    (n, mean, math.sqrt(variance), low.toDouble / nd, f4)
  }

  /** Media table of REAL MJPEG AVIs, encoded executor-side like the
    * PNG/WAV tables. width×height are the frame dims. */
  def aviMediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      lazy val writer = jpegWriter()
      it.map { id =>
        val (w, h) = videoDims(id)
        MediaRecord(id, "video/avi", encodeAviMjpegWith(writer, id), w, h)
      }
    }
  }

  /** Media table of REAL WAV clips, encoded executor-side like the PNG
    * table. width carries the sample count, height the channel count. */
  def wavMediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        MediaRecord(id, "audio/wav", encodeWav(id), wavSamples(id), 1)
      }
    }
  }

  /** Media table of REAL PNGs: bytes are encoded executor-side in the
    * partition that will carry them — no driver work, no shuffle. */
  def pngMediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      lazy val writer = pngWriter()
      it.map { id =>
        val (w, h) = pngDims(id)
        MediaRecord(id, "image/png", encodePngWith(writer, id), w, h)
      }
    }
  }

  /** PNG media with PLANTED exact duplicates: every document's payload
    * encodes the pattern of its CANONICAL id (`doc_id % mod`), so docs
    * sharing a canonical id carry byte-identical PNGs — the fixture for
    * perceptual-hash image dedup, where the ground-truth duplicate
    * groups are known but the engine must recover them from DECODED
    * pixels, not from the ids. */
  def pngMediaCanonical(docs: DataFrame, mod: Int): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      lazy val writer = pngWriter()
      it.map { id =>
        val c = id % mod
        val (w, h) = pngDims(c)
        MediaRecord(id, "image/png", encodePngWith(writer, c), w, h)
      }
    }
  }

  /** Average-hash over the DECODED gray pixels: bit k is set iff pixel k
    * sits at or above the image mean, packed little-endian into one
    * long (images here are ≤ 8×6 = 48 px, so every pixel gets a bit —
    * the tiny-image limit of the classic 8×8 aHash). The threshold
    * compares in INTEGERS (`pix·n ≥ Σpix`), so the bit pattern is
    * exactly reproducible from the closed-form oracle with no float
    * mean anywhere. Decode runs per-partition with a reusable reader,
    * like every codec path here — no shuffle, no driver. */
  def averageHash(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      lazy val reader = imageReader("png")
      it.map { r =>
        val px = graySamples(readImageWith(reader, r.media))
        // every pixel gets a bit, so the image must fit one long —
        // larger images need the classic 8×8 downsample FIRST (average
        // pooling), which this corpus's ≤8×6 images never reach.
        // Fail loudly instead of silently wrapping the shift.
        require(px.length <= 63,
          s"averageHash: ${px.length} pixels exceed the 63-bit budget; " +
            "downsample to 8x8 before hashing")
        val n = px.length.toLong
        val sum = px.foldLeft(0L)(_ + _)
        var hash = 0L
        var k = 0
        while (k < px.length) {
          if (px(k) * n >= sum) hash |= (1L << k)
          k += 1
        }
        (r.doc_id, hash)
      }
    }.toDF("doc_id", "phash")
  }

  /** Build a media table from `documents`: payload = UTF-8 bytes of the
    * text (stand-in for real image bytes), metadata derived from size. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      lit("image/fake").as("kind"),
      col("text").cast("binary").as("media"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** Per-partition batched feature extraction. Codec handles (ImageIO
    * readers) are allocated lazily ONCE per partition and reused across
    * every row — the per-image cost is pure decode, no provider lookup
    * and no disk-backed stream cache. Rows stream through in batches
    * without materializing the partition. byte_len reports the DECODED
    * payload size (pixels / samples), not the container size. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      lazy val pngReader = imageReader("png")
      lazy val jpegReader = imageReader("jpeg")
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          r.kind match {
            case "image/png" =>
              val px = decodePngGrayWith(pngReader, r.media)
              val (f1, f2, f3, f4) = grayFeatures(px)
              MediaFeatures(r.doc_id, r.kind, px.length.toLong, f1, f2, f3, f4)
            case "audio/wav" =>
              val ss = decodeWavPcm(r.media)
              val (f1, f2, f3, f4) = pcmFeatures(ss)
              MediaFeatures(r.doc_id, r.kind, ss.length.toLong, f1, f2, f3, f4)
            case "video/avi" =>
              val frames = decodeAviFramesWith(jpegReader, r.media)
              val (n, f1, f2, f3, f4) = videoFeatures(frames)
              MediaFeatures(r.doc_id, r.kind, n, f1, f2, f3, f4)
            case other =>
              throw new IllegalArgumentException(s"no codec for kind $other")
          }
        }
      }
    }
  }

  case class FrameRecord(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Byte-window sampling: one output row per every-kth fixed-size
    * window of the raw payload (the shard/chunk view a downstream
    * tokenizer or hasher consumes). The plumbing — 1→N row explosion
    * that stays on the partition holding the bytes, no shuffle — is
    * shared with [[sampleAviFrames]], which does the same over REAL
    * decoded video frames. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 16,
                   everyK: Int = 4): Dataset[FrameRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = math.max(1, r.media.length / frameBytes)
        (0 until nFrames by everyK).iterator.map { i =>
          FrameRecord(r.doc_id, i,
            r.media.slice(i * frameBytes, math.min((i + 1) * frameBytes, r.media.length)))
        }
      }
    }
  }

  case class FrameStat(doc_id: Long, frame_idx: Int, n_px: Long,
                       mean: Double, frac_low: Double)

  /** REAL video frame sampling: decode the AVI container, keep every
    * k-th decoded frame, emit its pixel statistics. Same 1→N no-shuffle
    * explosion as [[sampleFrames]], but over actual MJPEG frames; the
    * JPEG reader is reused across the whole partition. */
  def sampleAviFrames(media: Dataset[MediaRecord], everyK: Int = 2): Dataset[FrameStat] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      lazy val jpegReader = imageReader("jpeg")
      it.flatMap { r =>
        val frames = decodeAviFramesWith(jpegReader, r.media)
        (0 until frames.length by everyK).iterator.map { i =>
          val px = frames(i)
          var sum = 0L; var low = 0L; var j = 0
          while (j < px.length) {
            sum += px(j); if (px(j) < 128) low += 1; j += 1
          }
          FrameStat(r.doc_id, i, px.length.toLong,
            sum.toDouble / px.length.toDouble,
            low.toDouble / px.length.toDouble)
        }
      }
    }
  }

  /** REAL image resize: decode each PNG, nearest-neighbor downsample by
    * `stride` in both dims, re-encode as PNG with metadata kept
    * consistent. One PNG reader serves the whole partition. */
  def resizeImages(media: Dataset[MediaRecord], stride: Int = 2): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      lazy val pngReader = imageReader("png")
      lazy val writer = pngWriter()
      it.map { r =>
        val img = readImageWith(pngReader, r.media)
        val ow = math.max(1, (img.getWidth + stride - 1) / stride)
        val oh = math.max(1, (img.getHeight + stride - 1) / stride)
        val out = new java.awt.image.BufferedImage(
          ow, oh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val src = img.getRaster; val dst = out.getRaster
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            dst.setSample(x, y, 0, src.getSample(x * stride, y * stride, 0))
            x += 1
          }
          y += 1
        }
        r.copy(media = writePngWith(writer, out), width = ow, height = oh)
      }
    }
  }
}
