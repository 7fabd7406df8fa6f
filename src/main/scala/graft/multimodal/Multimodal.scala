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
  * Kinds with no codec in this container (video) keep the
  * clearly-marked [[decodeStub]]. Shared plumbing is real and tested
  * either way: the schema (binary payload + metadata), the
  * Encoder-backed Dataset, the mapPartitions batch shape (decode
  * amortized per batch, not per row), and the partitioning (features
  * stay on the partition that holds the bytes — no shuffle).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, kind: String, media: Array[Byte],
                         width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, kind: String, byte_len: Long,
                           f1: Double, f2: Double, f3: Double, f4: Double)

  /** STUB: a real pipeline plugs a codec here (JPEG decode, audio
    * resample, video frame-sample). Deterministic fake: the first 4
    * bytes as unsigned values — enough to prove the data path. */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val f = new Array[Double](4)
    var i = 0
    while (i < 4) { f(i) = if (i < bytes.length) (bytes(i) & 0xff).toDouble else 0.0; i += 1 }
    f
  }

  // ── real PNG codec path (javax.imageio) ───────────────────────────

  /** Deterministic gray value of pixel `k` (row-major) for document
    * `docId` — the closed form the oracle mirrors in SQL. */
  def pixelAt(docId: Long, k: Int): Int = ((docId * 31 + k * 7) % 256).toInt

  /** Small varied dimensions so row groups mix image sizes. */
  def pngDims(docId: Long): (Int, Int) =
    ((4 + docId % 5).toInt, (3 + docId % 4).toInt)

  /** REAL encode: the pattern as an actual PNG via the JDK's ImageIO.
    * PNG is lossless, so decode returns exactly [[pixelAt]] values. */
  def encodePng(docId: Long): Array[Byte] = {
    val (w, h) = pngDims(docId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var k = 0
    while (k < w * h) { raster.setSample(k % w, k / w, 0, pixelAt(docId, k)); k += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode: PNG bytes → gray samples, row-major. */
  def decodePngGray(bytes: Array[Byte]): Array[Int] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val w = img.getWidth
    val out = new Array[Int](w * img.getHeight)
    val raster = img.getRaster
    var k = 0
    while (k < out.length) { out(k) = raster.getSample(k % w, k / w, 0); k += 1 }
    out
  }

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
      it.map { id =>
        val (w, h) = pngDims(id)
        MediaRecord(id, "image/png", encodePng(id), w, h)
      }
    }
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

  /** Per-partition batched feature extraction. The batch loop is where a
    * real decoder amortizes codec/model setup; rows stream through
    * without materializing the partition. `image/png` decodes for real
    * through ImageIO (byte_len then reports the DECODED buffer size,
    * w×h gray bytes); other kinds fall back to the labeled stub. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec init, model handle, ...)
        batch.iterator.map { r =>
          if (r.kind == "image/png") {
            val px = decodePngGray(r.media)
            val (f1, f2, f3, f4) = grayFeatures(px)
            MediaFeatures(r.doc_id, r.kind, px.length.toLong, f1, f2, f3, f4)
          } else if (r.kind == "audio/wav") {
            val ss = decodeWavPcm(r.media)
            val (f1, f2, f3, f4) = pcmFeatures(ss)
            MediaFeatures(r.doc_id, r.kind, ss.length.toLong, f1, f2, f3, f4)
          } else {
            val f = decodeStub(r.media)
            MediaFeatures(r.doc_id, r.kind, r.media.length.toLong, f(0), f(1), f(2), f(3))
          }
        }
      }
    }
  }

  case class FrameRecord(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling: one output row per every-kth "frame" of the
    * payload. STUB frame extraction (fixed-size byte slices stand in for
    * decoded frames); the plumbing — 1→N row explosion that stays on the
    * partition holding the bytes, no shuffle — is the real pattern. */
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

  /** "Resize": deterministic stub downsampling of the payload (every
    * stride-th byte) standing in for an image resize kernel, keeping the
    * metadata consistent with the new size. */
  def resizeStub(media: Dataset[MediaRecord], stride: Int = 4): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val out = r.media.indices.collect { case i if i % stride == 0 => r.media(i) }.toArray
        r.copy(media = out, width = math.max(1, r.width / stride),
          height = math.max(1, r.height / stride))
      }
    }
  }
}
