package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract runs per-partition in batches over a typed Dataset.
  *
  * The decode step is a STUB — this container ships no image/audio
  * codecs, so [[decodeStub]] is a clearly-marked deterministic fake over
  * the raw bytes. Everything around it is real and tested: the schema
  * (binary payload + metadata), the Encoder-backed Dataset, the
  * mapPartitions batch shape (decode amortized per batch, not per row),
  * and the partitioning (features stay on the partition that holds the
  * bytes — no shuffle).
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
    * real decoder would amortize model/codec setup; rows stream through
    * without materializing the partition. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec init, model handle, ...)
        batch.iterator.map { r =>
          val f = decodeStub(r.media)
          MediaFeatures(r.doc_id, r.kind, r.media.length.toLong, f(0), f(1), f(2), f(3))
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
