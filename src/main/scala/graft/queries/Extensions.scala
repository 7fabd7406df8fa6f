package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.queries.QueryUtil._
import graft.streaming.Sessionize

/** Queries exposing the streaming-state and multimodal operators through
  * the driver contract. */
object Extensions {

  /** Stateful sessionization through the shared session-splitting core
    * (the streaming variant runs in StreamingSpec; this batch form uses
    * the same groupByKey keyed-state shape via flatMapGroups). Oracle:
    * equivalent to q_events_sessions' window formulation. */
  def qEventsSessionState(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"))
      .as[Sessionize.Ev]
    Sessionize.sessionizeBatch(evs)
      .toDF()
      .orderBy("user_id", "start_us")
  }

  private val qEventsSessionStateOracle =
    """WITH g AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tus,
      |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
      |      OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |), s AS (
      |  SELECT user_id, tus,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM g
      |)
      |SELECT user_id, MIN(tus) AS start_us, MAX(tus) AS end_us,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, start_us""".stripMargin

  /** Multimodal feature extraction: binary payload + metadata → typed
    * per-partition batched REAL decode: each document becomes an actual
    * PNG (encoded executor-side), ImageIO decodes it back to pixels,
    * and the features are decoded-pixel statistics. The corpus pattern
    * is closed-form (pixel k of doc d = (d*31 + k*7) mod 256), so the
    * oracle recomputes the same statistics with the same IEEE op order
    * — the hash gate certifies the full encode→decode→features path. */
  /** Perceptual-hash IMAGE dedup through the REAL codec: payloads with
    * planted duplicate groups (canonical id = doc_id % 100, so ~100
    * byte-identical copies per image at sf0.01) decode executor-side,
    * hash by decoded-pixel average-hash (integer threshold — no float
    * mean), and group by the hash value. The engine recovers the
    * duplicate groups from PIXELS; the oracle recomputes the same hash
    * from the closed-form pattern, so a codec, threshold, or bit-pack
    * regression hash-fails. Scale: decode + hash are map-side on the
    * partition holding the bytes; the dedup is ONE shuffle on the
    * 64-bit hash — q_dedup_exact's shape with a perceptual key. */
  def qMultimodalPhash(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("phash"))
    Multimodal.averageHash(
        Multimodal.pngMediaCanonical(Tables.documents(s, dir), 100))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w).cast("long"))
      .orderBy("doc_id")
  }

  private val qMultimodalPhashOracle =
    """WITH px AS (
      |  SELECT doc_id, doc_id % 100 AS c,
      |    (4 + (doc_id % 100) % 5) * (3 + (doc_id % 100) % 4) AS n,
      |    unnest(range(0, (4 + (doc_id % 100) % 5) * (3 + (doc_id % 100) % 4))) AS k
      |  FROM documents),
      |v AS (SELECT doc_id, n, k, ((c * 31 + k * 7) % 256) AS pix FROM px),
      |s AS (SELECT doc_id, SUM(pix) AS sump FROM v GROUP BY doc_id),
      |h AS (
      |  SELECT v.doc_id,
      |    SUM(CASE WHEN v.pix * v.n >= s.sump
      |      THEN (CAST(1 AS BIGINT) << CAST(v.k AS INTEGER)) ELSE 0 END) AS phash
      |  FROM v JOIN s ON v.doc_id = s.doc_id GROUP BY v.doc_id),
      |g AS (SELECT phash, MIN(doc_id) AS canonical_id,
      |  COUNT(*) AS group_size FROM h GROUP BY phash)
      |SELECT h.doc_id, CAST(h.phash AS BIGINT) AS phash, g.canonical_id,
      |  CAST(g.group_size AS BIGINT) AS group_size
      |FROM h JOIN g USING (phash) ORDER BY doc_id""".stripMargin

  def qMultimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.pngMediaFromDocuments(Tables.documents(s, dir)))
      .toDF()
      .orderBy("doc_id")

  private val qMultimodalFeaturesOracle = {
    val p = "(doc_id * 31 + k * 7) % 256" // decoded gray value of pixel k
    """WITH px AS (
      |  SELECT doc_id,
      |    (4 + doc_id % 5) * (3 + doc_id % 4) AS n,
      |    unnest(range(0, (4 + doc_id % 5) * (3 + doc_id % 4))) AS k
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, (4 + doc_id % 5) * (3 + doc_id % 4) AS n,
      |    SUM(PX) AS sump, SUM((PX) * (PX)) AS sumsq,
      |    SUM(CASE WHEN PX < 128 THEN 1 ELSE 0 END) AS nlow,
      |    SUM(CASE WHEN PX >= 192 THEN 1 ELSE 0 END) AS nhigh
      |  FROM px GROUP BY doc_id)
      |SELECT doc_id, 'image/png' AS kind, CAST(n AS BIGINT) AS byte_len,
      |  CAST(sump AS DOUBLE) / CAST(n AS DOUBLE) AS f1,
      |  sqrt((CAST(sumsq AS DOUBLE) - CAST(sump AS DOUBLE) * CAST(sump AS DOUBLE)
      |        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS f2,
      |  CAST(nlow AS DOUBLE) / CAST(n AS DOUBLE) AS f3,
      |  CAST(nhigh AS DOUBLE) / CAST(n AS DOUBLE) AS f4
      |FROM s ORDER BY doc_id""".stripMargin.replace("PX", s"($p)")
  }

  /** Frame sampling surfaced through the driver contract: every 4th
    * 16-byte "frame" of each payload, one output row per frame — the
    * 1→N explosion stays on the partition holding the bytes (no
    * shuffle; Multimodal.sampleFrames). Projected to scalars
    * (frame length + first byte) so the hash gate can compare. */
  def qMultimodalFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
      .toDF()
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame_bytes")).cast("long").as("frame_len"),
        ascii(decode(col("frame_bytes"), "UTF-8")).cast("long").as("first_byte"))
      .orderBy("doc_id", "frame_idx")

  private val qMultimodalFramesOracle =
    """WITH f AS (
      |  SELECT doc_id, text,
      |    unnest(range(0, greatest(1, strlen(text) // 16), 4)) AS i
      |  FROM documents)
      |SELECT doc_id, CAST(i AS INT) AS frame_idx,
      |  CAST(least(16, strlen(text) - i * 16) AS BIGINT) AS frame_len,
      |  CAST(unicode(substring(text, CAST(i * 16 + 1 AS INT), 1)) AS BIGINT) AS first_byte
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** Salted skew join surfaced through the driver contract: lineitem
    * (big, salted 8 ways on the row-distinguishing (orderkey,
    * linenumber) hash) ⋈ supplier (small, replicated per salt), then a
    * per-supplier rollup. Semantically identical to the plain join —
    * which is exactly what the oracle runs — so the hash gate proves
    * salting is result-transparent, and SkewJoinSpec proves the hot key
    * actually spreads across partitions. */
  def qSkewJoin(s: SparkSession, dir: String): DataFrame =
    graft.operators.SkewJoin.saltedJoin(
        Tables.lineitem(s, dir), Tables.supplier(s, dir),
        joinKeys = Seq("l_suppkey" -> "s_suppkey"),
        saltSource = struct(col("l_orderkey"), col("l_linenumber")),
        salts = 8)
      .groupBy(col("s_name"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("s_name")

  private val qSkewJoinOracle =
    s"""SELECT s_name, ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n_items
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_name ORDER BY s_name""".stripMargin

  /** Audio features through the full encode → WAV → decode path: the
    * payloads are real RIFF/WAVE files decoded with the JDK's
    * javax.sound.sampled inside the batched mapPartitions; features are
    * decoded-sample statistics. The closed-form PCM pattern lets the
    * oracle recompute them exactly, so the gate covers the codec path
    * end-to-end (same contract as q_multimodal_features for PNGs). */
  def qMultimodalAudio(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.wavMediaFromDocuments(Tables.documents(s, dir)))
      .toDF()
      .orderBy("doc_id")

  private val qMultimodalAudioOracle =
    """WITH sm AS (
      |  SELECT doc_id, 200 + doc_id % 100 AS n,
      |    unnest(range(0, 200 + doc_id % 100)) AS k
      |  FROM documents),
      |v AS (
      |  SELECT doc_id, n, k,
      |    ((doc_id * 37 + k * 11) % 65536) - 32768 AS s
      |  FROM sm),
      |w AS (
      |  SELECT doc_id, n, s,
      |    lag(s) OVER (PARTITION BY doc_id ORDER BY k) AS prev
      |  FROM v),
      |a AS (
      |  SELECT doc_id, n, SUM(s) AS sums, SUM(s * s) AS sumsq,
      |    SUM(CASE WHEN prev IS NOT NULL AND ((prev < 0) <> (s < 0))
      |      THEN 1 ELSE 0 END) AS cross_n,
      |    MAX(abs(s)) AS peak
      |  FROM w GROUP BY doc_id, n)
      |SELECT doc_id, 'audio/wav' AS kind, CAST(n AS BIGINT) AS byte_len,
      |  CAST(sums AS DOUBLE) / CAST(n AS DOUBLE) AS f1,
      |  sqrt(CAST(sumsq AS DOUBLE) / CAST(n AS DOUBLE)) AS f2,
      |  CAST(cross_n AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS f3,
      |  CAST(peak AS DOUBLE) / 32768.0 AS f4
      |FROM a ORDER BY doc_id""".stripMargin

  /** Video features through the full encode → MJPEG/AVI → decode path:
    * payloads are real RIFF/AVI containers (one baseline JPEG per
    * frame) parsed chunk-by-chunk and frame-decoded through ImageIO
    * inside the batched mapPartitions; features are decoded-pixel
    * statistics plus a temporal motion term. Frames are constant 8×8
    * blocks at JPEG quality 1.0 — DC-only, unit quantizer — so the
    * lossy codec roundtrips the closed form exactly and the oracle
    * recomputes mean/std/low-fraction/motion from it (64 pixels per
    * block), with the same IEEE op order as Multimodal.videoFeatures. */
  def qMultimodalVideo(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.aviMediaFromDocuments(Tables.documents(s, dir)))
      .toDF()
      .orderBy("doc_id")

  private val qMultimodalVideoOracle =
    """WITH bl AS (
      |  SELECT doc_id, 2 + doc_id % 4 AS fr,
      |    (16 + 8 * (doc_id % 2)) // 8 AS nb
      |  FROM documents),
      |fx AS (SELECT doc_id, fr, nb, unnest(range(0, fr)) AS f FROM bl),
      |bx AS (SELECT doc_id, fr, nb, f, unnest(range(0, nb)) AS b FROM fx),
      |v AS (
      |  SELECT doc_id, fr, nb, f, b,
      |    (doc_id * 13 + f * 41 + b * 17) % 256 AS v
      |  FROM bx),
      |s AS (
      |  SELECT doc_id, fr, nb, SUM(v) AS sv, SUM(v * v) AS svq,
      |    SUM(CASE WHEN v < 128 THEN 1 ELSE 0 END) AS nlow
      |  FROM v GROUP BY doc_id, fr, nb),
      |m AS (
      |  SELECT a.doc_id, SUM(abs(b.v - a.v)) AS sd
      |  FROM v a JOIN v b ON a.doc_id = b.doc_id AND a.b = b.b AND b.f = a.f + 1
      |  GROUP BY a.doc_id)
      |SELECT s.doc_id, 'video/avi' AS kind,
      |  CAST(s.nb * 64 * s.fr AS BIGINT) AS byte_len,
      |  CAST(sv * 64 AS DOUBLE) / CAST(s.nb * 64 * s.fr AS DOUBLE) AS f1,
      |  sqrt((CAST(svq * 64 AS DOUBLE)
      |        - CAST(sv * 64 AS DOUBLE) * CAST(sv * 64 AS DOUBLE)
      |          / CAST(s.nb * 64 * s.fr AS DOUBLE))
      |       / CAST(s.nb * 64 * s.fr AS DOUBLE)) AS f2,
      |  CAST(nlow * 64 AS DOUBLE) / CAST(s.nb * 64 * s.fr AS DOUBLE) AS f3,
      |  CAST(m.sd * 64 AS DOUBLE) / CAST(s.nb * 64 * (s.fr - 1) AS DOUBLE) AS f4
      |FROM s JOIN m ON s.doc_id = m.doc_id
      |ORDER BY s.doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_session_state" -> (qEventsSessionState _),
    "q_skew_join" -> (qSkewJoin _),
    "q_multimodal_phash" -> (qMultimodalPhash _),
    "q_multimodal_features" -> (qMultimodalFeatures _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_audio" -> (qMultimodalAudio _),
    "q_multimodal_video" -> (qMultimodalVideo _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_events_session_state" -> qEventsSessionStateOracle,
    "q_skew_join" -> qSkewJoinOracle,
    "q_multimodal_phash" -> qMultimodalPhashOracle,
    "q_multimodal_features" -> qMultimodalFeaturesOracle,
    "q_multimodal_frames" -> qMultimodalFramesOracle,
    "q_multimodal_audio" -> qMultimodalAudioOracle,
    "q_multimodal_video" -> qMultimodalVideoOracle
  )
}
