package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables
import graft.functions.VectorOps

/** Similarity search over the embedding column (builder brief):
  * brute-force cosine top-k as the exact baseline (oracle-checked), and
  * a random-hyperplane LSH-bucketed variant as the 100 TB scale path —
  * candidates only come from matching sign-buckets, so the expensive
  * cosine runs on a small fraction of rows.
  */
object Similarity {

  /** Exact cosine top-10 against the vec_id=0 query vector. The 1-row
    * query side is broadcast; cosine folds are bit-deterministic (see
    * VectorOps), so ORDER BY cosine is stable across engines. */
  def qEmbedCosineTopk(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        VectorOps.cosine(col("embedding"), col("q_vec")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  private val qEmbedCosineTopkOracle = {
    val cos = VectorOps.cosineSql("e.embedding", "q.embedding")
    s"""SELECT e.vec_id, e.label, $cos AS cosine
       |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
       |WHERE e.vec_id <> 0
       |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin
  }

  /** Random-hyperplane LSH approximate top-k: 12 fixed hyperplanes
    * (seeded, literal coefficients) → 12-bit sign bucket per vector;
    * candidates share the query's bucket in any of 4 three-bit bands.
    * MULTI-PROBE on the query side: each band also probes its 3
    * Hamming-1 neighbor buckets (a sign bit near the hyperplane is the
    * most likely to flip), which multiplies query-side band keys ×4 —
    * a constant — while the CORPUS side still emits exactly 4 keys per
    * vector, so the index size is unchanged and recall roughly doubles
    * on near-orthogonal tails. Exact cosine is computed only for
    * candidates. At 100 TB the bucket id is one groupBy key — the full
    * pairwise cosine never happens. Oracle-gated (round 7): the probe
    * set is FIXED (seeded plane literals) and the sign-bit fold is the
    * same sequential double fold the oracle mirrors, so the candidate
    * set — and therefore the exact-cosine top-k over it — is
    * deterministic and SQL-expressible; SimilaritySpec additionally
    * asserts recall against the exact top-k. */
  private val lshAnnDims = 64
  private[graft] val lshAnnPlanes: Seq[Seq[Double]] = {
    val rng = new scala.util.Random(7)
    Seq.fill(12)(Seq.fill(lshAnnDims)(rng.nextGaussian()))
  }

  /** 12-bit sign bucket from the fixed hyperplanes — the shared LSH
    * plumbing [[qAnnLsh]], [[qAnnRecall]] and the ScaleBench recall arm
    * all ride, so the measured recall is the recall OF the production
    * candidate stage, not of a lookalike.
    *
    * Round 20 (optimization): runs as the native [[graft.functions.LshSignature]]
    * kernel with bands=1, bits=12 — ONE codegen'd primitive loop per row
    * instead of 12 interpreted `aggregate(zip_with(...))` folds (the one
    * non-codegen expression chain left on a full-corpus ANN path; guide
    * §4). Bit-identical to [[lshSignBucketHof]] on EVERY input:
    * same `Random(7)` plane draw order, same ascending-index IEEE dot
    * sequence, same SQL NaN>0 sign semantics, and the trailing
    * `coalesce(_, 0)` reproduces the HOF's null-poisoning (a NULL /
    * null-element / length-mismatched vector folds to bucket 0 there,
    * while the kernel nulls the signature) — Round20OptSpec pins the
    * equality over well-formed AND malformed vectors, and the DuckDB
    * oracles (which mirror the HOF fold) are unmoved. */
  private[graft] def lshSignBucket(vec: Column): Column =
    coalesce(
      element_at(graft.functions.LshSignature.signature(
        vec.cast(org.apache.spark.sql.types.ArrayType(DoubleType)),
        lshAnnDims, bands = 1, bits = 12, seed = 7), 1),
      lit(0L))

  /** The 12-interpreted-folds formulation — kept as the spec's
    * independent witness for the kernel form above (and the shape the
    * DuckDB oracle text mirrors). */
  private[graft] def lshSignBucketHof(vec: Column): Column = {
    val bits = lshAnnPlanes.zipWithIndex.map { case (p, i) =>
      val proj = aggregate(
        zip_with(vec, lit(p.toArray), (x, w) => x.cast(DoubleType) * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Corpus-side band keys: 4 bands × 3 bits of the sign bucket. */
  private[graft] def lshBandKeys(bucket: Column): Column =
    array((0 until 4).map(i =>
      concat_ws(":", lit(i),
        shiftright(bucket, i * 3).bitwiseAND(lit(7L)))): _*)

  /** Query-side probe keys: each band's own bucket plus, when
    * `flips` carries the Hamming-1 set, its 3 single-bit neighbors —
    * query-side fan-out only, the corpus index never grows. */
  private[graft] def lshProbeKeys(bucket: Column,
                                  flips: Seq[Int] = Seq(0, 1, 2, 4)): Column =
    array((for (i <- 0 until 4; flip <- flips) yield
      concat_ws(":", lit(i),
        shiftright(bucket, i * 3).bitwiseAND(lit(7L))
          .bitwiseXOR(lit(flip.toLong)))): _*)

  def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", lshSignBucket(col("embedding")))
      .withColumn("bands", lshBandKeys(col("bucket")))
    // query probes each band's bucket AND its 3 single-bit flips
    val q = e.filter(col("vec_id") === 0)
      .select(explode(lshProbeKeys(col("bucket"))).as("band_key"),
        col("embedding").as("q_vec"))
    e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"), col("embedding"),
        explode(col("bands")).as("band_key"))
      .join(broadcast(q), "band_key")
      .select(col("vec_id"), col("label"),
        VectorOps.cosine(col("embedding"), col("q_vec")).as("cosine"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(col("cosine")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  /** DuckDB mirror of qAnnLsh: identical plane literals, identical
    * sequential dot fold (⇒ identical projection doubles ⇒ identical
    * sign bits), band match as a 4-way OR over 3-bit slices with the
    * query side's Hamming-1 multi-probe expressed as XOR ∈ {0,1,2,4},
    * then exact cosine over candidates only. */
  private val qAnnLshOracle = {
    def dotLit(vec: String, p: Seq[Double]) = {
      val arr = p.mkString("[", ", ", "]")
      s"""list_reduce(list_transform(list_zip($vec, $arr),
         |      p -> CAST(p[1] AS DOUBLE) * p[2]), (x, y) -> x + y)""".stripMargin
    }
    val bucket = lshAnnPlanes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dotLit("embedding", p)} > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("\n    + ")
    val bandMatch = (0 until 4).map(i =>
      s"xor((e.bucket >> ${i * 3}) & 7, (q.bucket >> ${i * 3}) & 7) IN (0, 1, 2, 4)")
      .mkString("\n       OR ")
    val cos = VectorOps.cosineSql("e.embedding", "q.embedding")
    s"""WITH b AS (SELECT vec_id, label, embedding,
       |    $bucket AS bucket
       |  FROM embeddings),
       |q AS (SELECT embedding, bucket FROM b WHERE vec_id = 0)
       |SELECT e.vec_id, e.label, $cos AS cosine
       |FROM b e, q
       |WHERE e.vec_id <> 0 AND ($bandMatch)
       |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin
  }

  /** ANN recall@k — the eval primitive that turns the radius-recall
    * contract into a MEASURED, oracle-gated number instead of prose:
    * for a fixed panel of the `panel` lowest-id vectors, the LSH
    * candidate stage's top-k (the exact production machinery —
    * [[lshSignBucket]] / [[lshBandKeys]] / Hamming-1 [[lshProbeKeys]],
    * shared with [[qAnnLsh]]) is compared against the EXACT cosine
    * top-k and each query's candidate volume + hit count becomes a
    * recall row. Scale shape: the exact arm is O(n·panel) map-side
    * work against a broadcast panel — the cost an eval harness pays by
    * design (the panel is a constant, never the corpus) — and both
    * top-k windows carry a rank≤k filter Spark rewrites into
    * per-partition group limits (WindowGroupLimit), so no partition
    * sort ever holds more than k·queries rows past the scan.
    * Determinism: dots are the bit-exact [[VectorOps.dotD]] fold, ties
    * break on vec_id, recall is hits/k (IEEE division of exact ints —
    * bit-identical in any engine), so the DuckDB oracle replays the
    * whole pipeline and hashes equal. */
  def qAnnRecall(s: SparkSession, dir: String): DataFrame = {
    val panel = 32
    val k = 10
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        VectorOps.normalized(col("embedding")).as("nvec"))
    val queries = base.filter(col("vec_id") < panel)
      .select(col("vec_id").as("q_id"), col("nvec").as("q_nvec"),
        lshProbeKeys(lshSignBucket(col("embedding"))).as("probes"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val exactTop = base
      .crossJoin(broadcast(queries.select(col("q_id"), col("q_nvec"))))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        VectorOps.dotD(col("nvec"), col("q_nvec")).as("cos"))
      .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"))
    // one row per (query, candidate): the multi-band explode can match
    // a pair in several bands, the groupBy collapses them (the oracle's
    // OR-over-bands join lands on the same pair set directly)
    val scored = base
      .select(col("vec_id"), col("nvec"),
        explode(lshBandKeys(lshSignBucket(col("embedding")))).as("band_key"))
      .join(broadcast(queries.select(col("q_id"), col("q_nvec"),
        explode(col("probes")).as("band_key"))), "band_key")
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(max(VectorOps.dotD(col("nvec"), col("q_nvec"))).as("cos"))
    val annTop = scored.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k).select(col("q_id"), col("vec_id"))
    val cands = scored.groupBy(col("q_id")).agg(count(lit(1)).as("candidates"))
    val hits = exactTop.join(annTop, Seq("q_id", "vec_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
    queries.select(col("q_id"))
      .join(cands, Seq("q_id"), "left").join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("candidates"), lit(0L)).as("candidates"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)) / lit(k.toDouble)).as("recall"))
      .orderBy(col("q_id"))
  }

  /** DuckDB mirror of qAnnRecall: same plane literals and sequential
    * dot folds, the band match as the XOR ∈ {0,1,2,4} OR (one row per
    * candidate pair — the engine's explode+groupBy collapses to the
    * same set), per-query top-10 windows with the same (cos DESC,
    * vec_id) ties, hits by pair-join, recall = hits / 10.0. */
  private val qAnnRecallOracle = {
    def dotLit(vec: String, p: Seq[Double]) = {
      val arr = p.mkString("[", ", ", "]")
      s"""list_reduce(list_transform(list_zip($vec, $arr),
         |      p -> CAST(p[1] AS DOUBLE) * p[2]), (x, y) -> x + y)""".stripMargin
    }
    val bucket = lshAnnPlanes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dotLit("embedding", p)} > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("\n    + ")
    val bandMatch = (0 until 4).map(i =>
      s"xor((e.bucket >> ${i * 3}) & 7, (q.q_bucket >> ${i * 3}) & 7) IN (0, 1, 2, 4)")
      .mkString("\n       OR ")
    val dotNq = VectorOps.dotDSql("e.nvec", "q.q_nvec")
    s"""WITH b AS (SELECT vec_id, ${VectorOps.normalizedSql("embedding")} AS nvec,
       |    $bucket AS bucket
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, nvec AS q_nvec, bucket AS q_bucket
       |  FROM b WHERE vec_id < 32),
       |exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY $dotNq DESC, e.vec_id) AS rn
       |    FROM b e, q WHERE e.vec_id <> q.q_id)
       |  WHERE rn <= 10),
       |cand AS (
       |  SELECT q.q_id, e.vec_id, $dotNq AS cos
       |  FROM b e, q
       |  WHERE e.vec_id <> q.q_id AND ($bandMatch)),
       |anntop AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
       |    FROM cand) WHERE rn <= 10),
       |cc AS (SELECT q_id, count(*) AS candidates FROM cand GROUP BY q_id),
       |hh AS (SELECT a.q_id, count(*) AS hits
       |  FROM anntop a JOIN exact e ON a.q_id = e.q_id AND a.vec_id = e.vec_id
       |  GROUP BY a.q_id)
       |SELECT q.q_id, COALESCE(cc.candidates, 0) AS candidates,
       |  COALESCE(hh.hits, 0) AS hits, COALESCE(hh.hits, 0) / 10.0 AS recall
       |FROM q LEFT JOIN cc ON q.q_id = cc.q_id LEFT JOIN hh ON q.q_id = hh.q_id
       |ORDER BY q.q_id""".stripMargin
  }

  /** Nearest-centroid id for a normalized vector against k centroid
    * LITERALS — a pure map-side projection, no crossJoin, no window
    * shuffle, one codegen'd primitive loop per row (ArgmaxDot; ties
    * break toward the higher centroid id, deterministically). */
  private[graft] def nearestCentroid(nvec: org.apache.spark.sql.Column,
                                     cents: Seq[Array[Double]]): org.apache.spark.sql.Column =
    graft.functions.ArgmaxDot.argmaxDot(nvec, cents)

  /** Distributed spherical k-means (Lloyd) refinement: each iteration
    * is one map-side argmax assignment against broadcast centroid
    * literals + one groupBy with 64 per-dimension avg aggregates
    * (partial aggregation does the reduction map-side — the canonical
    * Spark shape). Only the k×dims centroid matrix ever reaches the
    * driver (size independent of corpus size); the corpus itself stays
    * distributed. Empty clusters keep their previous centroid; means
    * are re-normalized to the unit sphere (cosine geometry).
    *
    * Determinism (round 7): the per-dim mean rides INTEGER-scaled sums
    * (round(x·1e6) as BIGINT — the q_embed_centroid discipline), so the
    * cross-row reduction is order-independent and any engine that
    * mirrors the same closed-form divisions lands on bit-identical
    * centroids — which is what lets qAnnIvf carry a DuckDB oracle. */
  def kmeansCentroids(base: DataFrame, nvecCol: String, dims: Int,
                      k: Int, iters: Int, idCol: String = "vec_id"): Seq[Array[Double]] = {
    def normalize(a: Array[Double]): Array[Double] = {
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n == 0) a else a.map(_ / n)
    }
    // deterministic seeds: the k lowest-id vectors
    var cents: Seq[Array[Double]] = base
      .orderBy(idCol).limit(k).orderBy(idCol)
      .select(nvecCol).collect().map(_.getSeq[Double](0).toArray).toSeq
    val dimSums = (0 until dims).map(d =>
      sum(round(element_at(col(nvecCol), d + 1) * 1000000.0, 0).cast(LongType))
        .as(s"_s$d"))
    for (_ <- 0 until iters) {
      val means = base
        .select(col(nvecCol), nearestCentroid(col(nvecCol), cents).as("cid"))
        .groupBy("cid").agg(count(lit(1)).as("_n"), dimSums: _*)
        .collect().map { r =>
          val n = r.getLong(1).toDouble
          r.getInt(0) -> normalize((0 until dims).map(d =>
            r.getLong(2 + d).toDouble / n / 1000000.0).toArray)
        }.toMap
      cents = cents.zipWithIndex.map { case (old, i) => means.getOrElse(i, old) }
    }
    cents
  }

  /** IVF approximate top-k with k-means-refined centroids: 16 centroids
    * fit by 3 distributed Lloyd iterations (seeded at the lowest-id
    * vectors) partition the corpus into inverted lists by a map-side
    * argmax — no crossJoin, no window; the query probes only its
    * nprobe=2 nearest lists (in-plan: sort the (dot, id) structs,
    * slice, explode). The search touches ~nprobe/16 of the data — at
    * 100 TB the inverted lists become partition keys and the probe
    * prunes partitions. Oracle-gated (round 7): seeds, integer-scaled
    * Lloyd means, argmax ties, and probe order are all deterministic,
    * so the DuckDB oracle unrolls the same 3 iterations and lands on
    * bit-identical centroids → identical candidate lists → identical
    * top-k; SimilaritySpec additionally checks recall vs the exact
    * top-k. */
  def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val nprobe = 2
    val k = 16
    val dims = 64
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        VectorOps.normalized(col("embedding")).as("nvec"))
    val cents = kmeansCentroids(base, "nvec", dims, k, iters = 3)
    val assigned = base.withColumn("centroid_id", nearestCentroid(col("nvec"), cents))
    // query's nprobe best lists, computed in-plan from the same literals
    val dotStructs = array(cents.zipWithIndex.map { case (c, i) =>
      struct(VectorOps.dotD(col("nvec"), lit(c)).as("d"), lit(i).as("i"))
    }: _*)
    val queryLists = assigned.filter(col("vec_id") === 0)
      .select(col("nvec").as("q_nvec"),
        explode(slice(reverse(array_sort(dotStructs)), 1, nprobe)).as("probe"))
      .select(col("probe.i").as("centroid_id"), col("q_nvec"))
    assigned.filter(col("vec_id") =!= 0)
      .join(broadcast(queryLists), "centroid_id")
      .select(col("vec_id"), col("label"),
        VectorOps.dotD(col("nvec"), col("q_nvec")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  /** DuckDB mirror of qAnnIvf: unrolls the 3 integer-scaled Lloyd
    * iterations (seeds = 16 lowest-id normalized vectors; assignment =
    * struct-max argmax with ties toward the higher cid; mean = exact
    * BIGINT sum of round(x·1e6) divided in the same closed-form order;
    * re-normalized with the same sequential square-sum fold), then the
    * final assignment, the query's (dot desc, cid desc) top-2 probe
    * lists, and exact dot over candidates only. Every double op
    * mirrors the engine's IEEE op sequence, so hashes compare raw. */
  /** Sequential-fold dot product in DuckDB list SQL — the oracle twin
    * of [[VectorOps.dotD]]'s op order (shared by the IVF oracles). */
  private def ivfDotSql(a: String, b: String) =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |      p -> p[1] * p[2]), (x, y) -> x + y)""".stripMargin

  /** Shared DuckDB CTE prefix for the IVF oracles: normalized base,
    * 16 lowest-id seeds, the 3 unrolled integer-scaled Lloyd
    * iterations, and the final assignment `s4(vec_id, label, nvec,
    * cid)` with centroids in `c3`. Factored (round 17) so q_ann_ivf
    * and q_ann_recall_ivf replay ONE fit definition — the two oracles
    * cannot drift apart. */
  private val ivfAssignCtes: String = {
    val dims = 64
    def dotD(a: String, b: String) = ivfDotSql(a, b)
    def sumSq(l: String) =
      s"list_reduce(list_transform($l, x -> x * x), (x, y) -> x + y)"
    def iter(prev: String, t: Int): String =
      s"""a$t AS (
         |  SELECT b.vec_id, b.label, b.nvec,
         |    max(struct_pack(d := ${dotD("b.nvec", "c.cent")}, i := c.cid)) AS pick
         |  FROM base b, $prev c GROUP BY b.vec_id, b.label, b.nvec),
         |s$t AS (SELECT vec_id, label, nvec, pick.i AS cid FROM a$t),
         |g$t AS (
         |  SELECT cid, i AS dim,
         |    CAST(SUM(CAST(round(nvec[i] * 1000000.0) AS BIGINT)) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) / 1000000.0 AS mean
         |  FROM s$t CROSS JOIN range(1, ${dims + 1}) r(i)
         |  GROUP BY cid, i),
         |m$t AS (SELECT cid, list(mean ORDER BY dim) AS m FROM g$t GROUP BY cid),
         |c$t AS (
         |  SELECT c.cid,
         |    COALESCE(CASE WHEN sqrt(${sumSq("n.m")}) = 0 THEN n.m
         |      ELSE list_transform(n.m, x -> x / sqrt(${sumSq("n.m")})) END,
         |      c.cent) AS cent
         |  FROM $prev c LEFT JOIN m$t n ON c.cid = n.cid)""".stripMargin
    s"""WITH base AS (
       |  SELECT vec_id, label, ${VectorOps.normalizedSql("embedding")} AS nvec
       |  FROM embeddings),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cid,
       |    nvec AS cent
       |  FROM (SELECT vec_id, nvec FROM base ORDER BY vec_id LIMIT 16)),
       |${iter("c0", 1)},
       |${iter("c1", 2)},
       |${iter("c2", 3)},
       |a4 AS (
       |  SELECT b.vec_id, b.label, b.nvec,
       |    max(struct_pack(d := ${dotD("b.nvec", "c.cent")}, i := c.cid)) AS pick
       |  FROM base b, c3 c GROUP BY b.vec_id, b.label, b.nvec),
       |s4 AS (SELECT vec_id, label, nvec, pick.i AS cid FROM a4)""".stripMargin
  }

  private val qAnnIvfOracle =
    s"""$ivfAssignCtes,
       |q AS (SELECT nvec AS qv FROM base WHERE vec_id = 0),
       |probes AS (
       |  SELECT c.cid FROM c3 c, q
       |  ORDER BY ${ivfDotSql("q.qv", "c.cent")} DESC, c.cid DESC LIMIT 2)
       |SELECT s.vec_id, s.label, ${ivfDotSql("s.nvec", "q.qv")} AS cosine
       |FROM s4 s, q
       |WHERE s.vec_id <> 0 AND s.cid IN (SELECT cid FROM probes)
       |ORDER BY cosine DESC, s.vec_id LIMIT 10""".stripMargin

  /** IVF twin of [[qAnnRecall]]: recall@10 of the q_ann_ivf probe path
    * (16-centroid Lloyd fit, nprobe=2 nearest lists per query) against
    * the exact cosine top-k over the same 32-query panel. Together the
    * two recall entries gate BOTH production ANN paths' quality as
    * measured numbers; the fit, assignment and probe ordering are the
    * exact q_ann_ivf machinery ([[kmeansCentroids]] /
    * [[nearestCentroid]], (dot DESC, cid DESC) probe order), and the
    * oracle replays them through the SAME shared CTE prefix as
    * q_ann_ivf's oracle, so the two cannot drift. */
  def qAnnRecallIvf(s: SparkSession, dir: String): DataFrame = {
    val panel = 32
    val k = 10
    val nprobe = 2
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), VectorOps.normalized(col("embedding")).as("nvec"))
    val cents = kmeansCentroids(base, "nvec", 64, 16, iters = 3)
    val assigned = base.withColumn("cid", nearestCentroid(col("nvec"), cents))
    val queries = assigned.filter(col("vec_id") < panel)
      .select(col("vec_id").as("q_id"), col("nvec").as("q_nvec"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val exactTop = base.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        VectorOps.dotD(col("nvec"), col("q_nvec")).as("cos"))
      .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"))
    val dotStructs = array(cents.zipWithIndex.map { case (c, i) =>
      struct(VectorOps.dotD(col("q_nvec"), lit(c)).as("d"), lit(i).as("i"))
    }: _*)
    val qlists = queries
      .select(col("q_id"), col("q_nvec"),
        explode(slice(reverse(array_sort(dotStructs)), 1, nprobe)).as("probe"))
      .select(col("q_id"), col("q_nvec"), col("probe.i").as("cid"))
    // pair-unique by construction: a vector lives in exactly one list
    // and a query probes nprobe DISTINCT lists
    val scored = assigned.join(broadcast(qlists), "cid")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        VectorOps.dotD(col("nvec"), col("q_nvec")).as("cos"))
    val annTop = scored.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k).select(col("q_id"), col("vec_id"))
    val cands = scored.groupBy(col("q_id")).agg(count(lit(1)).as("candidates"))
    val hits = exactTop.join(annTop, Seq("q_id", "vec_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
    queries.select(col("q_id"))
      .join(cands, Seq("q_id"), "left").join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("candidates"), lit(0L)).as("candidates"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)) / lit(k.toDouble)).as("recall"))
      .orderBy(col("q_id"))
  }

  /** DuckDB mirror of qAnnRecallIvf: the shared IVF fit prefix, a
    * per-query (dot DESC, cid DESC) top-nprobe window, candidates by
    * list membership, per-query top-10, hits by pair-join. */
  private val qAnnRecallIvfOracle =
    s"""$ivfAssignCtes,
       |q AS (SELECT vec_id AS q_id, nvec AS q_nvec FROM base WHERE vec_id < 32),
       |exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${ivfDotSql("e.nvec", "q.q_nvec")} DESC, e.vec_id) AS rn
       |    FROM base e, q WHERE e.vec_id <> q.q_id)
       |  WHERE rn <= 10),
       |probes AS (
       |  SELECT q_id, cid FROM (
       |    SELECT q.q_id, c.cid,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${ivfDotSql("q.q_nvec", "c.cent")} DESC, c.cid DESC) AS rn
       |    FROM c3 c, q) WHERE rn <= 2),
       |cand AS (
       |  SELECT q.q_id, s.vec_id, ${ivfDotSql("s.nvec", "q.q_nvec")} AS cos
       |  FROM s4 s JOIN probes p ON s.cid = p.cid JOIN q ON q.q_id = p.q_id
       |  WHERE s.vec_id <> q.q_id),
       |anntop AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
       |    FROM cand) WHERE rn <= 10),
       |cc AS (SELECT q_id, count(*) AS candidates FROM cand GROUP BY q_id),
       |hh AS (SELECT a.q_id, count(*) AS hits
       |  FROM anntop a JOIN exact e ON a.q_id = e.q_id AND a.vec_id = e.vec_id
       |  GROUP BY a.q_id)
       |SELECT q.q_id, COALESCE(cc.candidates, 0) AS candidates,
       |  COALESCE(hh.hits, 0) AS hits, COALESCE(hh.hits, 0) / 10.0 AS recall
       |FROM q LEFT JOIN cc ON q.q_id = cc.q_id LEFT JOIN hh ON q.q_id = hh.q_id
       |ORDER BY q.q_id""".stripMargin

  /** Scalar (int8) embedding quantization — the 4× storage compression
    * a 100 TB embedding corpus ships with: per-vector min/max affine
    * map to 0..255, reconstruction, and fidelity metrics (max abs
    * error + cosine between original and reconstruction). Pure
    * map-side expression trees, and every step is mirrored exactly in
    * the DuckDB oracle (same fold order ⇒ bit-identical doubles). */
  def qEmbedQuant(s: SparkSession, dir: String): DataFrame = {
    // Stage every shared subexpression as a REAL column. Higher-order
    // functions run interpreted, so an aggregate embedded in a lambda
    // body (e.g. array_min(emb) inside the quantize transform) would
    // re-evaluate per ELEMENT per reference — the round-3 bench showed
    // that inlined form at 13 s for 2k×64 (~40× its map-side peers).
    // As attributes, mn/mx/scale/deq each evaluate once per row and
    // CollapseProject keeps them staged (multi-referenced non-cheap
    // producers are not merged). Arithmetic op sequence is unchanged,
    // so the DuckDB oracle still matches bit-for-bit.
    val staged = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("emb"))
      .withColumn("mn", array_min(col("emb")))
      .withColumn("mx", array_max(col("emb")))
      .withColumn("scale", (col("mx") - col("mn")) / lit(255.0))
      // q (round → int8 code) and deq (reconstruct) fused in one pass:
      // same per-element op order as the separate q/deq transforms.
      .withColumn("deq", transform(col("emb"), x =>
        col("mn") + round((x - col("mn")) / col("scale"))
          .cast(LongType).cast(DoubleType) * col("scale")))
    staged.select(
      col("vec_id"),
      round(col("mn"), 6).as("qmin"),
      round(col("mx"), 6).as("qmax"),
      round(array_max(zip_with(col("emb"), col("deq"), (a, b) => abs(a - b))), 6)
        .as("max_err"),
      round(VectorOps.dotD(col("emb"), col("deq")) /
        (sqrt(VectorOps.dotD(col("emb"), col("emb"))) *
          sqrt(VectorOps.dotD(col("deq"), col("deq")))), 6)
        .as("fidelity"))
      .orderBy("vec_id")
  }

  private val qEmbedQuantOracle = {
    val emb = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    val mn = s"list_min($emb)"
    val mx = s"list_max($emb)"
    val scale = s"(($mx - $mn) / 255.0)"
    val q = s"list_transform($emb, x -> CAST(round((x - $mn) / $scale) AS BIGINT))"
    val deq = s"list_transform($q, v -> $mn + CAST(v AS DOUBLE) * $scale)"
    val maxErr = s"list_max(list_transform(list_zip($emb, $deq), p -> abs(p[1] - p[2])))"
    val fid = s"(${VectorOps.dotDSql(emb, deq)} / (sqrt(${VectorOps.dotDSql(emb, emb)}) * sqrt(${VectorOps.dotDSql(deq, deq)})))"
    s"""SELECT vec_id,
       |  round($mn, 6) AS qmin,
       |  round($mx, 6) AS qmax,
       |  round($maxErr, 6) AS max_err,
       |  round($fid, 6) AS fidelity
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  /** Per-label embedding centroids (the distributed mean-vector pass
    * behind cluster monitoring / IVF seeding / class-prototype checks).
    * posexplode flattens (label, pos, value); one groupBy(label, pos)
    * with map-side combine computes every component — no per-vector
    * state, no driver collect, scales to any corpus × dims.
    *
    * Determinism: float→double is exact, and ×1e6 stays exact (24-bit
    * float mantissa × 2^20 < 2^53), so the rounded scaled value is an
    * exact integer both engines agree on; the cross-row SUM is then
    * integer (order-independent — the decimal-sum discipline, integer
    * flavored), and the final mean is two IEEE divisions. Output keeps
    * the first 8 components per label (the spot-check slice; the
    * aggregation itself runs over all dims). */
  def qEmbedCentroid(s: SparkSession, dir: String, maxPos: Int = 8): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), col("pos"),
        round(col("v").cast(DoubleType) * 1000000.0, 0).cast(LongType).as("sv"))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("sv")).as("ssum"))
      .filter(col("pos") < maxPos)
      .select(col("label").cast(LongType).as("label"),
        col("pos").cast(LongType).as("pos"), col("n_vecs"),
        round(col("ssum").cast(DoubleType) / col("n_vecs") / 1000000.0, 6)
          .as("centroid"))
      .orderBy("label", "pos")

  private val qEmbedCentroidOracle =
    """WITH e AS (
      |  SELECT label, i - 1 AS pos,
      |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS sv
      |  FROM embeddings CROSS JOIN range(1, 9) t(i))
      |SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
      |  COUNT(*) AS n_vecs,
      |  round(CAST(SUM(sv) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS centroid
      |FROM e WHERE pos < 8
      |GROUP BY label, pos ORDER BY label, pos""".stripMargin

  /** Embedding covariance matrix (upper triangle of the first 8 dims)
    * — the gram/covariance pass PCA, whitening, and drift monitors run
    * over an embedding corpus. Exact despite float inputs: values
    * scale to integers (q_embed_centroid's trick), so the power sums
    * Σxᵢ, Σxⱼ, Σxᵢxⱼ are order-independent longs and the closed-form
    * covariance is a deterministic double in both engines.
    *
    * Scale: the within-row pair explosion is dims² rows per vector —
    * fine for a dims² that fits a shuffle (8²=64 here); for full 64²
    * at corpus scale the same sums come from one treeAggregate over a
    * per-partition dims×dims accumulator (no explosion), with THIS
    * query as its verification form. */
  def qEmbedCovariance(s: SparkSession, dir: String, dims: Int = 8): DataFrame = {
    val sv = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        posexplode(slice(col("embedding"), 1, dims)).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"),
        round(col("v").cast(DoubleType) * 1000000.0, 0).cast(LongType).as("x"))
    val pairs = sv.select(col("vec_id"), col("pos").as("i"), col("x").as("xi"))
      .join(sv.select(col("vec_id"), col("pos").as("j"), col("x").as("xj")),
        "vec_id")
      .filter(col("i") <= col("j"))
    val n = count(lit(1)).cast(DoubleType)
    val sxy = sum(col("xi") * col("xj")).cast(DoubleType)
    val sx = sum(col("xi")).cast(DoubleType)
    val sy = sum(col("xj")).cast(DoubleType)
    pairs.groupBy(col("i").cast(LongType).as("i"), col("j").cast(LongType).as("j"))
      .agg(count(lit(1)).as("n"),
        round(((sxy - sx * sy / n) / (n - lit(1.0))) / 1e12, 8).as("cov"))
      .orderBy("i", "j")
  }

  /** FULL-dimension covariance (upper triangle, all `dims` components)
    * via ONE `treeAggregate` over per-partition integer power-sum
    * accumulators — the corpus-scale form the dims²-explosion query
    * above documents as its verification twin. Each partition folds its
    * vectors into a fixed (n, Σxᵢ, Σxᵢxⱼ) block of
    * `dims + dims·(dims+1)/2` longs; executors combine blocks in a
    * tree, so the shuffle moves only `O(partitions · dims²)` longs and
    * NO per-vector row ever carries a dims² explosion. The driver
    * receives exactly one accumulator (≈17 KB at dims=64) — size
    * independent of corpus size, the same bounded-collect contract as
    * the k-means centroid fit.
    *
    * Arithmetic parity: the same round(x·1e6)→long scaling and the
    * same closed-form IEEE sequence as [[qEmbedCovariance]] (Spark's
    * `round` is BigDecimal HALF_UP — mirrored here exactly), so on the
    * shared triangle the two forms are equal BIT-FOR-BIT, which
    * CovarianceSpec asserts. */
  def covarianceFull(s: SparkSession, dir: String, dims: Int = 64): DataFrame = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val nPairs = dims * (dims + 1) / 2
    def scaled(v: Float): Long =
      JBD.valueOf(v.toDouble * 1000000.0).setScale(0, RoundingMode.HALF_UP).longValue()
    val zero = (0L, new Array[Long](dims), new Array[Long](nPairs))
    val (n, sx, sxy) = Tables.embeddings(s, dir)
      .select(col("embedding")).rdd
      .map(_.getSeq[Float](0))
      .treeAggregate(zero)(
        seqOp = { case ((cnt, sxa, sxya), vec) =>
          val x = new Array[Long](dims)
          var i = 0
          while (i < dims) { x(i) = scaled(vec(i)); sxa(i) += x(i); i += 1 }
          var idx = 0
          i = 0
          while (i < dims) {
            var j = i
            while (j < dims) { sxya(idx) += x(i) * x(j); idx += 1; j += 1 }
            i += 1
          }
          (cnt + 1, sxa, sxya)
        },
        combOp = { case ((c1, s1, p1), (c2, s2, p2)) =>
          var i = 0
          while (i < dims) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < nPairs) { p1(i) += p2(i); i += 1 }
          (c1 + c2, s1, p1)
        },
        depth = 2)
    val nd = n.toDouble
    val rows = for {
      i <- 0 until dims
      j <- i until dims
    } yield {
      val idx = i * dims - i * (i - 1) / 2 + (j - i)
      val cov = ((sxy(idx).toDouble - sx(i).toDouble * sx(j).toDouble / nd)
        / (nd - 1.0)) / 1e12
      (i.toLong, j.toLong, n,
        JBD.valueOf(cov).setScale(8, RoundingMode.HALF_UP).doubleValue())
    }
    import s.implicits._
    rows.toDF("i", "j", "n", "cov")
  }

  private def covarianceOracle(dims: Int) =
    s"""WITH sv AS (
       |  SELECT vec_id, i - 1 AS pos,
       |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x
       |  FROM embeddings CROSS JOIN range(1, ${dims + 1}) t(i)),
       |p AS (
       |  SELECT a.pos AS i, b.pos AS j, a.x AS xi, b.x AS xj
       |  FROM sv a JOIN sv b USING (vec_id)
       |  WHERE a.pos <= b.pos)
       |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       |  COUNT(*) AS n,
       |  round(((CAST(SUM(xi * xj) AS DOUBLE)
       |      - CAST(SUM(xi) AS DOUBLE) * CAST(SUM(xj) AS DOUBLE)
       |        / CAST(COUNT(*) AS DOUBLE))
       |    / (CAST(COUNT(*) AS DOUBLE) - 1.0)) / 1e12, 8) AS cov
       |FROM p GROUP BY i, j ORDER BY i, j""".stripMargin

  private val qEmbedCovarianceOracle = covarianceOracle(8)

  /** Top-principal-direction estimate by POWER ITERATION on the exact
    * covariance — the "what axis carries the variance" probe a
    * dimensionality-reduction or whitening pass runs first, expressed
    * as distributed linear algebra: the matrix lives as (i, j, cov)
    * triples, matvec is a join + per-row fold, and the vector is a
    * broadcast array. Two iterations from the all-ones start, reported
    * with the Rayleigh-quotient eigenvalue estimate.
    *
    * Determinism: the covariance entries are the SAME round(·,8)
    * doubles q_embed_covariance proves hash-exact; every matvec row
    * sum, and the Rayleigh numerator/denominator, is a SEQUENTIAL
    * index-ordered fold (`aggregate` over a sort_array'd collect —
    * the VectorOps discipline DuckDB's list_reduce mirrors), so the
    * floats are bit-identical across engines and partition counts —
    * no rounding slack anywhere past the covariance itself.
    *
    * Scale: the triples matvec is ONE shuffle per iteration keyed on
    * the row index (the pagerank join-aggregate shape on a dims²
    * relation — tiny next to the corpus scan that built it); the
    * vector is O(dims) and broadcasts; the dims-sized collects are the
    * documented bounded pattern (centroid/BPE argmax). */
  def qEmbedPcaPower(s: SparkSession, dir: String, dims: Int = 8): DataFrame = {
    val sv = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        posexplode(slice(col("embedding"), 1, dims)).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"),
        round(col("v").cast(DoubleType) * 1000000.0, 0).cast(LongType).as("x"))
    val pairs = sv.select(col("vec_id"), col("pos").as("i"), col("x").as("xi"))
      .join(sv.select(col("vec_id"), col("pos").as("j"), col("x").as("xj")),
        "vec_id")
      .filter(col("i") <= col("j"))
    val n = count(lit(1)).cast(DoubleType)
    val sxy = sum(col("xi") * col("xj")).cast(DoubleType)
    val sx = sum(col("xi")).cast(DoubleType)
    val sy = sum(col("xj")).cast(DoubleType)
    val cov = pairs.groupBy(col("i").cast(LongType).as("i"),
        col("j").cast(LongType).as("j"))
      .agg(round(((sxy - sx * sy / n) / (n - lit(1.0))) / 1e12, 8).as("cov"))
    val full = cov.select(col("i"), col("j"), col("cov"))
      .union(cov.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov")))
    // each row of C as a j-ordered dense array — matvec becomes a fold.
    // localCheckpoint: `rows` (dims rows) feeds THREE passes (v1, v2,
    // Rayleigh) — without it each pass re-runs the corpus-sized
    // covariance shuffle (the scalableNtile multi-pass discipline).
    val rows = full.groupBy("i")
      .agg(transform(sort_array(collect_list(struct(col("j"), col("cov")))),
        e => e.getField("cov")).as("rv"))
      .localCheckpoint()
    def fold(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0.0), (a, x) => a + x)
    val v1 = rows.select(col("i"), fold(col("rv")).as("v1")).localCheckpoint()
    val v1arr = v1.agg(transform(sort_array(collect_list(
      struct(col("i"), col("v1")))), e => e.getField("v1")).as("va"))
    val v2 = rows.crossJoin(broadcast(v1arr))
      .select(col("i"),
        fold(zip_with(col("rv"), col("va"), (x, y) => x * y)).as("v2"))
    val joined = v2.join(v1, "i")
    val lam = joined
      .agg(sort_array(collect_list(struct(col("i"),
        (col("v1") * col("v2")).as("p"),
        (col("v1") * col("v1")).as("q")))).as("arr"))
      .select((fold(transform(col("arr"), e => e.getField("p"))) /
        fold(transform(col("arr"), e => e.getField("q")))).as("lambda_est"))
    joined.crossJoin(broadcast(lam))
      .select(col("i").as("dim"), col("v2").as("loading"), col("lambda_est"))
      .orderBy("dim")
  }

  private val qEmbedPcaPowerOracle =
    """WITH sv AS (
      |  SELECT vec_id, i - 1 AS pos,
      |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS x
      |  FROM embeddings CROSS JOIN range(1, 9) t(i)),
      |p AS (
      |  SELECT a.pos AS i, b.pos AS j, a.x AS xi, b.x AS xj
      |  FROM sv a JOIN sv b USING (vec_id)
      |  WHERE a.pos <= b.pos),
      |cov AS (
      |  SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
      |    round(((CAST(SUM(xi * xj) AS DOUBLE)
      |        - CAST(SUM(xi) AS DOUBLE) * CAST(SUM(xj) AS DOUBLE)
      |          / CAST(COUNT(*) AS DOUBLE))
      |      / (CAST(COUNT(*) AS DOUBLE) - 1.0)) / 1e12, 8) AS cov
      |  FROM p GROUP BY i, j),
      |fullm AS (
      |  SELECT i, j, cov FROM cov
      |  UNION ALL SELECT j, i, cov FROM cov WHERE i <> j),
      |rows_ AS (
      |  SELECT i, list(cov ORDER BY j) AS rv FROM fullm GROUP BY i),
      |v1 AS (
      |  SELECT i, list_reduce(rv, (a, b) -> a + b) AS v1 FROM rows_),
      |v1arr AS (SELECT list(v1 ORDER BY i) AS va FROM v1),
      |v2 AS (
      |  SELECT r.i, list_reduce(
      |      list_transform(range(1, len(r.rv) + 1), k -> r.rv[k] * va[k]),
      |      (a, b) -> a + b) AS v2
      |  FROM rows_ r, v1arr),
      |j AS (SELECT v2.i, v1.v1, v2.v2 FROM v2 JOIN v1 USING (i)),
      |lam AS (
      |  SELECT list_reduce(list(v1 * v2 ORDER BY i), (a, b) -> a + b) /
      |         list_reduce(list(v1 * v1 ORDER BY i), (a, b) -> a + b)
      |    AS lambda_est
      |  FROM j)
      |SELECT i AS dim, v2 AS loading, lambda_est
      |FROM j, lam ORDER BY dim""".stripMargin

  // ── batch radius search ───────────────────────────────────────────

  /** Batch RADIUS search — the retrieval twin of [[qEmbedCosineTopk]]:
    * a bounded SET of query vectors (a fixed 10-id batch), each returning ALL
    * corpus vectors within cosine ≥ τ rather than a fixed k. This is
    * the "find everything similar enough" primitive behind
    * recommendation candidate pools and eval-set leakage sweeps, and
    * its at-scale plan is deliberately NOT the LSH index: when the
    * query batch is corpus-small, broadcasting the normalized query
    * block and scanning the corpus ONCE map-side (one codegen'd dot
    * fold per (corpus row, query) — no shuffle before the final sort)
    * beats building band buckets, which only pay when BOTH sides are
    * corpus-sized (that regime is [[graft.queries.Dedup.qDedupEmbed]]).
    * Normalization is factored out per vector ([[VectorOps.normalized]],
    * 1 fold per pair), and the sequential fold is bit-identical to the
    * DuckDB oracle's list_reduce, so the τ comparison can never
    * straddle an engine-specific ulp. */
  def qAnnRange(s: SparkSession, dir: String, tau: Double = 0.3): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), VectorOps.normalized(col("embedding")).as("nvec"))
    // the query batch is a FIXED 10-id list, not a corpus-derived
    // predicate: radius search's production contract is "this batch of
    // queries against the (growing) corpus", so cost must scale with
    // the corpus alone — a %-of-corpus query set would silently grow
    // the batch with the data and quadratic-ify the sweep (measured
    // 12.8× at 10× before this pin; linear after)
    val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 500)
      .select(col("vec_id").as("query_id"), col("nvec").as("q_vec"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        VectorOps.dotD(col("nvec"), col("q_vec")).as("cosine"))
      .filter(col("cosine") >= tau)
      .orderBy("query_id", "vec_id")
  }

  private val qAnnRangeOracle = {
    val cos = VectorOps.dotDSql("c.nvec", "q.nvec")
    s"""WITH n AS (SELECT vec_id, ${VectorOps.normalizedSql("embedding")} AS nvec
       |  FROM embeddings)
       |SELECT q.vec_id AS query_id, c.vec_id, $cos AS cosine
       |FROM n c CROSS JOIN
       |  (SELECT * FROM n WHERE vec_id % 50 = 0 AND vec_id < 500) q
       |WHERE c.vec_id <> q.vec_id AND $cos >= 0.3
       |ORDER BY query_id, c.vec_id""".stripMargin
  }

  // ── k-means over embeddings (Lloyd's, deterministic both engines) ──

  /** Squared-distance argmin against PLAN-LITERAL centroids — one
    * codegen'd [[graft.functions.ArgminSqDist]] primitive loop per row
    * (bit-identical to [[argminCidHof]]'s k interpreted folds +
    * first-position-of-min, VectorKernelsSpec pins it): per-centroid
    * distances accumulate in the same ascending IEEE order as the
    * DuckDB mirror, and exact ties break toward the LOWEST centroid id
    * (`cents` is sorted). Wholly map-side: no shuffle, no join — the
    * centroid matrix rides the plan the way the LSH plane matrix
    * does. */
  private[graft] def argminCid(vec: Column,
      cents: Seq[(Long, Array[Double])]): Column = {
    val cids = array(cents.map(c => lit(c._1)): _*)
    val idx = graft.functions.VectorKernels.argminSqDist(vec, cents.map(_._2))
    // explicit null guard: under ANSI, ElementAt over a non-null literal
    // array reports nullable=false even with a nullable index, so a NULL
    // kernel result (malformed vector) would otherwise materialize as a
    // garbage 0 in external rows (VectorKernelsPropertySpec pins this)
    when(idx.isNotNull, element_at(cids, idx + lit(1)))
  }

  /** The k-interpreted-folds formulation — the spec's independent
    * witness that the [[graft.functions.ArgminSqDist]] kernel matches
    * the first-position-of-min semantics bit for bit. */
  private[graft] def argminCidHof(vec: Column,
      cents: Seq[(Long, Array[Double])]): Column = {
    val dists = cents.map { case (_, c) =>
      aggregate(zip_with(vec, lit(c), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    }
    val dl = array(dists: _*)
    val cids = array(cents.map(c => lit(c._1)): _*)
    val pos = array_position(dl, array_min(dl)).cast("int")
    // same ANSI ElementAt nullability guard as argminCid
    when(pos.isNotNull, element_at(cids, pos))
  }

  /** Lloyd's k-means fit: `iters` rounds of (map-side assignment
    * against plan-literal centroids) → (one (cid,pos) groupBy with
    * map-side combine over integer-scaled components) → (k×dims driver
    * collect to build the next round's literals). Returns
    * (cid, n_members, centroid) after the final update, cid-sorted;
    * clusters that lose every member drop out (documented semantics —
    * the SQL mirror's joins drop them identically).
    *
    * Determinism: assignment distances are sequential folds over
    * bit-exact doubles; component sums use the q_embed_centroid
    * integer-scaling trick (round(x·1e6) is an exact long, the
    * cross-row SUM is order-independent, and the mean is two IEEE
    * divisions both engines replay exactly) — so every iteration's
    * centroids, hence every assignment, is bit-identical to the DuckDB
    * unrolled-CTE mirror, ties and all.
    *
    * Scale: per iteration ONE pass over the corpus (no per-row state,
    * no crossJoin row explosion — k dot products per row inside
    * codegen) plus a k×dims-cell aggregation; the driver holds only
    * the k×dims matrix (the documented bounded-collect pattern, same
    * as the PCA/covariance accumulators). At 100 TB: identical shape,
    * k×dims literals broadcast with the plan. */
  private[graft] def kmeansFit(vecs: DataFrame, k: Int,
      iters: Int): Seq[(Long, Long, Array[Double])] = {
    var cents: Seq[(Long, Array[Double])] = vecs.filter(col("vec_id") < k)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    var fitted: Seq[(Long, Long, Array[Double])] = Seq.empty
    // round-20 optimization (guide §2.3 "aggregate before you shuffle"):
    // the update used to posexplode every vector into dims rows and
    // hash-aggregate n·dims (cid, pos) keys; one WIDE aggregate — dims
    // sum columns over element_at — feeds the same exact long sums
    // through dims·k cells with NO row explosion and no per-element
    // hash probe. `round(x·1e6)`/cast/SUM arithmetic is unchanged, so
    // every centroid (hence every assignment and every oracle hash) is
    // bit-identical; the count per cluster equals the old per-(cid,pos)
    // count on any well-formed corpus AND matches the DuckDB mirror's
    // COUNT(*) exactly even on ragged vectors.
    val dims = cents.headOption.map(_._2.length).getOrElse(0)
    val dimSums = (0 until dims).map(d =>
      sum(round(element_at(col("vec"), d + 1) * lit(1000000.0), 0)
        .cast(LongType)).as(s"_s$d"))
    // uniform-dims contract enforced IN the same aggregation pass
    // (round-20 advisory): dims is sized from the first k centroids, so
    // a corpus whose later vectors are LONGER would silently truncate
    // the trailing dimensions. min/max of size(vec) ride the update agg
    // for free; a ragged corpus fails loudly instead.
    val dimGuards = Seq(min(size(col("vec"))).as("_mind"),
      max(size(col("vec"))).as("_maxd"))
    for (_ <- 1 to iters) {
      val rows = vecs
        .select(argminCid(col("vec"), cents).as("cid"), col("vec"))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n"), (dimSums ++ dimGuards): _*)
        .collect() // k rows × dims cells — bounded, scale-invariant
      rows.foreach { r =>
        val (mind, maxd) = (r.getInt(2 + dims), r.getInt(3 + dims))
        require(mind == dims && maxd == dims,
          s"kmeansFit uniform-dims contract: centroid dims = $dims but " +
            s"cluster ${if (r.isNullAt(0)) "null" else r.getLong(0)} " +
            s"holds vectors sized [$mind, $maxd]")
      }
      fitted = rows.toSeq.map { r =>
        val n = r.getLong(1)
        // exact long → double (|ssum| < 2^53), then the same two IEEE
        // divisions DuckDB's CAST(ssum AS DOUBLE)/n/1e6 performs
        val arr = Array.tabulate(dims)(d =>
          r.getLong(2 + d).toDouble / n / 1000000.0)
        (r.getLong(0), n, arr)
      }.sortBy(_._1)
      cents = fitted.map(t => (t._1, t._3))
    }
    fitted
  }

  /** Shared DuckDB mirror of [[kmeansFit]]: WITH-clause body unrolling
    * `iters` assignment/update rounds over a centroid RELATION (the
    * SQL form of the plan-literal matrix — row_number ORDER BY dist,
    * cid is exactly first-position-of-min over cid-sorted literals).
    * Exposes `c$iters` (cid, n, cvec list) and `v` (vec_id, vec). */
  private[queries] def kmeansCtes(k: Int, iters: Int, dims: Int = 64,
      srcSql: String =
        "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings")
      : String = {
    def dist(vec: String, cvec: String) =
      s"""list_reduce(list_transform(list_zip($vec, $cvec),
         |      p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""a$i AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT v.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${dist("v.vec", "c.cvec")}, c.cid) AS rn
         |    FROM v CROSS JOIN c${i - 1} c) x
         |  WHERE rn = 1),
         |m$i AS (
         |  SELECT a.cid, s.pos, COUNT(*) AS n, SUM(s.sv) AS ssum
         |  FROM a$i a JOIN sv s USING (vec_id)
         |  GROUP BY a.cid, s.pos),
         |c$i AS (
         |  SELECT cid, MAX(n) AS n,
         |    list(CAST(ssum AS DOUBLE) / n / 1000000.0 ORDER BY pos) AS cvec
         |  FROM m$i GROUP BY cid)""".stripMargin
    }.mkString(",\n")
    s"""v AS ($srcSql),
       |sv AS (
       |  SELECT vec_id, i - 1 AS pos,
       |    CAST(round(vec[i] * 1000000.0) AS BIGINT) AS sv
       |  FROM v CROSS JOIN range(1, ${dims + 1}) t(i)),
       |c0 AS (SELECT vec_id AS cid, CAST(NULL AS BIGINT) AS n, vec AS cvec
       |       FROM v WHERE vec_id < $k),
       |$rounds""".stripMargin
  }

  /** Two-level (IVF-style) k-means fit — the composition the flat-k
    * sweeps motivated (SCALE.md round 14: flat assignment makes large k
    * LOSE because every vector pays k distance folds): a coarse k1-fit
    * partitions the corpus, then k2 fine centroids are fitted WITHIN
    * each coarse cluster, so assignment costs k1 + k2 distances instead
    * of k1·k2 — the q_ann_ivf shape applied to the clustering fit
    * itself. Fine seeds are each coarse cluster's k2 lowest-vec_id
    * members; every fine round is ONE corpus pass (coarse cid + fine
    * argmin map-side against plan-literal centroids) plus a
    * (cid, fid, pos) aggregation whose k1·k2·dims cells are the only
    * driver state — the documented bounded-collect pattern, scale-
    * invariant. Determinism: the same integer-scaled component sums and
    * sequential distance folds as [[kmeansFit]], so every centroid and
    * assignment is bit-identical to the DuckDB unrolled-CTE mirror
    * ([[twoLevelCtes]]), ties and all. */
  private[queries] def kmeansFitTwoLevel(vecs: DataFrame, k1: Int,
      iters1: Int, k2: Int, iters2: Int)
      : (Seq[(Long, Array[Double])], Map[Long, Seq[(Long, Array[Double])]]) = {
    val coarse = kmeansFit(vecs, k1, iters1).map(t => (t._1, t._3))
    // MATERIALIZE the coarse assignment before anything references cid:
    // fineCid's k1 CASE conditions each reference cid, and CollapseProject
    // would otherwise inline the k1×dims argmin into every condition AND
    // push it past the update-round's posexplode — measured ~33×64
    // re-evaluations of the coarse argmin per vector at 100× (a 26-minute
    // stage for what is a seconds-long pass). persist()+count(), NOT
    // localCheckpoint: only the CollapseProject barrier is needed (no
    // partitioning to preserve), and a checkpoint pins corpus-sized RAW
    // row blocks that cannot evict — the exact failure the Graph
    // round-15 audit abandoned checkpoints for at the 8 GiB 100× heap;
    // columnar cache blocks are compressed and evictable. At production
    // scale this is the materialized assignment table every IVF build
    // writes anyway.
    val assigned = vecs.select(col("vec_id"), col("vec"),
      argminCid(col("vec"), coarse).as("cid")).persist()
    assigned.count()
    val w = Window.partitionBy(col("cid")).orderBy(col("vec_id"))
    val seedRows = assigned.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k2)
      .select(col("cid"), (col("rn") - 1).cast(LongType).as("fid"), col("vec"))
      .collect() // ≤ k1×k2 seed rows — bounded driver state
    var fine: Map[Long, Seq[(Long, Array[Double])]] =
      seedRows.groupBy(_.getLong(0)).map { case (c, rows) =>
        c -> rows.map(r => (r.getLong(1), r.getSeq[Double](2).toArray))
          .sortBy(_._1).toSeq
      }
    // same wide-aggregate rewrite as [[kmeansFit]] (round-20): dims sum
    // columns over element_at instead of a ×dims posexplode — identical
    // exact long sums, k1·k2 rows × dims cells to the driver.
    val fDims = coarse.headOption.map(_._2.length).getOrElse(0)
    val fDimSums = (0 until fDims).map(d =>
      sum(round(element_at(col("vec"), d + 1) * lit(1000000.0), 0)
        .cast(LongType)).as(s"_s$d"))
    for (_ <- 1 to iters2) {
      val rows = assigned
        .select(col("cid"), fineCid(col("vec"), col("cid"), fine).as("fid"),
          col("vec"))
        .groupBy(col("cid"), col("fid"))
        .agg(count(lit(1)).as("n"), fDimSums: _*)
        .collect() // k1×k2 rows × dims cells — bounded, scale-invariant
      fine = rows.groupBy(_.getLong(0)).map { case (c, rs) =>
        c -> rs.toSeq.map { r =>
          val n = r.getLong(2)
          val arr = Array.tabulate(fDims)(d =>
            r.getLong(3 + d).toDouble / n / 1000000.0)
          (r.getLong(1), arr)
        }.sortBy(_._1)
      }
    }
    assigned.unpersist(false) // fit-internal frame: release the cache
    (coarse, fine)
  }

  /** Fine-centroid assignment within an already-assigned coarse
    * cluster — ONE codegen'd [[graft.functions.ArgminSqDistGrouped]]
    * probe into the cid's slice of the flat stacked fine matrix: k2
    * distance folds per row, never k1·k2. (The first cut was a
    * k1-branch CASE of per-cluster ArgminSqDist kernels; its generated
    * method inlined k1 full argmin loops, blew the JIT method-size
    * budget, and ran as INTERPRETED bytecode — a 7-minute stage at
    * 100× for what the grouped kernel does in seconds. Same IEEE
    * sequence, same lowest-fid tie-break; VectorKernelsSpec pins
    * bit-equality against the CASE witness.) */
  private[graft] def fineCid(vec: Column, cid: Column,
      fine: Map[Long, Seq[(Long, Array[Double])]]): Column =
    graft.functions.VectorKernels.argminSqDistGrouped(vec, cid, fine)

  /** The k1-branch CASE-of-argmin formulation — the spec's independent
    * witness for [[graft.functions.ArgminSqDistGrouped]] (never on a
    * hot path: see [[fineCid]]). */
  private[graft] def fineCidCaseWitness(vec: Column, cid: Column,
      fine: Map[Long, Seq[(Long, Array[Double])]]): Column = {
    val sorted = fine.toSeq.sortBy(_._1)
    sorted.tail.foldLeft(
      when(cid === lit(sorted.head._1), argminCid(vec, sorted.head._2))) {
      case (acc, (c, cents)) => acc.when(cid === lit(c), argminCid(vec, cents))
    }
  }

  /** DuckDB mirror of [[kmeansFitTwoLevel]]: [[kmeansCtes]] for the
    * coarse fit, then coarse assignment (`ac`/`av`), per-cluster fine
    * seeds (`f0`, k2 lowest vec_ids per cid), `iters2` fine rounds
    * (`fa_i`/`fm_i`/`f_i` with composite (cid, fid) keys), ending in
    * `f$iters2` and the carried `av`. */
  private[queries] def twoLevelCtes(k1: Int, iters1: Int, k2: Int,
      iters2: Int, dims: Int = 64,
      srcSql: String =
        "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings")
      : String = {
    def dist(vec: String, cvec: String) =
      s"""list_reduce(list_transform(list_zip($vec, $cvec),
         |      p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)""".stripMargin
    val fineRounds = (1 to iters2).map { i =>
      s"""fa$i AS (
         |  SELECT vec_id, cid, fid FROM (
         |    SELECT a.vec_id, a.cid, f.fid,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${dist("a.vec", "f.cvec")}, f.fid) AS rn
         |    FROM av a JOIN f${i - 1} f ON f.cid = a.cid) x
         |  WHERE rn = 1),
         |fm$i AS (
         |  SELECT a.cid, a.fid, s.pos, COUNT(*) AS n, SUM(s.sv) AS ssum
         |  FROM fa$i a JOIN sv s USING (vec_id)
         |  GROUP BY a.cid, a.fid, s.pos),
         |f$i AS (
         |  SELECT cid, fid, MAX(n) AS n,
         |    list(CAST(ssum AS DOUBLE) / n / 1000000.0 ORDER BY pos) AS cvec
         |  FROM fm$i GROUP BY cid, fid)""".stripMargin
    }.mkString(",\n")
    s"""${kmeansCtes(k1, iters1, dims, srcSql)},
       |ac AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT v.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${dist("v.vec", "c.cvec")}, c.cid) AS rn
       |    FROM v CROSS JOIN c$iters1 c) x
       |  WHERE rn = 1),
       |av AS (SELECT v.vec_id, ac.cid, v.vec FROM v JOIN ac USING (vec_id)),
       |f0 AS (
       |  SELECT cid, CAST(rn - 1 AS BIGINT) AS fid, vec AS cvec FROM (
       |    SELECT cid, vec, row_number() OVER (PARTITION BY cid
       |      ORDER BY vec_id) AS rn
       |    FROM av) t
       |  WHERE rn <= $k2),
       |$fineRounds""".stripMargin
  }

  /** K-MEANS clustering over the embedding corpus (k=8, 2 Lloyd
    * rounds) — the semantic-clustering primitive behind data-mix
    * design, diversity sampling, and SemDeDup-style cluster-scoped
    * dedup. Output: per (cluster, first-8 components): member count
    * and the rounded centroid — the q_embed_centroid output shape,
    * but for LEARNED clusters instead of given labels. */
  def qEmbedKmeans(s: SparkSession, dir: String, k: Int = 8,
      iters: Int = 2, outPos: Int = 8): DataFrame = {
    val vecs = Tables.embeddings(s, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("vec"))
    val fitted = kmeansFit(vecs, k, iters)
    val rows = fitted.flatMap { case (cid, n, arr) =>
      (0 until math.min(outPos, arr.length)).map(p => (cid, p.toLong, n, arr(p)))
    }
    import s.implicits._
    rows.toDF("cluster_id", "pos", "n_members", "cv")
      .select(col("cluster_id"), col("pos"), col("n_members"),
        round(col("cv"), 6).as("centroid"))
      .orderBy("cluster_id", "pos")
  }

  private val qEmbedKmeansOracle =
    s"""WITH ${kmeansCtes(8, 2)}
       |SELECT c.cid AS cluster_id, t.i - 1 AS pos, c.n AS n_members,
       |  round(c.cvec[t.i], 6) AS centroid
       |FROM c2 c CROSS JOIN range(1, 9) t(i)
       |ORDER BY cluster_id, pos""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_range" -> ((s, d) => qAnnRange(s, d)),
    "q_embed_kmeans" -> ((s, d) => qEmbedKmeans(s, d)),
    "q_embed_pca_power" -> ((s, d) => qEmbedPcaPower(s, d)),
    "q_embed_covariance" -> ((s, d) => qEmbedCovariance(s, d)),
    "q_embed_covariance_full" -> ((s, d) => covarianceFull(s, d)),
    "q_embed_centroid" -> ((s, d) => qEmbedCentroid(s, d)),
    "q_embed_quant" -> (qEmbedQuant _),
    "q_embed_cosine_topk" -> (qEmbedCosineTopk _),
    "q_ann_lsh" -> (qAnnLsh _),
    "q_ann_ivf" -> (qAnnIvf _),
    "q_ann_recall" -> (qAnnRecall _),
    "q_ann_recall_ivf" -> (qAnnRecallIvf _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_ann_range" -> qAnnRangeOracle,
    "q_embed_kmeans" -> qEmbedKmeansOracle,
    "q_embed_pca_power" -> qEmbedPcaPowerOracle,
    "q_embed_covariance" -> qEmbedCovarianceOracle,
    "q_embed_covariance_full" -> covarianceOracle(64),
    "q_embed_centroid" -> qEmbedCentroidOracle,
    "q_embed_quant" -> qEmbedQuantOracle,
    "q_embed_cosine_topk" -> qEmbedCosineTopkOracle,
    "q_ann_lsh" -> qAnnLshOracle,
    "q_ann_ivf" -> qAnnIvfOracle,
    "q_ann_recall" -> qAnnRecallOracle,
    "q_ann_recall_ivf" -> qAnnRecallIvfOracle
  )
}
