package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * Exact cosine is computed only for candidates. At 100 TB the bucket
    * id is one groupBy key — the full pairwise cosine never happens.
    * No oracle (approximate by construction); SimilaritySpec asserts
    * recall against the exact top-k. */
  def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val dims = 64
    val nPlanes = 12
    val rng = new scala.util.Random(7)
    val planes: Seq[Seq[Double]] =
      Seq.fill(nPlanes)(Seq.fill(dims)(rng.nextGaussian()))

    def signBits(vec: org.apache.spark.sql.Column) = {
      val bits = planes.zipWithIndex.map { case (p, i) =>
        val proj = aggregate(
          zip_with(vec, lit(p.toArray), (x, w) => x.cast(DoubleType) * w),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, lit(1L << i)).otherwise(0L)
      }
      bits.reduce(_ + _)
    }

    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", signBits(col("embedding")))
      .withColumn("bands", array((0 until 4).map(i =>
        concat_ws(":", lit(i), expr(s"(bucket >> ${i * 3}) & 7"))): _*))
    val q = e.filter(col("vec_id") === 0)
      .select(explode(col("bands")).as("band_key"), col("embedding").as("q_vec"))
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

  /** IVF-style approximate top-k: a fixed set of 16 "centroid" vectors
    * (deterministically the vectors with vec_id 1..16 — a k-means fit
    * would refine them at scale) partitions the corpus by nearest
    * centroid; the query probes only its nprobe=2 nearest lists. The
    * centroid assignment is a broadcast join (16 rows), the search
    * touches ~nprobe/16 of the data — at 100 TB the inverted lists
    * become partition keys and the probe prunes partitions. No oracle
    * (approximate); SimilaritySpec checks recall vs the exact top-k. */
  def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val nprobe = 2
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val centroids = e.filter(col("vec_id").between(1, 16))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_vec"))
    val wBest = Window.partitionBy(col("vec_id")).orderBy(col("cdot").desc, col("centroid_id"))
    val assigned = e.crossJoin(broadcast(centroids))
      .withColumn("cdot", VectorOps.cosine(col("embedding"), col("c_vec")))
      .withColumn("crn", row_number().over(wBest))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("label"), col("embedding"), col("centroid_id"))
    val queryLists = assigned.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("cdot", VectorOps.cosine(col("q_vec"), col("c_vec")))
      .orderBy(col("cdot").desc, col("centroid_id"))
      .limit(nprobe)
      .select(col("centroid_id"), col("q_vec"))
    assigned.filter(col("vec_id") =!= 0)
      .join(broadcast(queryLists), "centroid_id")
      .select(col("vec_id"), col("label"),
        VectorOps.cosine(col("embedding"), col("q_vec")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_cosine_topk" -> (qEmbedCosineTopk _),
    "q_ann_lsh" -> (qAnnLsh _),
    "q_ann_ivf" -> (qAnnIvf _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_embed_cosine_topk" -> qEmbedCosineTopkOracle
  )
}
