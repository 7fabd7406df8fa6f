package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_cosine_topk" -> (qEmbedCosineTopk _),
    "q_ann_lsh" -> (qAnnLsh _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_embed_cosine_topk" -> qEmbedCosineTopkOracle
  )
}
