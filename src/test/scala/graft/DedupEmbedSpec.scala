package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._

/** Embed near-dup via LSH candidates: recall against the brute-force
  * ground truth on a corpus with planted near-duplicates, plus plan
  * hygiene — the pipeline must stay fully distributed (the round-1
  * version collected the corpus to the driver; this pins the fix). */
class DedupEmbedSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64
  private val threshold = 0.95

  // 200 random vectors + 50 perturbed near-dups (cosine ≈ 0.999)
  private lazy val corpus: Seq[(Long, Array[Double])] = {
    val rng = new scala.util.Random(42)
    val base = (0L until 200L).map(i => (i, Array.fill(dims)(rng.nextGaussian())))
    val dups = (0 until 50).map { j =>
      val (id, v) = base(j * 3)
      (1000L + id, v.map(_ + rng.nextGaussian() * 0.05))
    }
    base ++ dups
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }
      s
    }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  private lazy val truePairs: Set[(Long, Long)] = (for {
    i <- corpus.indices.iterator
    j <- (i + 1) until corpus.size
    if cosine(corpus(i)._2, corpus(j)._2) >= threshold
  } yield {
    val (a, b) = (corpus(i)._1, corpus(j)._1)
    (math.min(a, b), math.max(a, b))
  }).toSet

  test("LSH near-dup pairs: recall >= 0.95 and zero false positives") {
    assert(truePairs.size >= 50, s"test corpus should plant >=50 true pairs, got ${truePairs.size}")
    val got = Dedup.embedNearDupPairs(
        corpus.toDF("vec_id", "embedding"), "vec_id", "embedding", dims, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & truePairs).size.toDouble / truePairs.size
    assert(recall >= 0.95, s"recall=$recall (${got.size} found, ${truePairs.size} true)")
    // exact-cosine verification means candidates never leak through
    assert((got -- truePairs).isEmpty, s"false positives: ${(got -- truePairs).take(5)}")
  }

  test("q_dedup_embed plan is fully distributed — no driver materialization") {
    val plan = Dedup.qDedupEmbed(spark, sf).queryExecution.executedPlan.toString
    Seq("MapPartitions", "ExternalRDD", "Scan ExistingRDD", "LocalTableScan")
      .foreach(marker => assert(!plan.contains(marker),
        s"plan contains $marker (driver-side or RDD escape hatch):\n${plan.take(1500)}"))
  }
}
