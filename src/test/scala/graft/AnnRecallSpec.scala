package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** q_ann_recall — the oracle-gated recall@k eval primitive (round 17).
  * The DuckDB hash gate proves the numbers; these pins prove the
  * CONTRACT: recall bounds, the multi-probe ⊇ single-probe candidate
  * monotonicity the Hamming-1 fan-out is supposed to buy, and the
  * WindowGroupLimit rewrite that keeps the per-query top-k windows
  * from materializing full sorts at scale. */
class AnnRecallSpec extends SparkSpec {

  // bounds derive from the ACTUAL corpus size (round-17 advisory: a
  // hard-coded 500 would spuriously fail if the fixture grows and
  // silently weaken the pruning pins if it shrinks)
  private lazy val corpusN: Long = Tables.embeddings(spark, sf).count()

  test("recall rows are bounded and panel-complete") {
    val rows = Similarity.qAnnRecall(spark, sf).collect()
    assert(rows.length == 32, s"one row per panel query, got ${rows.length}")
    rows.foreach { r =>
      val (cand, hits, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(cand >= 0 && cand < corpusN, s"candidates out of range: $cand")
      assert(hits >= 0 && hits <= 10, s"hits out of range: $hits")
      assert(recall >= 0.0 && recall <= 1.0, s"recall out of range: $recall")
      assert(recall == hits / 10.0)
      assert(hits <= cand, s"hits $hits cannot exceed candidates $cand")
    }
    // the planted corpus has genuine near-dup structure: the panel must
    // find SOMETHING or the candidate machinery is broken
    assert(rows.map(_.getLong(2)).sum > 0, "zero hits across the whole panel")
  }

  test("Hamming-1 multi-probe candidates are a superset of the " +
    "exact-bucket probe (recall can only go up, index size unchanged)") {
    val e = Tables.embeddings(spark, sf)
      .withColumn("bucket", Similarity.lshSignBucket(col("embedding")))
    val corpus = e.select(col("vec_id"),
      explode(Similarity.lshBandKeys(col("bucket"))).as("band_key"))
    def candidates(flips: Seq[Int]): Set[(Long, Long)] = {
      val q = e.filter(col("vec_id") < 32)
        .select(col("vec_id").as("q_id"),
          explode(Similarity.lshProbeKeys(col("bucket"), flips)).as("band_key"))
      corpus.join(q, "band_key").filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val exactOnly = candidates(Seq(0))
    val multi = candidates(Seq(0, 1, 2, 4))
    assert(exactOnly.subsetOf(multi),
      s"multi-probe lost ${(exactOnly -- multi).size} exact-bucket pairs")
    assert(multi.size > exactOnly.size,
      "multi-probe added no candidates on the planted corpus")
  }

  test("the rank<=k windows plan as WindowGroupLimit, not full sorts") {
    val plan = Similarity.qAnnRecall(spark, sf).queryExecution
      .executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rank filter to push a group limit:\n$plan")
  }

  test("candidate volume is the geometry's closed-form collision " +
    "fraction, not a data accident") {
    // 4 bands x 3 bits, exact-bucket probe: P(pair shares >=1 band) for
    // near-uniform bucket occupancy is 1-(7/8)^4 = 41.4%. The annrecall
    // arm measured 42.1% at n=2000/20k/200k; pin the same physics here
    // at n=500 with a band wide enough for planted-near-dup excess.
    val e = Tables.embeddings(spark, sf)
      .withColumn("bucket", Similarity.lshSignBucket(col("embedding")))
    val corpus = e.select(col("vec_id"),
      explode(Similarity.lshBandKeys(col("bucket"))).as("band_key"))
    val q = e.filter(col("vec_id") < 32)
      .select(col("vec_id").as("q_id"),
        explode(Similarity.lshProbeKeys(col("bucket"), Seq(0))).as("band_key"))
    val pairs = corpus.join(q, "band_key")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct().count()
    val n = e.count()
    val frac = pairs.toDouble / (32.0 * (n - 1))
    assert(frac > 0.30 && frac < 0.55,
      f"exact-bucket candidate fraction $frac%.3f strayed from the " +
        "1-(7/8)^4 = 0.414 collision volume")
  }

  test("IVF recall twin: panel-complete, bounded, and candidates are " +
    "LIST-membership-bounded (a vector lives in exactly one of the 16 " +
    "lists, a query probes 2)") {
    val rows = Similarity.qAnnRecallIvf(spark, sf).collect()
    assert(rows.length == 32)
    rows.foreach { r =>
      val (cand, hits, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      // 2-of-16 lists: candidates can never reach the whole corpus
      assert(cand >= 0 && cand < corpusN, s"candidates out of range: $cand")
      assert(hits >= 0 && hits <= 10 && hits <= cand)
      assert(recall == hits / 10.0 && recall >= 0.0 && recall <= 1.0)
    }
    assert(rows.map(_.getLong(2)).sum > 0, "zero hits across the panel")
    // the probe is a real PRUNE: total candidates must be well under
    // panel × corpus (the LSH multi-probe form cannot promise this —
    // that contrast is the measured annrecall-arm story)
    val total = rows.map(_.getLong(1)).sum
    assert(total < 32L * corpusN / 2,
      s"IVF candidates $total not pruning below half the corpus")
  }
}
