package graft

import graft.queries.Similarity

/** The treeAggregate full-dimension covariance vs its dims²-explosion
  * verification twin (q_embed_covariance). */
class CovarianceSpec extends SparkSpec {

  test("treeAggregate covariance equals the explosion form bit-for-bit on dims=8") {
    val fast = Similarity.covarianceFull(spark, sf, dims = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val slow = Similarity.qEmbedCovariance(spark, sf, dims = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (k, (n, cov)) =>
      val (n2, cov2) = slow(k)
      assert(n == n2, s"count at $k")
      // bit-identical, not approximately equal: same integer power sums,
      // same IEEE op order, same HALF_UP rounding
      assert(java.lang.Double.doubleToLongBits(cov) ==
        java.lang.Double.doubleToLongBits(cov2), s"cov at $k: $cov vs $cov2")
    }
  }

  test("full 64-dim triangle: 2080 cells from one bounded accumulator") {
    val full = Similarity.covarianceFull(spark, sf, dims = 64).collect()
    assert(full.length == 64 * 65 / 2)
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(full.forall(_.getLong(2) == nVecs))
    // diagonal entries are variances: non-negative
    full.filter(r => r.getLong(0) == r.getLong(1))
      .foreach(r => assert(r.getDouble(3) >= 0.0, s"var at ${r.getLong(0)}"))
  }
}
