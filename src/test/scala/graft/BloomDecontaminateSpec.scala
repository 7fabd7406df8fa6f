package graft

import org.apache.spark.sql.functions._

/** q_bloom_decontaminate is declared-approximate (rows-only at the
  * oracle gate); this spec pins its actual contract against the exact
  * q_decontaminate on the same corpus:
  *
  *  1. NO FALSE NEGATIVES — every (doc, shared-gram count) the exact
  *     query reports is covered: the Bloom candidate set contains every
  *     contaminated doc, and per doc reports at least as many candidate
  *     grams as truly shared grams (a truly shared gram always has all
  *     k bits set).
  *  2. BOUNDED FALSE POSITIVES — with n eval grams in m bits and k = 3
  *     probes, the per-gram FP rate is (1 - e^(-kn/m))^k; m auto-sizes
  *     to ≥ 32·n (round-15 advisory: a FIXED m's rate grows with the
  *     eval corpus), capping the rate at ≈7×10⁻⁴ for ANY corpus size,
  *     so candidate gram counts may exceed the exact counts by at most
  *     a small factor.
  */
class BloomDecontaminateSpec extends SparkSpec {

  test("bloom candidates are a superset of exact contamination, with bounded FPs") {
    val exact = graft.queries.Curation.qDecontaminate(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = graft.queries.Curation.qBloomDecontaminate(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // superset on docs, and per-doc candidate grams >= truly shared grams
    exact.foreach { case (doc, nShared) =>
      assert(bloom.contains(doc), s"doc $doc contaminated but not a bloom candidate")
      assert(bloom(doc) >= nShared,
        s"doc $doc: bloom reports ${bloom(doc)} candidate grams < $nShared truly shared")
    }

    // false positives bounded: total candidate grams within 1.25x + slack
    // of the true total (the FP rate at this fill factor is far smaller;
    // the slack keeps the spec stable if the corpus grows)
    val totalExact = exact.values.sum
    val totalBloom = bloom.values.sum
    assert(totalBloom <= (totalExact * 1.25 + 10).toLong,
      s"bloom candidate grams $totalBloom vs exact $totalExact — FP rate too high")
    // and spurious docs (candidates with zero truly shared grams) are rare
    val spurious = bloom.keySet -- exact.keySet
    assert(spurious.size <= math.max(2, exact.size / 4),
      s"${spurious.size} spurious candidate docs vs ${exact.size} real: $spurious")
  }

  test("the bloom bit table stays small and broadcastable") {
    // the broadcast side is at most m/64 longs regardless of corpus size
    val bits = graft.queries.Curation.qBloomDecontaminate(spark, sf)
    val plan = bits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"bloom words should broadcast:\n${plan.take(1500)}")
  }
}
