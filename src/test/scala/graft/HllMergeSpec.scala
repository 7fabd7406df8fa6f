package graft

import org.apache.spark.sql.functions._

/** q_agg_hll_merge's declared-approximate contract (the entry is
  * `no_oracle`: DuckDB's approx_distinct is a different HLL
  * implementation, so the bound is pinned here instead of hash-gated).
  *
  * The load-bearing fact (measured, see the query's scaladoc): neither
  * the direct nor the union path is bit-deterministic across
  * aggregation tree shapes — the sketch contract is the ε-bound, so
  * re-sharding/re-partitioning must agree within ~1 %, not exactly.
  */
class HllMergeSpec extends SparkSpec {
  import spark.implicits._

  private def within1pct(a: Long, b: Long): Boolean =
    math.abs(a - b) * 100 <= math.max(a, b)

  test("union estimates across shard counts (2/8/32) agree within 1%") {
    val ests = Seq(2, 8, 32).map { n =>
      graft.queries.Profiling.qAggHllMerge(spark, sf, shards = n)
        .head().getLong(0)
    }
    assert(ests.combinations(2).forall { case Seq(a, b) => within1pct(a, b) },
      s"shard counts disagree beyond 1%: $ests")
  }

  test("union estimates across input partitionings agree within 1%") {
    // same value set crammed into 1 partition vs sprayed over 13: the
    // per-task partial sketches differ wildly; the estimates must stay
    // inside the sketch tolerance (bit-equality is NOT promised — the
    // partial/final union round-trip is tree-shape-sensitive, measured
    // 1007 vs 1010 on this fixture across shuffle configs)
    val vals = (1L to 5000L).map(i => (i % 997) * 31L)
    def est(parts: Int): Long =
      vals.toDF("v").repartition(parts)
        .withColumn("shard", pmod(col("v"), lit(8)))
        .groupBy("shard").agg(expr("hll_sketch_agg(v, 12)").as("sk"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))"))
        .head().getLong(0)
    val (a, b) = (est(1), est(13))
    assert(within1pct(a, b), s"$a vs $b beyond 1%")
    // and both inside the lgK=12 ε-bound of the true 997
    assert(math.abs(a - 997) * 100 <= 2 * 997 && math.abs(b - 997) * 100 <= 2 * 997)
  }

  test("union-path estimates are exact below sparse-mode capacity") {
    // a 300-distinct column sits in the sketch's exact (coupon) regime
    // even through shard-union merges
    val r = (1L to 10000L).map(i => i % 300).toDF("v")
      .withColumn("shard", pmod(col("v"), lit(8)))
      .groupBy("shard").agg(expr("hll_sketch_agg(v, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      .crossJoin(broadcast(
        (1L to 10000L).map(i => i % 300).toDF("v")
          .agg(countDistinct(col("v")).as("exact"))))
      .head()
    assert(r.getLong(0) == r.getLong(1),
      s"est ${r.getLong(0)} != exact ${r.getLong(1)}")
  }

  test("realized error is inside the lgK=12 bound on the corpus column") {
    val r = graft.queries.Profiling.qAggHllMerge(spark, sf).head()
    val errBp = r.getLong(2)
    assert(errBp < 200, s"err $errBp bp >= 2% at lgK=12")
  }
}
