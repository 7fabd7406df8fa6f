package graft

import org.apache.spark.sql.functions._
import graft.queries.Curation

/** Quantifies WHY the z-order layout exists: a filter on the SECOND
  * dimension prunes most z-buckets, while a layout sorted on the first
  * key alone cannot skip anything for that filter. (Value-correctness
  * of the manifest itself is oracle-gated in Verify/check.) */
class ZorderSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("z-layout prunes second-dimension filters; single-key sort cannot") {
    val man = Curation.qZorderLayout(spark, sf01).collect()
    val nBuckets = man.length
    assert(nBuckets >= 64, s"need fine-grained buckets, got $nBuckets")
    // supplier-key point filter: buckets whose [sk_min, sk_max] bounding
    // box must be read
    val target = 50L
    val zTouched = man.count(r => r.getLong(4) <= target && target <= r.getLong(5))
    assert(zTouched.toDouble / nBuckets <= 0.30,
      s"z-layout should prune ≥70% of buckets for sk=$target: $zTouched/$nBuckets")
    // the SAME bucket count from a partkey-sorted layout: bucket by
    // partkey rank ranges → every bucket spans ~the full supplier range
    val li = Tables.lineitem(spark, sf01)
    val pmax = li.agg(max("l_partkey")).head.getLong(0)
    val sorted = li
      .withColumn("bucket", expr(s"(l_partkey * $nBuckets) div (${pmax + 1})"))
      .groupBy("bucket")
      .agg(min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
      .collect()
    val sTouched = sorted.count(r => r.getLong(1) <= target && target <= r.getLong(2))
    assert(sTouched == sorted.length,
      s"partkey-sorted buckets should all contain sk=$target: $sTouched/${sorted.length}")
    // and the z-layout still bounds the FIRST dimension comparably:
    // per-bucket partkey extent stays a small fraction of the domain
    val avgPkExtent = man.map(r => (r.getLong(3) - r.getLong(2)).toDouble).sum / nBuckets
    assert(avgPkExtent / pmax <= 0.30,
      s"z buckets must also bound partkey: avg extent $avgPkExtent of $pmax")
  }
}
