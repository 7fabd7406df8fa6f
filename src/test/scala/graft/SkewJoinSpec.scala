package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under heavy skew") {
    // 90% of the big side lands on one key — the pathological shape
    val big = (0 until 20000).map { i =>
      (if (i % 10 == 0) i.toLong % 100 else 7L, i.toLong)
    }.toDF("k", "row_id")
    val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("sk", "payload")

    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "row_id", "payload")
    val salted = SkewJoin.saltedJoin(big, small, Seq("k" -> "sk"),
      saltSource = col("row_id"), salts = 8)
      .select("k", "row_id", "payload")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted plan shuffles each side exactly once (no extra exchanges)") {
    // the mitigation must not add exchanges beyond the two shuffle-join
    // sides: salting happens inside the existing shuffles (salt is just
    // an extra hash-partitioning column), replication is a map-side
    // explode. Broadcast off so the join shape is the 100 TB SMJ one.
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val big = (0 until 1000).map(i => (7L, i.toLong)).toDF("k", "row_id")
      val small = (0L until 10L).map(k => (k, s"d_$k")).toDF("sk", "payload")
      val salted = SkewJoin.saltedJoin(big, small, Seq("k" -> "sk"),
        saltSource = col("row_id"), salts = 8)
      val plan = salted.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
      // and the salt participates in both partitionings
      assert("hashpartitioning\\(k#\\d+L, _graft_salt".r.findFirstIn(plan).isDefined ||
        plan.contains("_graft_salt"), s"salt not in partitioning:\n$plan")
    }
  }

  test("AQE skew handling splits the hot partition at runtime") {
    // The alternative to the manual salt on a modern cluster: leave the
    // join alone and let AQE re-plan after the map stage reveals the
    // skew. Thresholds are shrunk so the test corpus counts as skewed;
    // the assertion is on the FINAL adaptive plan after materialization
    // (that's when AQE has replaced the skewed read with split reads).
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB") {
      val big = (0 until 200000).map { i =>
        (if (i % 10 == 0) i.toLong % 100 else 7L, i.toLong)
      }.toDF("k", "row_id")
      val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("sk", "payload")
      val joined = big.join(small, col("k") === col("sk"))
      // collect() drives THIS DataFrame's QueryExecution (count() would
      // build a different plan and leave this one unexecuted/non-final)
      assert(joined.collect().length == big.count(), "join must be key-complete")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n${plan.take(500)}")
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not mark the join/read as skew-handled:\n${plan.take(2000)}")
    }
  }

  test("salt spreads the hot key over many partitions") {
    val big = (0 until 8000).map(i => (7L, i.toLong)).toDF("k", "row_id")
    val saltCounts = big
      .withColumn("_graft_salt", pmod(hash(col("row_id")), lit(8)))
      .groupBy("_graft_salt").count().collect()
    assert(saltCounts.length == 8) // all 8 salt buckets in use
    assert(saltCounts.map(_.getLong(1)).max < 8000 * 0.25) // no bucket dominates
  }
}
