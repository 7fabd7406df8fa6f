package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Round-16 task 3: the persisted dedup/ANN band indexes are real
  * BUCKETED parquet tables, and the nightly probe join must read them
  * WITHOUT an exchange on the index side — at lake scale the index is
  * the corpus-sized side, and re-shuffling it every night is exactly
  * the cost `bucketBy` exists to delete. These specs pin the physical
  * plan: with broadcast off (modeling a batch too large to broadcast —
  * the regime where the join strategy matters), the candidate join's
  * index side contains the bucketed scan and ZERO ShuffleExchange
  * nodes between the join and that scan. */
class BucketedIndexSpec extends SparkSpec {

  private def executedPlan(df: DataFrame): SparkPlan = {
    df.write.mode("overwrite").format("noop").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def hasBucketScan(p: SparkPlan): Boolean = p.collect {
    case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
  }.nonEmpty

  private def isJoin(p: SparkPlan): Boolean = p match {
    case _: SortMergeJoinExec | _: ShuffledHashJoinExec |
         _: BroadcastHashJoinExec => true
    case _ => false
  }

  /** The candidate join's index side: for the LOWEST join above the
    * bucketed scan (its scan-bearing child contains no further join),
    * that whole child subtree must be exchange-free — the bucket
    * HashPartitioning feeds the join directly. */
  private def assertIndexSideExchangeFree(df: DataFrame, what: String): Unit = {
    val plan = executedPlan(df)
    val bucketedScans = plan.collect {
      case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
    }
    assert(bucketedScans.nonEmpty,
      s"$what: probe plan must read the bucketed index table:\n$plan")
    assert(bucketedScans.forall(_.bucketedScan),
      s"$what: the index scan must be a BUCKETED scan (grouped by bucket " +
        s"files), not a plain file scan:\n${bucketedScans.mkString("\n")}")
    val probeSides = plan.collect {
      case j if isJoin(j) => j.children.filter(c =>
        hasBucketScan(c) && c.collect { case x if isJoin(x) => x }.isEmpty)
    }.flatten
    assert(probeSides.nonEmpty,
      s"$what: no join found directly above the bucketed index scan:\n$plan")
    probeSides.foreach { side =>
      val exchanges = side.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"$what: the index side of the probe join must NOT shuffle " +
          s"(bucket partitioning already co-locates it); found:\n" +
          exchanges.map(_.toString.split("\n").head).mkString("\n"))
    }
  }

  test("q_dedup_incremental_near probes the bucketed minhash index " +
    "with no exchange above the index scan") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assertIndexSideExchangeFree(
        queries.Dedup.qDedupIncrementalNear(spark, sf), "nightly minhash")
    }
  }

  test("q_dedup_embed_incremental probes the bucketed LSH index " +
    "with no exchange above the index scan") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assertIndexSideExchangeFree(
        queries.Dedup.qDedupEmbedIncremental(spark, sf), "embed LSH")
    }
  }

  test("q_dedup_index_append: night-2 append lands as per-bucket files " +
    "in the SAME table (no rebuild) and both nights' probes stay " +
    "exchange-free on the index side") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val out = queries.Dedup.qDedupIndexAppend(spark, sf)
      assertIndexSideExchangeFree(out, "two-night append")
      // the append appended: the table dir holds MORE files than the
      // night-1 overwrite wrote (night 1 = one file per bucket from the
      // pre-write repartition; night 2 adds admitted signatures as
      // fresh per-bucket files)
      val loc = spark.sql("DESCRIBE TABLE EXTENDED graft_idx_append")
        .filter(org.apache.spark.sql.functions.col("col_name") === "Location")
        .head.getString(1)
      val files = new java.io.File(new java.net.URI(loc))
        .listFiles().count(_.getName.startsWith("part-"))
      assert(files > 8,
        s"append must add per-bucket files beyond the 8 night-1 buckets, got $files")
      // and the appended index is what wave 2 probed: wave-2 rows exist
      // (replays of wave-1 admits are only catchable through the append)
      import org.apache.spark.sql.functions.col
      assert(out.filter(col("wave") === 2).count() > 0,
        "wave-2 pairs must exist (they require the appended index)")
    }
  }
}
