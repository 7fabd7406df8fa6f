package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-21 measurement aid (guide §1): decomposes the graph entries'
  * timed span into (a) the edge-spine build (the per-entry corpus
  * aggregation every graph query pays) and (b) the iteration rounds,
  * by timing the spine pieces in isolation at the bench session shape.
  * Not a registry surface; numbers land in OPTIMIZATION_r21.md.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(body: => Unit): Unit = {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); body
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[gprobe] $label%-26s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1)
      .write.mode("overwrite").format("noop").save()

    def spine() = {
      val perOrder = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .groupBy("l_orderkey").agg(collect_set(col("l_suppkey")).as("ss"))
      val p0 = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(perOrder, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast(LongType).as("c"),
          explode(col("ss")).as("s0"))
        .select(col("c"), (col("s0") + lit(1000000L)).cast(LongType).as("sp"))
      p0.select(col("c").as("u"), col("sp").as("v"))
        .union(p0.select(col("sp").as("u"), col("c").as("v")))
        .groupBy("u").agg(collect_set(col("v")).as("un"))
    }
    time("perOrder agg only") {
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .groupBy("l_orderkey").agg(collect_set(col("l_suppkey")).as("ss"))
        .write.mode("overwrite").format("noop").save()
    }
    time("adjacency spine (noop)") {
      spine().write.mode("overwrite").format("noop").save()
    }
    time("spine explode+sort+persist") {
      val e = spine().select(col("u"), explode(col("un")).as("v"))
        .sortWithinPartitions("u").persist()
      e.write.mode("overwrite").format("noop").save()
    }
    time("whole q_graph_bfs") {
      queries.Graph.qGraphBfs(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    time("whole q_pagerank") {
      queries.Graph.qPagerank(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    // simhash decomposition: the 128-sum signature aggregation vs the
    // banded candidate join built on top of it. The SIG-STAGE plan is
    // printed here because the registry entry's localCheckpoint
    // truncates it out of the entry's own PlanDump (the round-20
    // semdedup evidence situation): [gprobe-plan] lines are the
    // committed plans/r21 evidence for the SimhashSig aggregate.
    println("[gprobe-plan] simhash sig128 stage:\n" +
      queries.Dedup.simhashSig128(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    time("simhash sig128 (noop)") {
      queries.Dedup.simhashSig128(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    time("whole q_dedup_simhash") {
      queries.Dedup.qDedupSimhash(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
