package graft

import org.apache.spark.sql.SparkSession

/** Round-20 measurement aid (guide §1): how much of a timed query run
  * is driver-side PLANNING (analysis + optimization + physical
  * planning, forced via `queryExecution.executedPlan`) versus
  * execution? Prints per-query min-of-3 for (build+plan) and for the
  * full noop run at the bench session shape. Not a registry surface.
  */
object PlanCostProbe {
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
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).write
      .mode("overwrite").format("noop").save()
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_sql_q5", "q_sql_q21", "q_agg_group", "q_events_ohlc",
      "q_dedup_simhash", "q_agg_rollup", "q_filter_pred", "q_sort_topk")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def minOf(n: Int)(body: => Unit): Double =
        (0 until n).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }.min
      val tBuild = minOf(3) { fn(spark, sfDir) }
      val tPlan = minOf(3) { fn(spark, sfDir).queryExecution.executedPlan }
      val tFull = minOf(3) {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        spark.sharedState.cacheManager.clearCache()
      }
      val qe = fn(spark, sfDir).queryExecution
      qe.executedPlan
      val phases = qe.tracker.phases.map { case (k, v) =>
        f"$k=${(v.endTimeMs - v.startTimeMs) / 1000.0}%.3f"
      }.mkString(" ")
      println(f"[plancost] $name%-22s build=$tBuild%.3f plan=$tPlan%.3f full=$tFull%.3f share=${100 * tPlan / tFull}%.0f%% | $phases")
    }
    // rule-level hotspots for the worst planner (reset, plan once, dump)
    if (sys.env.get("SPARK_GRAFT_RULE_DUMP").contains("1")) {
      org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      SparkEntry.queries("q_dedup_simhash")(spark, sfDir)
        .queryExecution.executedPlan
      println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
        .linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}
