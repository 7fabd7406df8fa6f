package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 measurement aid (guide §1): decomposes one streaming
  * entry's timed span into (a) feed staging — the midpoint agg + two
  * chunk parquet writes every run pays — and (b) the stream lifecycle
  * itself, by timing the staging pieces in isolation. Not a registry
  * surface; numbers land in OPTIMIZATION_r20.md.
  */
object StreamProbe {
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
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-28s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // warmup
    spark.read.parquet(s"$sfDir/events.parquet").limit(1)
      .write.mode("overwrite").format("noop").save()

    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"))
    time("midpoint agg") {
      evs.agg(min(col("ts_us")).cast("long"), max(col("ts_us")).cast("long"))
        .head()
    }
    val r = evs.agg(min(col("ts_us")).cast("long"), max(col("ts_us")).cast("long")).head()
    val mid = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2
    // probe scratch rides the shared Scratch root like every harness
    // write (reaper-owned; no driver-local /tmp paths in src/main)
    val probeDir = graft.queries.Scratch.freshDir(spark, "stream_probe")
    time("chunk writes (b1+b2)") {
      evs.filter(col("ts_us") <= mid).write.mode("overwrite")
        .parquet(s"$probeDir/b1")
      evs.filter(col("ts_us") > mid).write.mode("overwrite")
        .parquet(s"$probeDir/b2")
    }
    // events with all interval-join columns (the heavier chunk shape)
    val ev4 = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts_ts"),
        col("event_type"), expr("ts div 1000").as("ts_us"))
    time("interval chunk writes") {
      ev4.filter(col("ts_us") <= mid).drop("ts_us").write.mode("overwrite")
        .parquet(s"$probeDir/c1")
      ev4.filter(col("ts_us") > mid).drop("ts_us").write.mode("overwrite")
        .parquet(s"$probeDir/c2")
    }
    time("whole q_stream_enrich") {
      graft.queries.Streaming.queries("q_stream_enrich")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    time("whole q_stream_dedup") {
      graft.queries.Streaming.queries("q_stream_dedup")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    time("whole q_stream_interval_join") {
      graft.queries.Streaming.queries("q_stream_interval_join")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    time("stateless floor") {
      graft.queries.Streaming.streamNoopFloor(spark, stateful = false).collect()
    }
    // per-micro-batch duration breakdown for the state-heaviest entry:
    // run the interval-join lifecycle with a progress listener attached
    if (sys.env.get("SPARK_GRAFT_STREAM_PROGRESS").contains("1")) {
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          println(s"[progress] batch=${p.batchId} rows=${p.numInputRows} " +
            s"durations=${p.durationMs}")
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      graft.queries.Streaming.queries("q_stream_interval_join")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println("[progress] --- q_stream_ingest ---")
      graft.queries.Streaming.queries("q_stream_ingest")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println("[progress] --- q_stream_cdc ---")
      graft.queries.Streaming.queries("q_stream_cdc")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      spark.streams.removeListener(listener)
    }
    spark.stop()
  }
}
