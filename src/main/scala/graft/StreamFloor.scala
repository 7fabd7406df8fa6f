package graft

import org.apache.spark.sql.SparkSession

/** Measures the streaming-lifecycle FIXED FLOOR: the cost every one of
  * the 17 stream-family bench entries pays regardless of data volume
  * (feed staging + query start + two micro-batch drains + memory-sink
  * collect + stop). Prints one JSON line with min-of-N seconds for the
  * stateless pass-through and the stateful (one state-store round)
  * noop shapes — BASELINE.md records the values so cross-round
  * per-entry swings can be read net of the floor.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.StreamFloor"
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: first lifecycle pays class-load + codegen compilation
    queries.Streaming.streamNoopFloor(spark, stateful = false).collect()
    queries.Streaming.streamNoopFloor(spark, stateful = true).collect()
    def time(stateful: Boolean): Double = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      queries.Streaming.streamNoopFloor(spark, stateful).collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    val stateless = time(stateful = false)
    val stateful = time(stateful = true)
    println(f"""{"metric":"stream_floor","unit":"sec","stateless":$stateless%.3f,"stateful":$stateful%.3f,"runs":$runs,"cpus":$cpus}""")
    spark.stop()
  }
}
