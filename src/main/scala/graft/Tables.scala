package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each query receives the scale-factor directory at call time, so the same
  * query definitions run at sf0.001 (smoke), sf0.01 (oracle) and sf0.1
  * (bench) — and, unchanged, against any parquet directory on a real
  * cluster. Parquet scans are the only source; Catalyst handles column
  * pruning + predicate pushdown from the declarative plans built on top.
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame = t(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = t(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = t(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = t(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  /** `events.ts` is Parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as raw longs
    * (runtime-settable legacy conf) and expose both the raw `ts` nanos
    * and a µs-truncated `ts_ts` TimestampType column.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    // Requires spark.sql.legacy.parquet.nanosAsLong=true, set where every
    // graft session is BUILT (Bench/Verify/Explain/ScaleBench/ConvertMain
    // and the test harness) — reading a table must not mutate session
    // conf. An externally-built session without the conf fails fast with
    // Spark's PARQUET_TYPE_ILLEGAL, which names the fix.
    // `ts div 1000`, not `/ 1000`: Spark's `/` is double division and
    // ns-magnitude longs (~1e18) exceed double's 2^53 exact range — the
    // rounded quotient can differ ±1 µs from exact truncation.
    t(s, dir, "events").withColumn(
      "ts_ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}
