package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.IngestPipeline

/** q_ingest_typed — the reference's whole reason to exist (O1–O13): a
  * delimited text file round-trips through delimiter detection, sampled
  * schema inference, and the typed cast kernel into a typed DataFrame.
  *
  * Driver data ships as parquet, so the query first materializes a TSV
  * projection of `lineitem` (strings only, reference-style formatting),
  * then runs the real pipeline on it. No oracle (the driver records a
  * rows-only check); semantics are unit-tested against the reference's
  * own fixtures in IngestPipelineSpec/CastKernelSpec.
  */
object Ingest {

  /** Stage the TSV once per sf dir and return its path — materializing
    * the input is test-harness work, not part of the conversion
    * pipeline being measured, so Bench warms it up before timing. */
  def ensureStaged(s: SparkSession, dir: String): String = {
    // key the staging dir on the sanitized path itself — hashCode could
    // collide across distinct sf dirs and silently reuse the wrong TSV
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val tsvDir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_ingest_tsv_$key").toString
    if (!new java.io.File(tsvDir, "_SUCCESS").exists()) {
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey").cast("string"),
          col("l_partkey").cast("string"),
          col("l_quantity").cast("string"),
          col("l_extendedprice").cast("string"),
          col("l_returnflag"),
          date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("l_shipdate"))
        .write.mode("overwrite")
        .option("header", "true").option("sep", "\t")
        .csv(tsvDir)
    }
    tsvDir
  }

  def qIngestTyped(s: SparkSession, dir: String): DataFrame =
    IngestPipeline.convert(s, ensureStaged(s, dir))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ingest_typed" -> (qIngestTyped _)
  )

  def oracleSql: Map[String, String] = Map() // rows-only check by design
}
