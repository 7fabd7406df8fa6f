package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-package registries; each query
  * id from SURVEY.md §2.D appears in both maps (or only in `queries` for
  * non-SQL-expressible operators, which get a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.qAggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.RelationalTpch.queries ++
      graft.queries.Funcs.queries ++
      graft.queries.Events.queries ++
      graft.queries.TextAnalysis.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Extensions.queries ++
      graft.queries.Curation.queries ++
      graft.queries.Profiling.queries ++
      graft.queries.Graph.queries ++
      graft.queries.Streaming.queries ++
      graft.queries.Cdc.queries ++
      graft.queries.Ingest.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.RelationalTpch.oracleSql ++
      graft.queries.Funcs.oracleSql ++
      graft.queries.Events.oracleSql ++
      graft.queries.TextAnalysis.oracleSql ++
      graft.queries.Dedup.oracleSql ++
      graft.queries.Similarity.oracleSql ++
      graft.queries.Extensions.oracleSql ++
      graft.queries.Curation.oracleSql ++
      graft.queries.Profiling.oracleSql ++
      graft.queries.Graph.oracleSql ++
      graft.queries.Streaming.oracleSql ++
      graft.queries.Cdc.oracleSql ++
      graft.queries.Ingest.oracleSql
}
