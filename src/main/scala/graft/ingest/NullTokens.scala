package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Reference null-token semantics as codegen'd Column expressions
  * (/root/reference/src/utils.rs:48-57): empty/whitespace-only, or
  * case-insensitive null/none/nan/n/a/na → SQL NULL in every type.
  *
  * Spark CSV's `nullValue` accepts one token, so raw columns are read as
  * strings and normalized with this expression chain — pure Catalyst
  * expressions, inside whole-stage codegen, no UDF.
  */
object NullTokens {
  val tokens: Seq[String] = Seq("null", "none", "nan", "n/a", "na")

  def isNullToken(c: Column): Column =
    c.isNull || trim(c) === "" || lower(trim(c)).isin(tokens: _*)

  /** Null-normalize, keeping the ORIGINAL (untrimmed) string otherwise —
    * the reference appends the raw cell (analyse.rs:252-274). */
  def normalize(c: Column): Column =
    when(isNullToken(c), lit(null).cast(StringType)).otherwise(c)

  /** DuckDB-side mirror for oracle SQL. */
  def normalizeSql(e: String): String =
    s"(CASE WHEN $e IS NULL OR trim($e) = '' OR lower(trim($e)) IN ('null','none','nan','n/a','na') THEN NULL ELSE $e END)"
}
