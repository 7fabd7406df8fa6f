package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared helpers that keep oracle hash-comparison deterministic.
  *
  * Two cross-engine hazards with floating aggregates:
  *  1. double SUM is order-dependent (Spark's 32-partition partial agg vs
  *     DuckDB's serial sum accumulate differently);
  *  2. double→decimal casts disagree at half-boundaries: Spark rounds the
  *     SHORTEST decimal repr (BigDecimal.valueOf) HALF_UP, DuckDB rounds
  *     the EXACT binary expansion — 2-decimal money values multiplied
  *     together land on x.xxx50… boundaries constantly.
  *
  * Fix for both: convert inputs to exact DECIMAL *before* any arithmetic.
  * The source columns are true 2-decimal values (verified over sf0.1), so
  * the double→DECIMAL(…,2) cast is far from any boundary and agrees
  * between engines; all subsequent *, -, + and SUM happen in exact decimal
  * (order-independent), and the final cast decimal→double is the unique
  * nearest double in both engines. Bit-identical results at any
  * parallelism — local[32] today, 1000 executors at 100 TB.
  */
object QueryUtil {
  /** Exact 2-decimal money value (extendedprice, totalprice, acctbal…). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Exact 2-decimal rate in [0,10) (discount, tax). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  /** Decimal literal 1.00 for (1 - discount)-style factors. */
  val one: Column = lit(1).cast(DecimalType(3, 2))

  /** Order-independent double sum of a 2-decimal column. */
  def dsum(c: Column): Column = sum(money(c)).cast(DoubleType)
  /** Order-independent double sum of an already-decimal expression. */
  def dsumDec(c: Column): Column = sum(c).cast(DoubleType)
  /** Deterministic double avg of a 2-decimal column. */
  def davg(c: Column): Column =
    round(sum(money(c)).cast(DoubleType) / count(c), 4)

  // DuckDB-side equivalents (string SQL fragments).
  def moneySql(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def rateSql(e: String): String = s"CAST($e AS DECIMAL(4,2))"
  def dsumSql(e: String): String = s"CAST(SUM(${moneySql(e)}) AS DOUBLE)"
  def dsumDecSql(e: String): String = s"CAST(SUM($e) AS DOUBLE)"
  def davgSql(e: String): String =
    s"ROUND(CAST(SUM(${moneySql(e)}) AS DOUBLE) / COUNT($e), 4)"
}
