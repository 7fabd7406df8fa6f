package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryUtil._

/** Relational query inventory (SURVEY.md §2.D): aggregations, joins,
  * windows, sorts, set ops — each declared with the DataFrame API so
  * Catalyst owns the physical strategy (partial aggregation, join
  * selection, pushdown). Every query ends in a total ORDER BY on a unique
  * key so the driver's ordered hash compare is deterministic.
  */
object Relational {

  /** TPC-H Q1-like pricing summary. Maps to a single hash-aggregate with
    * map-side partial aggregation; the shipdate filter and 7-column
    * projection push down to the parquet scan.
    */
  def qAggGroup(s: SparkSession, dir: String): DataFrame = {
    val price = money(col("l_extendedprice"))
    val disc = rate(col("l_discount"))
    val tax = rate(col("l_tax"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumDec(price * (one - disc)).as("sum_disc_price"),
        dsumDec(price * (one - disc) * (one + tax)).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val qAggGroupOracle: String = {
    val price = moneySql("l_extendedprice")
    val disc = rateSql("l_discount")
    val tax = rateSql("l_tax")
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumDecSql(s"$price * (1.00 - $disc)")} AS sum_disc_price,
       |  ${dsumDecSql(s"$price * (1.00 - $disc) * (1.00 + $tax)")} AS sum_charge,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_extendedprice")} AS avg_price,
       |  ${davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_group" -> (qAggGroup _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg_group" -> qAggGroupOracle
  )
}
