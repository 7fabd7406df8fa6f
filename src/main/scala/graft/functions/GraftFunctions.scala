package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.FunctionBridge

/** SQL registration for the engine's custom expressions, so a SQL-first
  * user gets the same surface as the Column API:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT graft_parse_ts_ms(raw_col) FROM t")
  * }}}
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    FunctionBridge.register(spark, "graft_parse_ts_ms",
      exprs => TimestampMsParse(exprs.head))
    FunctionBridge.register(spark, "graft_parse_date_ymd",
      exprs => DateYmdParse(exprs.head))
  }
}
