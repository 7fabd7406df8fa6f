package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registers custom Catalyst expressions as SQL-callable temp functions
  * (the FunctionRegistry lives behind the classic session's
  * sessionState, reachable from this org.apache.spark.sql subpackage).
  */
object FunctionBridge {
  def register(spark: SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
