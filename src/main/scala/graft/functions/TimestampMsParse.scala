package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.ScalarParse

/** Native Catalyst expression fusing the reference's full
  * parse_timestamp_ms ladder (6 datetime formats + epoch-range
  * heuristics, /root/reference/src/utils.rs:81-118) into ONE compiled
  * call — replacing the ~10-branch coalesce/regexp expression chain in
  * [[graft.ingest.Parsers.parseTimestampMs]].
  *
  * Semantics come from [[ScalarParse.parseTimestampMs]] — the same pure
  * function the reference-parity unit tests pin down — so the fused path
  * can never drift from the chain it replaces. `doGenCode` emits a
  * static call inside whole-stage codegen (the same shape Spark's own
  * regexp expressions use); null-in → null-out, Long.MinValue is the
  * internal null sentinel.
  */
case class TimestampMsParse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_parse_ts_ms expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_parse_ts_ms"

  override def nullSafeEval(input: Any): Any = {
    val r = ScalarParse.parseTimestampMsOrMin(input.asInstanceOf[UTF8String].toString)
    if (r == Long.MinValue) null else java.lang.Long.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val parsed = ctx.freshName("parsedMs")
      s"""
         |long $parsed = graft.ingest.ScalarParse.parseTimestampMsOrMin($c.toString());
         |if ($parsed == Long.MIN_VALUE) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $parsed;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TimestampMsParse =
    copy(child = newChild)
}

object TimestampMsParse {
  /** Column builder for the fused parser (epoch ms, long). */
  def parseTsMs(c: Column): Column =
    ColumnBridge.column(TimestampMsParse(ColumnBridge.expression(c)))
}
