package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DateType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.ScalarParse

/** Fused 3-format date parser (reference parse_date_ymd,
  * /root/reference/src/utils.rs:67-79: %Y-%m-%d, then day-first
  * %d/%m/%Y, then %m/%d/%Y; strict calendar) as a native codegen'd
  * expression — the sibling of [[TimestampMsParse]]. Semantics come
  * from the reference-parity-tested [[ScalarParse.parseDateYmd]];
  * DateType is epoch-day internally, so the static call returns the
  * day int directly (Int.MinValue = null sentinel).
  */
case class DateYmdParse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_parse_date_ymd expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_parse_date_ymd"

  override def nullSafeEval(input: Any): Any = {
    val r = ScalarParse.parseDateYmdOrMin(input.asInstanceOf[UTF8String].toString)
    if (r == Int.MinValue) null else java.lang.Integer.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val parsed = ctx.freshName("parsedDay")
      s"""
         |int $parsed = graft.ingest.ScalarParse.parseDateYmdOrMin($c.toString());
         |if ($parsed == Integer.MIN_VALUE) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $parsed;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DateYmdParse =
    copy(child = newChild)
}

object DateYmdParse {
  def parseDateYmd(c: Column): Column =
    ColumnBridge.column(DateYmdParse(ColumnBridge.expression(c)))
}
