package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial text fingerprint `fold((acc, c) -> (acc·31 + c)
  * mod 1e9+7)` over the string's Unicode codepoints, as ONE native
  * codegen'd loop (round-20 optimization, guide §4). Semantically
  * identical to the interpreted chain
  * `aggregate(transform(split(text, ""), ch -> ascii(ch)), 0L, ...)`
  * that q_text_fingerprint shipped with — `split(text, "")` yields one
  * single-codepoint string per character (no leading/trailing empties;
  * `ascii` of the lone empty-string element an empty input produces is
  * 0, which equals the kernel's empty-loop seed), and `ascii` returns
  * the codepoint of its single character — so the fold visits the same
  * integer sequence and the same exact modular arithmetic. NULL text →
  * NULL, exactly like the HOF's null propagation.
  * PolyFingerprintSpec pins bit-equality against the HOF witness on
  * the real corpus plus empty/multibyte/null edge cases; the DuckDB
  * oracle (list_reduce over string_split) is unmoved.
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_poly_fingerprint expects STRING, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_fingerprint"

  override def nullSafeEval(input: Any): Any =
    PolyFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

object PolyFingerprint {
  private final val M = 1000000007L

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % M
      i += Character.charCount(cp)
    }
    acc
  }

  def fingerprint(text: Column): Column =
    ColumnBridge.column(PolyFingerprint(ColumnBridge.expression(text)))
}
