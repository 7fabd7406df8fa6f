package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-grams of a string column as ONE codegen'd kernel — the
  * fused form of `transform(sequence(1, length(t)-n+1), i ->
  * substring(t, i, n))`, which pays twice per element: higher-order
  * lambdas evaluate INTERPRETED, and `substring` on a UTF8String is
  * O(position) (it re-scans bytes to count characters), making the HOF
  * chain quadratic per document. One linear pass here; byte-identical
  * outputs in the same order (CharNgramsSpec pins equality against the
  * HOF formulation), so swapping it into q_langid_trigram moves no
  * oracle hash.
  *
  * Character semantics: Unicode code points (what DuckDB's
  * length/substr count and Spark's substring slices) — the
  * String-level sliding window walks by code point, not UTF-16 unit.
  * Fewer than n characters → empty array.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_char_ngrams needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams expects STRING, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharNgrams$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {

  def grams(c: Column, n: Int): Column =
    ColumnBridge.column(CharNgrams(ColumnBridge.expression(c), n))

  /** Shared by interpreted eval and generated code (static call).
    * One pass: code-point start offsets first, then n-gram slices as
    * String.substring copies of (tiny) n-char windows. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    // code-point start indices (UTF-16 offsets)
    val starts = new Array[Int](str.codePointCount(0, str.length) + 1)
    var cp = 0
    var off = 0
    while (off < str.length) {
      starts(cp) = off
      off += Character.charCount(str.codePointAt(off))
      cp += 1
    }
    starts(cp) = str.length
    val count = cp - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      out(i) = UTF8String.fromString(str.substring(starts(i), starts(i + n)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
