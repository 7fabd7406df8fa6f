package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a string column as ONE codegen'd kernel — the fused
  * form of `transform(sequence(0, size(w)-n), i -> concat_ws(" ",
  * slice(w, i+1, n)))` over `w = split(trim(text), "\s+")`, which runs
  * interpreted per element through five nested higher-order/collection
  * expressions. Byte-identical outputs in the same order (WordNgramsSpec
  * pins equality against the HOF formulation), so swapping it into the
  * dedup/decontamination queries moves no oracle hash.
  *
  * Semantics notes, mirrored exactly from the HOF chain:
  *  - trim strips ASCII space only (Spark's `trim`), NOT Java trim's
  *    full control-char range;
  *  - split uses Java regex `\s+` with limit -1 (Spark's `split`
  *    default), so an empty string yields one empty token;
  *  - fewer than n tokens → empty array (the HOF guard's `array()`).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_word_ngrams needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_word_ngrams expects STRING, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgrams$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {

  def grams(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(c), n))

  /** Spark `trim` semantics: ASCII space only. */
  private def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Shared by interpreted eval and generated code (static call). */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = trimSpaces(s.toString).split("\\s+", -1)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
