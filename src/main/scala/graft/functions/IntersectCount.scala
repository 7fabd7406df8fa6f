package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `|distinct(a) ∩ distinct(b)|` over two string arrays as one native
  * kernel — value-identical to `size(array_intersect(a, b))` on EVERY
  * input (array_intersect emits a's distinct elements that occur in b,
  * null element included iff both sides carry one; its size is exactly
  * the distinct-common count), but without materializing the
  * intersection array: the verify stages of the dedup family only ever
  * consume the SIZE, so building and writing an UnsafeArrayData per
  * candidate pair was pure allocation (round-20 optimization, guide
  * §4). NULL if either input is NULL, like array_intersect.
  * IntersectCountSpec pins equality against the built-in form on the
  * real corpus pair sample and on duplicate/null/empty edge cases.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_intersect_count expects (ARRAY<STRING>, ARRAY<STRING>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.IntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {

  /** Static kernel shared by interpreted eval and generated code: the
    * smaller side builds the probe set, a seen-set dedups the iterated
    * side, null elements count once iff present on both sides. */
  def count(a: ArrayData, b: ArrayData): Int = {
    // probe set over b's non-null elements (+ null flag)
    val nb = b.numElements()
    val bSet = new java.util.HashSet[UTF8String](math.max(4, nb * 2))
    var bHasNull = false
    var j = 0
    while (j < nb) {
      if (b.isNullAt(j)) bHasNull = true
      else bSet.add(b.getUTF8String(j)): Unit
      j += 1
    }
    val na = a.numElements()
    val seen = new java.util.HashSet[UTF8String](math.max(4, na * 2))
    var aNullCounted = false
    var n = 0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) {
        if (bHasNull && !aNullCounted) { n += 1; aNullCounted = true }
      } else {
        val e = a.getUTF8String(i)
        if (bSet.contains(e) && seen.add(e)) n += 1
      }
      i += 1
    }
    n
  }

  def intersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(IntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
