package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Unit-normalized double vector from an array<float|double> column,
  * as one codegen'd primitive loop. Bit-identical to the higher-order
  * formulation `transform(a, x -> x / sqrt(aggregate(zip_with(a, a,
  * _*_), 0.0, _+_)))` — the norm accumulates in ascending index order
  * (the same IEEE operation sequence as the sequential fold, and as
  * DuckDB's list_reduce on the oracle side), so swapping this in does
  * not move a single output bit of the cosine queries
  * (NormalizeVecSpec pins it). Zero-norm vectors propagate the fold's
  * behavior exactly: 0/0 = NaN per element.
  *
  * Null-element policy: an array containing ANY null element
  * normalizes to NULL (the whole value). The HOF twin instead yields
  * an all-null array (null poisons the fold ⇒ null norm ⇒ every
  * division is null) — same information, but this kernel keeps its
  * `containsNull = false` output contract, so the whole-value NULL is
  * the honest encoding. NormalizeVecSpec pins the policy.
  */
case class NormalizeVec(child: Expression) extends UnaryExpression {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize_vec expects ARRAY<FLOAT|DOUBLE>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable || arrayMayContainNull
  private def arrayMayContainNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  override def prettyName: String = "graft_normalize_vec"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    // mirror the codegen branch: only scan for null elements when the
    // schema admits them (containsNull), so both paths do the same work
    // and behave identically on schema-conforming data
    if (arrayMayContainNull) {
      while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    }
    val v = new Array[Double](n)
    i = 0
    while (i < n) {
      v(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var s = 0.0
    i = 0
    while (i < n) { s += v(i) * v(i); i += 1 }
    val norm = math.sqrt(s)
    i = 0
    while (i < n) { v(i) = v(i) / norm; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val s = ctx.freshName("s")
      val norm = ctx.freshName("norm")
      val i = ctx.freshName("i")
      val get = if (elemIsFloat) s"(double) $c.getFloat" else s"$c.getDouble"
      val hasNull = ctx.freshName("hasNull")
      val compute =
        s"""
           |double[] $v = new double[$n];
           |for (int $i = 0; $i < $n; $i++) { $v[$i] = $get($i); }
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) { $s += $v[$i] * $v[$i]; }
           |double $norm = Math.sqrt($s);
           |for (int $i = 0; $i < $n; $i++) { $v[$i] = $v[$i] / $norm; }
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($v);
         """.stripMargin
      // only emit the null-element branch when the schema admits element
      // nulls — otherwise `ev.isNull` can be an unassignable literal
      val body = if (arrayMayContainNull)
        s"""
           |boolean $hasNull = false;
           |for (int $i = 0; $i < $n; $i++) { if ($c.isNullAt($i)) { $hasNull = true; break; } }
           |if ($hasNull) {
           |  ${ev.isNull} = true;
           |} else {
           |$compute
           |}
         """.stripMargin
      else compute
      s"""
         |int $n = $c.numElements();
         |$body
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeVec =
    copy(child = newChild)
}

object NormalizeVec {
  def normalize(vec: Column): Column =
    ColumnBridge.column(NormalizeVec(ColumnBridge.expression(vec)))
}
