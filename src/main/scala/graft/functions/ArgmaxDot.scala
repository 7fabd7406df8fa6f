package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Index of the best-matching row of a literal k×dims matrix for an
  * array<double> vector, by dot product — the IVF nearest-centroid
  * assignment as ONE codegen'd primitive loop instead of k interpreted
  * higher-order folds per row. Ties break toward the HIGHER index and
  * NaN compares greatest (Double.compare), bit-matching the
  * struct-greatest formulation it replaces (greatest((dot, i)) picks
  * max dot, then max i). The matrix is a plan constant, so every
  * executor assigns identically.
  */
case class ArgmaxDot(child: Expression, matrix: Array[Double], dims: Int)
  extends UnaryExpression {

  require(matrix.length % dims == 0, "matrix must be k*dims")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_argmax_dot expects ARRAY<DOUBLE>, got ${dt.catalogString}")
  }

  override def dataType: DataType = IntegerType
  // null-element policy (shared with NormalizeVec/LshSignature): any
  // null element makes the assignment NULL — a partial dot product is
  // not a meaningful argmax
  override def nullable: Boolean = child.nullable || arrayMayContainNull
  private def arrayMayContainNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  override def prettyName: String = "graft_argmax_dot"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var j = 0
    // mirror codegen: scan for null elements only when the schema
    // admits them, so interpreted and codegen paths match exactly
    if (arrayMayContainNull) {
      while (j < arr.numElements()) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    val n = math.min(dims, arr.numElements())
    val k = matrix.length / dims
    var best = Double.NegativeInfinity
    var idx = 0
    var i = 0
    while (i < k) {
      var s = 0.0
      var d = 0
      while (d < n) { s += arr.getDouble(d) * matrix(i * dims + d); d += 1 }
      if (java.lang.Double.compare(s, best) >= 0) { best = s; idx = i }
      i += 1
    }
    idx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("argmaxMatrix", matrix, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val best = ctx.freshName("best")
      val idx = ctx.freshName("idx")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val compute =
        s"""
           |int $n = Math.min($dims, $c.numElements());
           |int $k = $m.length / $dims;
           |double $best = Double.NEGATIVE_INFINITY;
           |int $idx = 0;
           |for (int $i = 0; $i < $k; $i++) {
           |  double $s = 0.0;
           |  for (int $d = 0; $d < $n; $d++) {
           |    $s += $c.getDouble($d) * $m[$i * $dims + $d];
           |  }
           |  if (Double.compare($s, $best) >= 0) { $best = $s; $idx = $i; }
           |}
           |${ev.value} = $idx;
         """.stripMargin
      val body = if (arrayMayContainNull) {
        val hasNull = ctx.freshName("hasNull")
        val j = ctx.freshName("j")
        s"""
           |boolean $hasNull = false;
           |for (int $j = 0; $j < $c.numElements(); $j++) {
           |  if ($c.isNullAt($j)) { $hasNull = true; break; }
           |}
           |if ($hasNull) {
           |  ${ev.isNull} = true;
           |} else {
           |$compute
           |}
         """.stripMargin
      } else compute
      body
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArgmaxDot =
    copy(child = newChild)
}

object ArgmaxDot {
  def argmaxDot(vec: Column, centroids: Seq[Array[Double]]): Column = {
    require(centroids.nonEmpty)
    val dims = centroids.head.length
    ColumnBridge.column(
      ArgmaxDot(ColumnBridge.expression(vec), centroids.flatten.toArray, dims))
  }
}
