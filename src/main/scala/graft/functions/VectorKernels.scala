package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Sequential-fold dot product of two `array<double>` columns as ONE
  * codegen'd primitive loop — the hot-path twin of
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, which Spark evaluates as
  * an interpreted higher-order fold (CodegenFallback) and which
  * dominated the pair-verify stages at scale (the MinhashBands story:
  * 83.7 s interpreted → 0.80 s primitive loop). Bit-identical by
  * construction: products and additions run in the SAME ascending index
  * order, so every IEEE intermediate matches the HOF fold and the
  * DuckDB `list_reduce` mirror — oracle hashes are unaffected
  * (VectorKernelsSpec pins the equality).
  *
  * Null semantics mirror the HOF form: `zip_with` pads unequal lengths
  * with null and a null product nulls the whole fold, so unequal
  * lengths or any null element → NULL.
  */
case class DotProductD(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects two ARRAY<DOUBLE>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def mayContainNull: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    if (mayContainNull) {
      var j = 0
      while (j < n) {
        if (x.isNullAt(j) || y.isNullAt(j)) return null
        j += 1
      }
    }
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullScan = if (mayContainNull) {
        val j = ctx.freshName("j")
        s"""
           |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
           |  if ($a.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; }
           |}
         """.stripMargin
      } else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductD = copy(left = newLeft, right = newRight)
}

/** Index of the NEAREST row of a literal k×dims matrix for an
  * `array<double>` vector, by squared euclidean distance — the k-means
  * assignment as ONE codegen'd primitive loop instead of k interpreted
  * higher-order folds per row. Each per-row distance accumulates
  * (x_d − c_d)² in ascending d (the same IEEE sequence as the
  * `zip_with`+`aggregate` fold and DuckDB's `list_reduce` mirror), and
  * ties break toward the LOWEST index via a strict `<` update —
  * bit-matching the `array_position(dl, array_min(dl))`
  * first-position-of-min formulation it replaces (VectorKernelsSpec
  * pins both claims). The matrix is a plan constant, so every executor
  * assigns identically. Null-element policy as ArgmaxDot: any null
  * element → NULL.
  */
case class ArgminSqDist(child: Expression, matrix: Array[Double], dims: Int)
  extends UnaryExpression {

  require(matrix.length % dims == 0, "matrix must be k*dims")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_argmin_sqdist expects ARRAY<DOUBLE>, got ${dt.catalogString}")
  }

  override def dataType: DataType = IntegerType
  // nullable regardless of child: a length-mismatched vector yields NULL
  override def nullable: Boolean = true
  private def arrayMayContainNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  override def prettyName: String = "graft_argmin_sqdist"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // mirror the HOF witness: zip_with null-pads unequal lengths and the
    // null distances poison the fold, so a malformed embedding is a LOUD
    // NULL, never a silently-wrong prefix assignment
    if (arr.numElements() != dims) return null
    if (arrayMayContainNull) {
      var j = 0
      while (j < arr.numElements()) {
        if (arr.isNullAt(j)) return null
        j += 1
      }
    }
    val n = dims
    val k = matrix.length / dims
    var best = Double.PositiveInfinity
    var idx = 0
    var i = 0
    while (i < k) {
      var s = 0.0
      var d = 0
      while (d < n) {
        val diff = arr.getDouble(d) - matrix(i * dims + d)
        s += diff * diff
        d += 1
      }
      if (java.lang.Double.compare(s, best) < 0) { best = s; idx = i }
      i += 1
    }
    idx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("argminMatrix", matrix, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val best = ctx.freshName("best")
      val idx = ctx.freshName("idx")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val compute =
        s"""
           |int $n = $dims;
           |int $k = $m.length / $dims;
           |double $best = Double.POSITIVE_INFINITY;
           |int $idx = 0;
           |for (int $i = 0; $i < $k; $i++) {
           |  double $s = 0.0;
           |  for (int $d = 0; $d < $n; $d++) {
           |    double $diff = $c.getDouble($d) - $m[$i * $dims + $d];
           |    $s += $diff * $diff;
           |  }
           |  if (Double.compare($s, $best) < 0) { $best = $s; $idx = $i; }
           |}
           |${ev.value} = $idx;
         """.stripMargin
      val checked = if (arrayMayContainNull) {
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
      // length mismatch -> NULL, mirroring nullSafeEval and the HOF witness
      s"""
         |if ($c.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |$checked
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArgminSqDist =
    copy(child = newChild)
}

object VectorKernels {
  def dotD(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductD(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def argminSqDist(vec: Column, centroids: Seq[Array[Double]]): Column = {
    require(centroids.nonEmpty)
    val dims = centroids.head.length
    ColumnBridge.column(ArgminSqDist(ColumnBridge.expression(vec),
      centroids.flatten.toArray, dims))
  }
}
