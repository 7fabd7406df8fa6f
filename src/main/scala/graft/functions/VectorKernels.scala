package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

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

/** Grouped nearest-centroid lookup — the IVF fine-probe kernel: given a
  * vector and its COARSE cluster id, return the label of the nearest
  * FINE centroid among that cluster's slice of a flat stacked matrix.
  * One codegen'd primitive loop over `counts(cid)` centroids — the
  * k1-branch CASE-of-ArgminSqDist it replaces inlined k1 full argmin
  * loops into one generated method, which blew the JIT's method-size
  * budget and ran as interpreted bytecode (a 7-minute stage for a
  * seconds-long pass at 100×, round-15). Distances accumulate (x−c)² in
  * ascending dimension order and ties break strict-`<` toward the
  * lowest slice index (= lowest fine label, slices are label-sorted) —
  * bit-identical to the per-branch ArgminSqDist semantics and the
  * DuckDB `ORDER BY dist, fid` mirror (VectorKernelsSpec pins it).
  * NULL on: null inputs, length-mismatched vector, null elements, or a
  * cid outside the fitted map (mirrors the CASE's no-branch NULL).
  */
case class ArgminSqDistGrouped(vec: Expression, cid: Expression,
    matrix: Array[Double], labels: Array[Long], starts: Array[Int],
    counts: Array[Int], cidBase: Long, dims: Int)
  extends BinaryExpression {

  require(matrix.length == labels.length * dims, "matrix must be rows*dims")
  require(starts.length == counts.length, "starts/counts must align")

  override def left: Expression = vec
  override def right: Expression = cid

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cid.dataType) match {
      case (ArrayType(DoubleType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_argmin_grouped expects (ARRAY<DOUBLE>, BIGINT), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmin_grouped"

  private def vecMayContainNull: Boolean = vec.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def nullSafeEval(v: Any, c: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val group = c.asInstanceOf[Long] - cidBase
    if (group < 0 || group >= starts.length) return null
    if (arr.numElements() != dims) return null
    if (vecMayContainNull) {
      var j = 0
      while (j < dims) {
        if (arr.isNullAt(j)) return null
        j += 1
      }
    }
    val s0 = starts(group.toInt)
    val n = counts(group.toInt)
    if (n == 0) return null
    var best = Double.PositiveInfinity
    var idx = s0
    var i = 0
    while (i < n) {
      var s = 0.0
      var d = 0
      while (d < dims) {
        val diff = arr.getDouble(d) - matrix((s0 + i) * dims + d)
        s += diff * diff
        d += 1
      }
      if (java.lang.Double.compare(s, best) < 0) { best = s; idx = s0 + i }
      i += 1
    }
    labels(idx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("groupedMatrix", matrix, "double[]")
    val lb = ctx.addReferenceObj("groupedLabels", labels, "long[]")
    val st = ctx.addReferenceObj("groupedStarts", starts, "int[]")
    val cn = ctx.addReferenceObj("groupedCounts", counts, "int[]")
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val g = ctx.freshName("g")
      val s0 = ctx.freshName("s0")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val idx = ctx.freshName("idx")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val nullScan = if (vecMayContainNull) {
        val j = ctx.freshName("j")
        s"""
           |for (int $j = 0; $j < $dims && !${ev.isNull}; $j++) {
           |  if ($v.isNullAt($j)) { ${ev.isNull} = true; }
           |}
         """.stripMargin
      } else ""
      s"""
         |long $g = $c - ${cidBase}L;
         |if ($g < 0 || $g >= $st.length || $v.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    int $s0 = $st[(int) $g];
         |    int $n = $cn[(int) $g];
         |    if ($n == 0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      double $best = Double.POSITIVE_INFINITY;
         |      int $idx = $s0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        double $s = 0.0;
         |        for (int $d = 0; $d < $dims; $d++) {
         |          double $diff = $v.getDouble($d) - $m[($s0 + $i) * $dims + $d];
         |          $s += $diff * $diff;
         |        }
         |        if (Double.compare($s, $best) < 0) { $best = $s; $idx = $s0 + $i; }
         |      }
         |      ${ev.value} = $lb[$idx];
         |    }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArgminSqDistGrouped =
    copy(vec = newLeft, cid = newRight)
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

  /** Flattens a per-coarse-cluster fine-centroid map into the stacked
    * matrix + label/slice arrays [[ArgminSqDistGrouped]] walks. Coarse
    * cids may be sparse (clusters can drop); missing groups get
    * count 0 and probe to NULL. */
  def argminSqDistGrouped(vec: Column, cid: Column,
      fine: Map[Long, Seq[(Long, Array[Double])]]): Column = {
    require(fine.nonEmpty && fine.values.forall(_.nonEmpty))
    val dims = fine.head._2.head._2.length
    val base = fine.keys.min
    val span = (fine.keys.max - base + 1).toInt
    val starts = new Array[Int](span)
    val counts = new Array[Int](span)
    val labels = Array.newBuilder[Long]
    val matrix = Array.newBuilder[Double]
    var off = 0
    for (g <- 0 until span) {
      starts(g) = off
      fine.get(base + g).foreach { cents =>
        counts(g) = cents.size
        cents.foreach { case (fid, arr) =>
          require(arr.length == dims, "ragged fine centroids")
          labels += fid
          matrix ++= arr
        }
        off += cents.size
      }
    }
    ColumnBridge.column(ArgminSqDistGrouped(ColumnBridge.expression(vec),
      ColumnBridge.expression(cid), matrix.result(), labels.result(),
      starts, counts, base, dims))
  }
}
