package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH signature as a native codegen'd expression:
  * input array<double> vector → array<long> of `bands` band buckets,
  * bucket b = the `bits` sign bits of fixed Gaussian hyperplane
  * projections packed into a long. Semantically identical to
  * [[VectorOps.lshBandBuckets]] (same seed → same planes, same
  * ascending-index dot order) but runs as primitive loops inside
  * whole-stage codegen instead of `bands*bits` interpreted
  * higher-order folds — ~100× less per-row overhead, which matters
  * because the signature is computed for EVERY row of the corpus
  * (the one truly full-scan stage of LSH dedup).
  *
  * The plane matrix is a plan constant (seeded, data-independent), so
  * every executor derives bit-identical signatures — a requirement for
  * the (band, bucket) equi-join to mean anything.
  */
case class LshSignature(child: Expression, dims: Int, bands: Int,
                        bits: Int, seed: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_signature expects ARRAY<DOUBLE>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null-element AND length policy (the ArgminSqDist advisory applied
  // here, round 15): any null element or a length-mismatched vector
  // makes the whole signature NULL — a partial projection is not a
  // meaningful bucket key, and a silent PREFIX signature would index a
  // malformed embedding under plausible-looking buckets (the HOF
  // witness null-poisons to bucket 0 instead, which is equally wrong:
  // every corrupt vector would collide in band buckets 0)
  override def nullable: Boolean = true
  private def arrayMayContainNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  override def prettyName: String = "graft_lsh_signature"

  // flattened plane matrix, (band*bits + bit)-major — identical draw
  // order to VectorOps.lshBandBuckets so the two stay bit-equivalent
  @transient private lazy val planes: Array[Double] =
    LshSignature.planeMatrix(dims, bands, bits, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dims) return null
    var j = 0
    // mirror codegen: scan for null elements only when the schema
    // admits them, so interpreted and codegen paths match exactly
    if (arrayMayContainNull) {
      while (j < arr.numElements()) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    val n = dims
    val buckets = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var k = 0
      while (k < bits) {
        val off = (b * bits + k) * dims
        var s = 0.0
        var d = 0
        while (d < n) { s += arr.getDouble(d) * planes(off + d); d += 1 }
        // SQL comparison semantics (NaN > 0 is TRUE in Spark AND DuckDB
        // — both order NaN above every value), not Java's `s > 0`
        // (false for NaN): a NaN-bearing vector must derive the SAME
        // bucket in the kernel, the HOF witness, and the oracle mirror
        // (round-15 fuzz find, LshSignatureSpec)
        if (java.lang.Double.compare(s, 0.0) > 0) bucket |= (1L << k)
        k += 1
      }
      buckets(b) = bucket
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val buckets = ctx.freshName("buckets")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      val hasNull = ctx.freshName("hasNull")
      val compute =
        s"""
           |long[] $buckets = new long[$bands];
           |int $n = $dims;
           |for (int $b = 0; $b < $bands; $b++) {
           |  long $bucket = 0L;
           |  for (int $k = 0; $k < $bits; $k++) {
           |    int $off = ($b * $bits + $k) * $dims;
           |    double $s = 0.0;
           |    for (int $d = 0; $d < $n; $d++) {
           |      $s += $c.getDouble($d) * $planesRef[$off + $d];
           |    }
           |    if (Double.compare($s, 0.0D) > 0) $bucket |= (1L << $k);
           |  }
           |  $buckets[$b] = $bucket;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($buckets);
         """.stripMargin
      val checked = if (arrayMayContainNull) {
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
      // length mismatch -> NULL, mirroring nullSafeEval
      s"""
         |if ($c.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |$checked
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

object LshSignature {

  /** Same draw order as VectorOps.lshBandBuckets: one plane at a time,
    * each plane's `dims` gaussians in index order. */
  def planeMatrix(dims: Int, bands: Int, bits: Int, seed: Long): Array[Double] = {
    val rng = new scala.util.Random(seed)
    val out = new Array[Double](bands * bits * dims)
    var p = 0
    while (p < bands * bits) {
      var d = 0
      while (d < dims) { out(p * dims + d) = rng.nextGaussian(); d += 1 }
      p += 1
    }
    out
  }

  def signature(vec: Column, dims: Int, bands: Int = 16, bits: Int = 10,
                seed: Long = 97): Column =
    ColumnBridge.column(
      LshSignature(ColumnBridge.expression(vec), dims, bands, bits, seed))
}
