package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  XxHash64Function, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-row MinHash band buckets as a native expression: input
  * array<string> (a document's distinct shingles) → array<long> of
  * `bands` band keys, where the `nHash` permutation minima are
  * computed in one tight primitive loop over the shingles and each
  * band key is the multi-arg xxhash64 fold of its `nHash/bands`
  * minima.
  *
  * BYTE-IDENTICAL to the aggregation form
  * (graft.queries.Dedup.minhashBanded) by construction: shingle hashes
  * go through Spark's own `XxHash64Function.hash` (the exact function
  * the builtin `xxhash64` evaluates), permutation constants come from
  * the same seeded draw, arithmetic is the same pmod chain, and the
  * band key folds `XXH64.hashLong` from seed 42 in child order exactly
  * as the builtin multi-arg `xxhash64(m0..m3)` does —
  * MinhashRowBandsSpec pins the equality on the real corpus. A doc
  * with NO shingles returns NULL (the aggregation form produces no
  * row for it), so `posexplode` emits nothing, keeping "absent from
  * the index" semantics identical.
  *
  * Exists because the streaming probe side must not aggregate (append
  * mode) and the equivalent `aggregate`/`zip_with` HOF fold runs
  * interpreted per element — measured 83.7 s vs 3.4 s for 50k docs at
  * the 10× corpus; this expression is one virtual call per row around
  * primitive long loops (CodegenFallback: the loop body dominates, so
  * full codegen would only remove the per-row call). */
case class MinhashBands(child: Expression, nHash: Int, bands: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  private val p = 2147483647L
  private val rowsPerBand = nHash / bands
  require(nHash % bands == 0, "nHash must be a multiple of bands")

  // containsNull is REJECTED, not tolerated: the aggregation twin
  // (explode + xxhash64) hashes a null token to the seed and folds
  // pmod(42,p) into every permutation minimum, while a skip-nulls eval
  // here would silently drift from a batch-built index. All engine
  // call sites feed WordNgrams output (containsNull=false by dataType);
  // anything else must prove the same before using this expression.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, true) => TypeCheckResult.TypeCheckFailure(
      "graft_minhash_bands requires ARRAY<STRING> with containsNull=false: " +
        "null elements would make row-form band keys diverge from the " +
        "aggregation-built index (which hashes null tokens to the seed)")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_bands expects ARRAY<STRING>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // shingle-less docs yield NULL
  override def prettyName: String = "graft_minhash_bands"

  @transient private lazy val (coefA, coefB) = MinhashBands.coefficients(nHash, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(nHash)(p)
    var seen = false
    var i = 0
    while (i < n) {
      // checkInputDataTypes rejects containsNull=true schemas; this
      // guard only defends against a misdeclared schema at runtime
      if (!arr.isNullAt(i)) {
        seen = true
        val h0 = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        val h = ((h0 % p) + p) % p
        var k = 0
        while (k < nHash) {
          val v = (h * coefA(k) + coefB(k)) % p // operands positive < p
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (!seen) return null
    val buckets = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bh = 42L
      var j = 0
      while (j < rowsPerBand) {
        bh = XXH64.hashLong(mins(b * rowsPerBand + j), bh)
        j += 1
      }
      buckets(b) = bh
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(buckets)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

object MinhashBands {
  /** Same seeded draw as the aggregation form's coefficient list:
    * `(|nextLong| % p | 1, |nextLong| % p)` per permutation. */
  private[functions] def coefficients(nHash: Int, seed: Long): (Array[Long], Array[Long]) = {
    val p = 2147483647L
    val rng = new scala.util.Random(seed)
    val a = new Array[Long](nHash)
    val b = new Array[Long](nHash)
    var i = 0
    while (i < nHash) {
      a(i) = math.abs(rng.nextLong()) % p | 1L
      b(i) = math.abs(rng.nextLong()) % p
      i += 1
    }
    (a, b)
  }

  def bands(grams: Column, nHash: Int = 32, nBands: Int = 8,
            seed: Long = 42L): Column =
    ColumnBridge.column(MinhashBands(ColumnBridge.expression(grams), nHash, nBands, seed))
}
