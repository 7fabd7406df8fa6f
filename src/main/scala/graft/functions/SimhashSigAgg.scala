package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash signature aggregate — the fused form of the 128 separate
  * `sum(((h_k >> j) & 1) * 2 - 1)` agg columns the signature pass ran
  * per document (round 21, guide §1.2 per-task work): one aggregate
  * holding the 8×16 per-bit ±1 sums in a primitive long[128] buffer,
  * its eval folding each sixteenth's sums into the positive-bit mask
  * `t_k = Σ_j (sum_{k,j} > 0 ? 2^j : 0)` — exactly the
  * `when(b > 0, 2^j).otherwise(0)` reduce the projection computed from
  * the 128 columns. Per input row: 8 array reads + 128 primitive adds
  * in one tight loop, instead of 128 independently evaluated agg
  * expressions each re-reading its element and re-computing shift/and/
  * scale into 128 separate buffer slots.
  *
  * Exact-equality argument (SimhashSigAggSpec pins it, corpus +
  * adversarial inputs):
  *  - a NULL input array contributes nothing — the old column form's
  *    `hs[k]` was NULL so every one of its 128 sums skipped the row;
  *  - a NULL array ELEMENT skips only that sixteenth's 16 sums (the
  *    old per-column null-skip), though [[Md5Sixteenths]] never emits
  *    one;
  *  - a group whose every row is NULL yields all-zero counters ⇒ all
  *    t_k = 0, matching the old form's `when(NULL > 0, ·).otherwise(0)`;
  *  - ±1 integer sums are order-independent, so partial/final merge
  *    order cannot move a hash.
  *
  * 100 TB story: the buffer is 1 KiB per group, partial-aggregating
  * map-side like any sum — the shuffle carries one 128-long row per
  * (partition, doc) instead of anything word-sized; ObjectHashAggregate
  * falls back to sort-based aggregation under memory pressure like
  * every TypedImperativeAggregate.
  */
case class SimhashSig(child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_sig expects ARRAY<BIGINT>, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](128)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(8, arr.numElements())
      var k = 0
      while (k < n) {
        if (!arr.isNullAt(k)) {
          val h = arr.getLong(k)
          val base = k * 16
          var j = 0
          while (j < 16) {
            buf(base + j) += ((h >> j) & 1L) * 2L - 1L
            j += 1
          }
        }
        k += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 128) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](8)
    var k = 0
    while (k < 8) {
      var t = 0L
      val base = k * 16
      var j = 0
      while (j < 16) {
        if (buf(base + j) > 0) t |= (1L << j)
        j += 1
      }
      out(k) = t
      k += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(128 * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](128)
    ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimhashSig =
    copy(child = newChildren.head)
}

object SimhashSig {
  /** `sig(hs)` aggregates a group's 8-sixteenth md5 rows into the
    * 8-element [t0..t7] signature array. */
  def sig(c: Column): Column =
    ColumnBridge.column(
      SimhashSig(ColumnBridge.expression(c)).toAggregateExpression())
}
