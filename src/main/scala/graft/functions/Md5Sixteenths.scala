package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The SimHash token kernel: MD5 of the input string, returned as the
  * 8 unsigned 16-bit "sixteenths" of the digest (array<long>, element
  * k = digest bytes 2k..2k+1 big-endian = hex chars 4k+1..4k+4) — the
  * exact values the portable DuckDB oracle replays via
  * `CAST(concat('0x', substr(md5(tok), 4k+1, 4)) AS BIGINT)`.
  *
  * Why a native expression (round-17 verdict #2, q_dedup_simhash's
  * recurring >2× hot-board readings): the composed built-in form —
  * `md5(tok)` then 8 × `conv(substring(hex, 4k+1, 4), 16, 10)
  * .cast(long)` — allocates per TOKEN one 32-char hex UTF8String, 8
  * substring slices, and 8 conv decimal strings (~17 short-lived
  * objects per word of the corpus); the signature pass is the entry's
  * dominant cost and that allocation rate is exactly the GC-adjacency
  * profile the slow boards showed. This kernel hashes the token's
  * UTF-8 bytes directly through a per-thread reused MessageDigest
  * (no hex round-trip — the sixteenths come straight off the digest
  * bytes) and allocates ONE primitive-backed array per token inside
  * whole-stage codegen.
  */
case class Md5Sixteenths(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5_sixteenths expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_md5_sixteenths"

  override def nullSafeEval(input: Any): Any =
    Md5Sixteenths.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Sixteenths.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Sixteenths =
    copy(child = newChild)
}

object Md5Sixteenths {

  // MessageDigest is not thread-safe and getInstance is a provider
  // lookup — reuse one per executor thread across the whole scan
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** digest(utf8 bytes) → 8 big-endian 16-bit chunks as longs. */
  def compute(s: UTF8String): UnsafeArrayData = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    val out = new Array[Long](8)
    var k = 0
    while (k < 8) {
      out(k) = (((d(2 * k) & 0xff) << 8) | (d(2 * k + 1) & 0xff)).toLong
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def md5Sixteenths(c: Column): Column =
    ColumnBridge.column(Md5Sixteenths(ColumnBridge.expression(c)))

  /** The minhash base-hash kernel: the first 15 hex chars of
    * md5(token) as a 60-bit long — the value
    * `conv(substring(md5(tok), 1, 15), 16, 10)` computes, straight
    * off the digest bytes (15 big-endian nibbles = bytes 0..6 plus
    * the high nibble of byte 7). Shares [[compute]]'s rationale:
    * q_dedup_minhash's signature pass pays the same ~17-allocation
    * per-token chain the simhash pass did. */
  def computeHex15(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xff); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xf)
  }
}

/** [[Md5Sixteenths]]'s scalar sibling for the minhash base hash:
  * STRING → 60-bit LONG (first 15 md5 hex nibbles), codegen'd. */
case class Md5Hex15(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5_hex15 expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_md5_hex15"

  override def nullSafeEval(input: Any): Any =
    Md5Sixteenths.computeHex15(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Sixteenths.computeHex15($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Hex15 =
    copy(child = newChild)
}

object Md5Hex15 {
  def md5Hex15(c: Column): Column =
    ColumnBridge.column(Md5Hex15(ColumnBridge.expression(c)))
}
