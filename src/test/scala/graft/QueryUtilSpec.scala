package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.queries.QueryUtil

/** Pins the integer-cents kernel against the decimal formulation it
  * replaced: for in-domain 2-decimal money values the two are
  * value-identical, so swapping the kernel could not move any oracle
  * hash — and the cents path must stay exact under permutation
  * (integer sums are order-independent by construction).
  */
class QueryUtilSpec extends SparkSpec {
  import spark.implicits._

  // deterministic 2-decimal fuzz corpus incl. negatives, zero, and
  // values whose double repr sits just under the true decimal
  // (the 0.29-style binary-fraction hazards)
  private val rng = new scala.util.Random(7)
  private val values: Seq[Double] =
    Seq(0.0, 0.01, -0.01, 0.29, 0.07, -123.45, 949999.99, -949999.99) ++
      Seq.fill(5000)((rng.nextLong() % 100000000L) / 100.0)

  test("cents == BigDecimal-rounded cents for every in-domain 2-decimal value") {
    val got = values.toDF("v")
      .select(QueryUtil.cents(col("v")).as("c")).collect().map(_.getLong(0))
    val want = values.map(v =>
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact)
    got.zip(want).zip(values).foreach { case ((g, w), v) =>
      assert(g == w, s"cents($v): $g != $w")
    }
  }

  test("dsum == the decimal-sum formulation it replaced, bit-for-bit") {
    val df = values.toDF("v")
    val viaCents = df.agg(QueryUtil.dsum(col("v"))).head.getDouble(0)
    val viaDecimal = df
      .agg(sum(col("v").cast(DecimalType(12, 2))).cast(DoubleType))
      .head.getDouble(0)
    // both are exact-integer sums scaled by 100 — the nearest-double
    // conversions agree whenever the sum is inside 2^53 cents
    assert(viaCents == viaDecimal, s"$viaCents != $viaDecimal")
  }

  test("dsum is partitioning-invariant (exact integer accumulation)") {
    val df = values.toDF("v")
    val a = df.repartition(1).agg(QueryUtil.dsum(col("v"))).head.getDouble(0)
    val b = df.repartition(17).agg(QueryUtil.dsum(col("v"))).head.getDouble(0)
    assert(a == b)
  }

  test("dsumDiscTax == the decimal product-sum formulation, on money x rates") {
    val rows = Seq.fill(2000)((
      (rng.nextInt(100000000).abs / 100.0),
      rng.nextInt(11) / 100.0,
      rng.nextInt(9) / 100.0)).toDF("p", "d", "t")
    val viaCents = rows.agg(
      QueryUtil.dsumDiscTax(col("p"), col("d"), col("t"))).head.getDouble(0)
    val price = col("p").cast(DecimalType(12, 2))
    val disc = col("d").cast(DecimalType(4, 2))
    val tax = col("t").cast(DecimalType(4, 2))
    val one = lit(1).cast(DecimalType(3, 2))
    val viaDecimal = rows.agg(
      sum(price * (one - disc) * (one + tax)).cast(DoubleType)).head.getDouble(0)
    assert(viaCents == viaDecimal, s"$viaCents != $viaDecimal")
  }
}
