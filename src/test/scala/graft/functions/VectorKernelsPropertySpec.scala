package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property sweep of the native vector kernels against their interpreted
  * higher-order-function witnesses (VERDICT r14 task 8): every oracle
  * that hashes raw doubles rides these kernels, so a future kernel edit
  * that drifts even one ulp — or one null decision — must fail loudly
  * here, not silently move oracle hashes. Raw ScalaCheck generators with
  * fixed seeds (the scalatest bridge artifact isn't in the offline
  * cache), same discipline as graft.ingest.PropertySpec.
  *
  * Coverage demanded by the task: lengths 0–256, NaN/±Inf/null element
  * mixes, unequal lengths — asserting BIT-equality (doubleToRawLongBits)
  * of DotProductD vs the zip_with/aggregate fold and of ArgminSqDist
  * (through argminCid) vs the k-interpreted-folds first-position-of-min.
  */
class VectorKernelsPropertySpec extends SparkSpec {
  import spark.implicits._

  // element generator: dense in ordinary values, spiked with the IEEE
  // specials and a null slot
  private val element: Gen[java.lang.Double] = Gen.frequency(
    8 -> Gen.chooseNum(-1e6, 1e6).map(d => java.lang.Double.valueOf(d)),
    2 -> Gen.oneOf(
      java.lang.Double.valueOf(Double.NaN),
      java.lang.Double.valueOf(Double.PositiveInfinity),
      java.lang.Double.valueOf(Double.NegativeInfinity),
      java.lang.Double.valueOf(0.0),
      java.lang.Double.valueOf(-0.0),
      java.lang.Double.valueOf(java.lang.Double.MIN_VALUE),
      java.lang.Double.valueOf(1e308),
      java.lang.Double.valueOf(-1e308)),
    1 -> Gen.const(null: java.lang.Double))

  private def vecOf(len: Int, seed: Long): Seq[java.lang.Double] =
    (0 until len).map(i =>
      element(Gen.Parameters.default, Seed(seed * 1000003L + i))
        .getOrElse(java.lang.Double.valueOf(0.0)))

  // deterministic length schedule: dense at the argmin dims (16) for
  // equal-length value-path hits, spread over 0-256 for the null path
  private def lenOf(seed: Long): Int = {
    val r = new scala.util.Random(seed)
    r.nextInt(10) match {
      case 0 => r.nextInt(257)
      case 1 => 0
      case 2 | 3 | 4 => 16
      case _ => r.nextInt(33)
    }
  }

  private def assertBitEqual(rows: Array[Row], what: String): Unit =
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"$what null disagreement at row $i: $r")
      if (!r.isNullAt(0)) {
        r.get(0) match {
          case d: java.lang.Double =>
            // NaN payloads are NOT bit-pinned: Spark's UnsafeWriter
            // canonicalizes NaN when materializing intermediate arrays
            // (the HOF path), while the kernel computes the scalar
            // directly — both are NaN, and no oracle emits NaN, so NaN
            // vs NaN passes; every non-NaN double must bit-match.
            val slow = r.getDouble(1)
            if (d.isNaN || slow.isNaN)
              assert(d.isNaN && slow.isNaN, s"$what NaN disagreement at row $i: $r")
            else
              assert(java.lang.Double.doubleToRawLongBits(d) ==
                java.lang.Double.doubleToRawLongBits(slow),
                s"$what bit disagreement at row $i: $r")
          case _ =>
            assert(r.get(0) == r.get(1), s"$what disagreement at row $i: $r")
        }
      }
    }

  test("property: graft_dot == HOF fold over random lengths 0-256 with " +
    "NaN/Inf/null/subnormal mixes and unequal lengths") {
    val rows = (0 until 400).map { i =>
      // ~half the pairs share a length (value path), ~half differ (null path)
      val la = lenOf(i * 2L + 1)
      val lb = if (i % 2 == 0) la else lenOf(i * 2L + 2)
      (vecOf(la, i * 7L + 3), vecOf(lb, i * 7L + 4))
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorKernels.dotD(col("a"), col("b")).as("fast"),
      VectorOps.dotDHof(col("a"), col("b")).as("slow")).collect()
    assertBitEqual(got, "graft_dot")
    // the sweep must exercise both branches
    assert(got.exists(_.isNullAt(0)) && got.exists(!_.isNullAt(0)))
  }

  test("property: argminCid == HOF first-position-of-min over random " +
    "vectors incl. specials; length mismatch and null elements -> NULL " +
    "in BOTH forms") {
    val dims = 16
    val rng = new scala.util.Random(23)
    val cents: Seq[(Long, Array[Double])] =
      (0L until 8L).map(c => (c * 5 + 2, Array.fill(dims)(rng.nextGaussian())))
    // explicit pins FIRST for the advisory's exact failure mode: a
    // length-mismatched (prefix-shaped) vector must be NULL, not a
    // silently-wrong prefix assignment
    val short = Seq((1L, Seq.fill(dims - 1)(java.lang.Double.valueOf(1.0))), // dims-1
      (2L, Seq.fill(dims + 1)(java.lang.Double.valueOf(1.0))),               // dims+1
      (3L, Seq.empty[java.lang.Double]))                                     // empty
      .toDF("id", "vec")
    val mm = short.select(
      graft.queries.Similarity.argminCid(col("vec"), cents).as("fast"),
      graft.queries.Similarity.argminCidHof(col("vec"), cents).as("slow"))
      .collect()
    mm.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1),
      s"length mismatch must be NULL in both forms: $r"))
    val rows = (0 until 400).map { i =>
      (i.toLong, vecOf(lenOf(i * 3L + 11), i * 13L + 5))
    }
    val df = rows.toDF("id", "vec")
    val got = df.select(
      graft.queries.Similarity.argminCid(col("vec"), cents).as("fast"),
      graft.queries.Similarity.argminCidHof(col("vec"), cents).as("slow"))
      .collect()
    assertBitEqual(got, "argmin")
    assert(got.exists(_.isNullAt(0)) && got.exists(!_.isNullAt(0)))
  }

  test("property: kernels agree with witnesses under interpreted " +
    "(non-codegen) eval too") {
    val dims = 16
    val rng = new scala.util.Random(29)
    val cents: Seq[(Long, Array[Double])] =
      (0L until 4L).map(c => (c, Array.fill(dims)(rng.nextGaussian())))
    val rows = (0 until 80).map { i =>
      (vecOf(lenOf(i * 5L + 17), i * 11L + 7), vecOf(lenOf(i * 5L + 17), i * 11L + 8))
    }
    val df = rows.toDF("a", "b")
    def run() = df.select(
      VectorKernels.dotD(col("a"), col("b")),
      graft.queries.Similarity.argminCid(col("a"), cents)).collect()
      .map(_.toString).toSeq
    val codegen = run()
    withSQLConf(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(run() == codegen)
    }
  }
}
