package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd LSH signature must agree bit-for-bit with the
  * interpreted higher-order-function formulation (same seed → same
  * plane matrix, same fold order) under both evaluation modes — the
  * (band, bucket) equi-join in embed dedup is only sound if every
  * path derives identical buckets. */
class LshSignatureSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64
  private def corpus(n: Int, seed: Long): Seq[(Long, Array[Double])] = {
    val rng = new scala.util.Random(seed)
    (0L until n).map(i => (i, Array.fill(dims)(rng.nextGaussian())))
  }

  test("codegen signature equals the interpreted column formulation") {
    val df = corpus(50, 7).toDF("id", "vec")
    val rows = df.select(
        LshSignature.signature(col("vec"), dims).as("fast"),
        // column version emits array<struct<band,bucket>>: project buckets
        transform(VectorOps.lshBandBuckets(col("vec"), dims), s =>
          s.getField("bucket")).as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"codegen/interpreted bucket mismatch: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
  }

  test("property: codegen == interpreted signature over random lengths " +
    "and IEEE specials (round-15 fuzz discipline)") {
    val rng = new scala.util.Random(37)
    def specialOr(d: Double): Double = rng.nextInt(12) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity
      case 3 => -0.0
      case 4 => java.lang.Double.MIN_VALUE
      case _ => d
    }
    val rows = (0 until 200).map { i =>
      // mostly dims-length, some short/long/empty — malformed lengths
      // exercise the shared NULL path (round 15: length-mismatched
      // vectors are NULL in both forms, never a prefix signature) —
      // plus occasional NULL ELEMENTS (round 16: a null element also
      // poisons the whole signature to NULL in both forms)
      val len = rng.nextInt(8) match {
        case 0 => rng.nextInt(dims)
        case 1 => dims + rng.nextInt(16)
        case 2 => 0
        case _ => dims
      }
      val vec: Seq[Option[Double]] = Seq.fill(len)(
        if (rng.nextInt(40) == 0) None
        else Some(specialOr(rng.nextGaussian())))
      (i.toLong, vec)
    }
    val df = rows.toDF("id", "vec")
    val got = df.select(
        LshSignature.signature(col("vec"), dims).as("fast"),
        transform(VectorOps.lshBandBuckets(col("vec"), dims), s =>
          s.getField("bucket")).as("slow"))
      .collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null disagreement at $i: $r")
      if (!r.isNullAt(0))
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"bucket disagreement at $i: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
  }

  test("fuzz finds pinned: NaN projections take the SQL branch (NaN > 0 " +
    "is TRUE in Spark and DuckDB) and length mismatch is NULL, both forms") {
    val rows = Seq(
      (1L, Array.fill(dims)(Double.NaN)),        // all projections NaN
      (2L, Array.fill(dims - 1)(1.0)),           // short -> NULL
      (3L, Array.fill(dims + 3)(1.0)),           // long -> NULL
      (4L, Array[Double]()))                     // empty -> NULL
    // a dims-length vector with ONE null element -> NULL in both forms
    // (the round-16 advisory: the witness used to bucket these to 0)
    val nullElem: Seq[Option[Double]] =
      Some(1.0) +: Seq.fill(dims - 2)(Some(0.5)) :+ (None: Option[Double])
    val withNull = rows.toDF("id", "vec")
      .union(Seq((5L, nullElem)).toDF("id", "vec"))
    val got = withNull.select(col("id"),
        LshSignature.signature(col("vec"), dims).as("fast"),
        transform(VectorOps.lshBandBuckets(col("vec"), dims), s =>
          s.getField("bucket")).as("slow"))
      .orderBy("id").collect()
    // NaN vector: every sign test is NaN > 0 = TRUE -> all bits set
    assert(!got(0).isNullAt(1) &&
      got(0).getSeq[Long](1).forall(_ == (1L << 10) - 1))
    assert(got(0).getSeq[Long](1) == got(0).getSeq[Long](2))
    // malformed lengths AND null elements: NULL in BOTH forms (never a
    // prefix signature, never the bucket-0 magnet)
    (1 to 4).foreach { i =>
      assert(got(i).isNullAt(1) && got(i).isNullAt(2),
        s"malformed vector must be NULL: ${got(i)}")
    }
  }

  test("signature is identical under interpreted (non-codegen) eval") {
    val df = corpus(20, 11).toDF("id", "vec")
    val fast = df.select(LshSignature.signature(col("vec"), dims))
      .collect().map(_.getSeq[Long](0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(LshSignature.signature(col("vec"), dims))
        .collect().map(_.getSeq[Long](0))
      assert(fast.toSeq == interp.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("near-identical vectors collide on a band; random pairs differ") {
    val rng = new scala.util.Random(3)
    val base = Array.fill(dims)(rng.nextGaussian())
    val dup = base.map(_ + rng.nextGaussian() * 0.01)
    val other = Array.fill(dims)(rng.nextGaussian())
    val rows = Seq((1L, base), (2L, dup), (3L, other)).toDF("id", "vec")
      .select(LshSignature.signature(col("vec"), dims)).collect()
    val Array(sBase, sDup, sOther) = rows.map(_.getSeq[Long](0))
    // ~0.9998 cosine flips ~0.5 of the 160 sign bits: nearly every band
    // still matches, and ≥1 shared band is what candidate-gen needs
    val shared = sBase.zip(sDup).count { case (a, b) => a == b }
    assert(shared >= 1, "0.9998-cosine pair should collide on at least one band")
    assert(sBase != sOther, "independent vectors should not share the full signature")
  }
}
