package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 contract pins that need no SparkSession.
  *
  * The pagerank auto-mass rule (`Graph.autoMass`) is mirrored verbatim
  * in the oracle's `mass` CTE (`MAX(p) over the pow10 list WHERE p <=
  * Long.MaxValue // 17 // n`). The two are maintained by hand in two
  * languages; this spec pins the Scala loop bit-equal to the CTE's
  * closed form over the full plausible node range so a drift on either
  * side fails here before it becomes an opaque oracle hash mismatch. */
class Round16Spec extends AnyFunSuite {

  // the oracle CTE's semantics, re-stated: MAX over the explicit pow10
  // list (1..10^12) of p satisfying p <= Long.MaxValue / 17 / n with
  // integer (floor) division at each step
  private def oracleMass(n: Long): Long = {
    val cap = Long.MaxValue / 17L / n
    val powers = Iterator.iterate(1L)(_ * 10L).takeWhile(_ <= 1000000000000L)
    powers.filter(_ <= cap).reduceOption((a, b) => math.max(a, b))
      .getOrElse(fail(s"no power of 10 fits for n=$n"))
  }

  test("autoMass == the oracle mass CTE over the plausible node range") {
    val ns = Seq(1L, 2L, 9L, 10L, 11L, 999L, 1000L, 11000L, 160000L,
      542459L, 542460L, 1600000L, 16000000L, 160000000L, 1600000000L,
      16000000000L, Long.MaxValue / 17L - 1, Long.MaxValue / 17L)
    ns.foreach { n =>
      assert(graft.queries.Graph.autoMass(n) == oracleMass(n),
        s"rule divergence at n=$n")
    }
    // exhaustive around every decade boundary of the cap
    (1 to 12).foreach { k =>
      val pow = math.pow(10, k).toLong
      // n values that put cap just below / at / just above each pow10
      Seq(-1L, 0L, 1L).foreach { d =>
        val n = math.max(1L, Long.MaxValue / 17L / pow + d)
        assert(graft.queries.Graph.autoMass(n) == oracleMass(n),
          s"boundary divergence at k=$k d=$d n=$n")
      }
    }
  }

  test("autoMass: gated SFs get the historical 10^12; decades size down") {
    // every driver-gated corpus (sf0.001/0.01/0.1 and the 10x decade)
    // has nodes <= ~160k -> cap >= 3.39e12 -> capped default 10^12,
    // so every pre-round-16 oracle hash is unchanged by the rule
    assert(graft.queries.Graph.autoMass(11000L) == 1000000000000L)
    assert(graft.queries.Graph.autoMass(160000L) == 1000000000000L)
    // the 100x decade (1.6M nodes) sizes down one decade below the cap
    assert(graft.queries.Graph.autoMass(1600000L) == 100000000000L)
    // headroom invariant: 17 * n * mass never overflows
    Seq(1L, 160000L, 1600000L, 16000000000L).foreach { n =>
      val m = graft.queries.Graph.autoMass(n)
      assert(n <= Long.MaxValue / 17L / m, s"headroom violated at n=$n")
    }
  }
}
