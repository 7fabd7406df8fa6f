package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 contract pins that need no SparkSession. */
class Round17Spec extends AnyFunSuite {

  test("semdedupLevels: unset levels auto-size to ceil(n^(1/4)) floored " +
    "at 2; a HALF-set pair honors the set level independently") {
    import graft.queries.Dedup.semdedupLevels
    // the auto rule itself
    assert(semdedupLevels(1L, 0, 0) == (2, 2))       // floor
    assert(semdedupLevels(16L, 0, 0) == (2, 2))      // 16^(1/4) = 2
    assert(semdedupLevels(17L, 0, 0) == (3, 3))      // ceil kicks in
    assert(semdedupLevels(24000L, 0, 0) == (13, 13)) // the 10x corpus
    assert(semdedupLevels(600000L, 0, 0) == (28, 28))
    // both set: taken verbatim (resolved before this fn in the entry,
    // but the pure rule must agree)
    assert(semdedupLevels(24000L, 32, 20) == (32, 20))
    // HALF-set (the round-16 advisory): the set one sticks, the unset
    // one auto-sizes — not silently both-auto
    assert(semdedupLevels(24000L, 32, 0) == (32, 13))
    assert(semdedupLevels(24000L, 0, 20) == (13, 20))
  }

  test("the index bucket knob is Int-ranged: scaleKnobWide rejects " +
    "values that would have wrapped through toInt") {
    // the knob rides scaleKnobWide's <=9-digit grammar, so the values
    // the round-16 advisory exhibited (4294967297 -> 1, 4294967296 ->
    // 0 under the old Long.toInt path) are REJECTED at parse; pin the
    // grammar here since env vars can't be injected into a JVM test
    val grammar = "[0-9]{1,9}"
    assert(!"4294967297".matches(grammar))
    assert(!"4294967296".matches(grammar))
    assert("999999999".matches(grammar))
    assert("999999999".toInt > 0) // max accepted value fits Int
    // and the default is in range
    assert(graft.queries.Dedup.bandIndexBuckets > 0)
  }
}
