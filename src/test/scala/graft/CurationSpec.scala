package graft

import org.apache.spark.sql.functions._
import graft.queries.Curation

/** Plan-shape and semantics checks for the curation operators (their
  * value-correctness is oracle-gated in Verify/check). */
class CurationSpec extends SparkSpec {

  test("decontamination probes a BROADCAST eval-gram set (no sort-merge join)") {
    val df = Curation.qDecontaminate(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval grams must broadcast:\n${plan.take(800)}")
    // flagged docs genuinely share a 5-gram with an eval doc
    val flagged = df.collect()
    flagged.foreach(r => assert(r.getLong(1) > 0))
  }

  test("pii scrub removes every planted email and phone") {
    val out = Curation.qPiiScrub(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) >= 1, "planted email must be counted")
      assert(r.getLong(2) >= 1, "planted phone must be counted")
      val tail = r.getString(4)
      assert(!tail.contains("@example.com") && !tail.contains("+1-555-"),
        s"scrubbed tail still has PII: $tail")
      assert(tail.contains("<EMAIL>") || tail.contains("<PHONE>"))
    }
  }

  test("data mix takes an exact per-source quota, deterministically") {
    val out = Curation.qDataMix(spark, sf, quota = 25).collect()
    val bySource = out.groupBy(_.getString(1))
    bySource.foreach { case (_, rows) =>
      assert(rows.length <= 25)
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length))
    }
    // deterministic: a second run yields the identical sample
    val again = Curation.qDataMix(spark, sf, quota = 25).collect()
    assert(out.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("stratified sample respects per-stratum rates and is deterministic") {
    val out = Curation.qSampleStratified(spark, sf).collect()
    assert(out.nonEmpty)
    val byLang = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    byLang.foreach { case (lang, (total, kept)) =>
      assert(kept <= total, s"$lang kept > total")
      assert(kept >= 0)
    }
    // the downsampled stratum keeps a strictly smaller share than the
    // keep-everything tail (rates 20 % vs 100 %)
    byLang.get("en").zip(byLang.get("fr")).foreach {
      case ((enT, enK), (frT, frK)) =>
        assert(frK == frT, "tail stratum keeps everything")
        assert(enK.toDouble / enT < 0.5, s"en keep share too high: $enK/$enT")
    }
    val again = Curation.qSampleStratified(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("holdout split partitions the corpus with stable membership") {
    val out = Curation.qSplitHoldout(spark, sf).collect()
    val names = out.map(_.getString(0)).toSet
    assert(names == Set("train", "val", "test"))
    val total = out.map(_.getLong(1)).sum
    val corpus = graft.Tables.documents(spark, sf).count()
    assert(total == corpus, "splits must partition the corpus exactly")
    val train = out.find(_.getString(0) == "train").get.getLong(1)
    assert(train.toDouble / total > 0.75, "train must dominate (≈90 %)")
    // membership is a pure function of the key: rerun manifests match
    val again = Curation.qSplitHoldout(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("doc repetition ratios are consistent (distinct <= total, shares in (0,1])") {
    Curation.qDocRepetition(spark, sf).collect().foreach { r =>
      val (n, d) = (r.getLong(1), r.getLong(2))
      assert(d <= n && d > 0)
      val rep = r.getDouble(3)
      assert(rep >= 0.0 && rep < 1.0)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }
}
