package graft

import org.apache.spark.sql.functions._
import graft.queries.{Profiling, Relational, Similarity}

/** Round-14 invariants. Value correctness of the public entries is
  * oracle-gated at three scales in Verify/check; these pin the
  * semantics and scale properties the oracle can't see.
  */
class Round14Spec extends SparkSpec {

  import spark.implicits._

  // ── promoted approx gates (no_oracle 8 → 6) ───────────────────────

  test("q_hist_equidepth_approx (gated form): all k−1 split ranks honor " +
    "the sketch bound on the real corpus") {
    val rows = Profiling.qHistEquidepthApproxGated(spark, sf).collect()
    assert(rows.length == 9, s"expected 9 split rows, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(1) == 1L, s"split rank bound violated: $r")
    }
  }

  test("q_winsorize_approx (gated form): both trim bounds honor the " +
    "sketch rank contract per group") {
    val rows = Profiling.qWinsorizeApproxGated(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 1L && r.getLong(2) == 1L,
        s"winsorize bound rank violated: $r")
    }
  }

  test("rank gate REJECTS out-of-bound ranks at the new gates' " +
    "percentile points (p=1/20, 19/20, i/10)") {
    // n=200000, acc=10000 ⇒ slack n/acc + 1 = 21 ranks
    val n = 200000L
    def flags(pNum20: Long, targets: Seq[(Long, Long)]): Seq[Long] =
      targets.toDF("below", "at_or_below")
        .select(Relational.rankOk(col("below"), col("at_or_below"),
          lit(n), pNum20, 10000L).as("ok"))
        .collect().map(_.getLong(0)).toSeq
    // p = 0.05 → target rank 10000
    assert(flags(1L, Seq((9999L, 10000L), (10020L, 10021L),
      (10100L, 10101L), (9900L, 9901L))) == Seq(1L, 1L, 0L, 0L))
    // p = 0.95 → target rank 190000
    assert(flags(19L, Seq((189999L, 190000L), (190100L, 190101L))) ==
      Seq(1L, 0L))
    // p = 3/10 (a hist split) → target rank 60000
    assert(flags(6L, Seq((59999L, 60000L), (60500L, 60501L))) ==
      Seq(1L, 0L))
  }

  // ── q_embed_pca_power: the multi-pass fix stays in place ──────────

  test("q_embed_pca_power materializes the covariance rows once " +
    "(localCheckpoint feeds all three passes)") {
    val df = Similarity.qEmbedPcaPower(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the checkpointed `rows`/`v1` appear as ExistingRDD scans — the
    // corpus-sized covariance shuffle is NOT re-planned per pass
    assert(plan.contains("ExistingRDD"),
      s"expected checkpointed covariance rows in plan:\n${plan.take(600)}")
    assert(df.collect().length == 8)
  }
}
