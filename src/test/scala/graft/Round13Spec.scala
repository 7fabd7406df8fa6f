package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.{Curation, Dedup, Relational}

/** Round-13 invariants. Value correctness of the public entries is
  * oracle-gated at three scales in Verify/check; these pin the
  * semantics and scale properties the oracle can't see.
  */
class Round13Spec extends SparkSpec {

  import spark.implicits._

  // ── scalableNtile: skew-proof equal-depth buckets ─────────────────

  /** Zipf-ish long tail: value = floor(C / rank) so a handful of rows
    * carry values orders of magnitude above the mass — the shape that
    * collapsed the old equal-width buckets into the lowest few. */
  private def zipfDf(n: Int) =
    spark.range(1, n + 1L).toDF("id")
      .withColumn("v", (lit(100000000L) / col("id")).cast("long"))

  test("scalableNtile: equal-depth buckets stay balanced on a planted " +
    "zipf column (max bucket ≤ 2n/64)") {
    val n = 20000
    val bucketed = Relational.ntileBuckets(
      zipfDf(n).withColumn("__v", col("v")))
    val counts = bucketed.groupBy("__bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxPop = counts.values.max
    assert(maxPop <= 2L * n / 64,
      s"max bucket population $maxPop exceeds 2n/64 = ${2L * n / 64}; " +
        s"buckets: ${counts.toSeq.sortBy(_._1)}")
    // and the buckets genuinely spread: far more than the handful the
    // old equal-width scheme produced on this shape
    assert(counts.size >= 32, s"only ${counts.size} non-empty buckets")
  }

  test("scalableNtile: equal-width buckets WOULD have collapsed on the " +
    "same zipf column (regression contrast)") {
    val n = 20000
    val df = zipfDf(n)
    val row = df.agg(min("v"), max("v")).head
    val (mn, mx) = (row.getLong(0), row.getLong(1))
    val width = (mx - mn) / 64 + 1
    val worst = df
      .withColumn("b", ((col("v") - mn) / width).cast("long"))
      .groupBy("b").count().agg(max("count")).head.getLong(0)
    assert(worst > 2L * n / 64,
      s"contrast premise broken: equal-width worst bucket $worst")
  }

  test("scalableNtile matches SQL NTILE on the zipf column for k=5 and k=7") {
    for (k <- Seq(5, 7)) {
      val got = Relational.scalableNtile(
          zipfDf(5000), col("v"), col("id"), k, "tile")
        .select(col("id"), col("tile"))
      val want = zipfDf(5000)
        .withColumn("tile",
          ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select(col("id"), col("tile"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"ntile mismatch for k=$k")
    }
  }

  // ── token budget ──────────────────────────────────────────────────

  test("q_curation_token_budget: per-source budget respected, prefix " +
    "maximal, and partition-count independent") {
    val out = Curation.qCurationTokenBudget(spark, sf).collect()
    val bySrc = out.groupBy(_.getString(1))
    bySrc.foreach { case (src, rows) =>
      val maxCum = rows.map(_.getLong(3)).max
      assert(maxCum <= 800L, s"$src over budget: $maxCum")
    }
    // two-level bucketed cumsum must equal the plain one-window form
    // at any parallelism
    val a = out.map(_.toString).sorted.toSeq
    val b = withSQLConf("spark.sql.shuffle.partitions" -> "1") {
      Curation.qCurationTokenBudget(spark, sf).collect().map(_.toString).sorted.toSeq
    }
    assert(a == b, "budget cut moved with partition count")
  }

  // ── index append ──────────────────────────────────────────────────

  test("q_dedup_index_append: wave-2 replays match WAVE-1 ADMITS through " +
    "the appended index, not just the original corpus") {
    val off1 = Dedup.docReplayOffset(graft.Tables.documents(spark, sf))
    val rows = Dedup.qDedupIndexAppend(spark, sf).collect()
    val wave2 = rows.filter(_.getLong(0) == 2L)
    // replay-2 docs (ids +2·off1, the derived offset) whose partner is a
    // wave-1 novel doc (300 <= id < 600): these pairs exist ONLY because
    // admitted wave-1 signatures were appended to the index
    val viaAppend = wave2.filter(r => r.getLong(1) >= 2L * off1 &&
      r.getLong(2) >= 300L && r.getLong(2) < 600L)
    assert(viaAppend.nonEmpty,
      s"no wave-2 pair rides the appended index: ${wave2.take(5).toSeq}")
    // and wave-1 corpus replays were REJECTED (caught against the
    // original index), so none of them reappear as wave-2 partners
    assert(wave2.forall(r => r.getLong(2) < off1),
      "a rejected wave-1 replay leaked into the index")
  }

  // ── multiset set-ops ──────────────────────────────────────────────

  test("q_set_ops_all: bag identities hold and the plan is aggregate-" +
    "rewritten, not a row-pairing join") {
    val out = Relational.qSetOpsAll(spark, sf)
    val by = out.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // |A ∩all B| + |A \all B| = |A|, and symmetrically for B
    val nA = by("intersect_all") + by("except_all")
    val nB = by("intersect_all") + by("except_all_rev")
    assert(by("union_all") == nA + nB,
      s"bag identity broken: $by")
    // RewriteIntersectAll/RewriteExceptAll: count-aggregate + generate,
    // never a SortMergeJoin/ShuffledHashJoin pairing rows
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"unexpected join in set-op plan:\n${plan.take(800)}")
  }

  // ── approx-percentile rank gate ───────────────────────────────────

  test("percentile rank gate: accepts in-bound ranks, REJECTS a sketch " +
    "value whose rank violates n/acc") {
    // n=100000, p=0.5 (pNum20=10), acc=1000 ⇒ target rank 50000,
    // slack n/acc + 1 = 101
    val df = Seq(
      (49999L, 50001L, 100000L), // exact median: inside
      (50100L, 50101L, 100000L), // +100 ranks: inside the 101 slack
      (49898L, 49899L, 100000L), // -101..: boundary, inside
      (51000L, 51001L, 100000L), // +1000 ranks: OUTSIDE
      (10000L, 10001L, 100000L)  // way off: OUTSIDE
    ).toDF("below", "at_or_below", "n")
    val flags = df.select(Relational.rankOk(col("below"),
      col("at_or_below"), col("n"), 10L, 1000L).as("ok"))
      .collect().map(_.getLong(0)).toSeq
    assert(flags == Seq(1L, 1L, 1L, 0L, 0L), s"got $flags")
  }

  test("q_agg_percentile_approx (gated form): every flag is 1 on the " +
    "real corpus") {
    val rows = Relational.qAggPercentileApproxGated(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 1L && r.getLong(2) == 1L && r.getLong(3) == 1L,
        s"sketch rank bound violated: $r")
    }
  }

  test("scalableNtile matches SQL NTILE across distribution shapes and k " +
    "(seeded property sweep)") {
    val rng = new scala.util.Random(1313)
    val shapes: Seq[(String, Int => Long)] = Seq(
      ("uniform", _ => rng.nextInt(1000000).toLong),
      ("constant-heavy", i => if (rng.nextInt(10) < 7) 42L else rng.nextInt(100).toLong),
      ("bimodal", _ => if (rng.nextBoolean()) rng.nextInt(100).toLong
        else 1000000000L + rng.nextInt(100)),
      ("negative-skew", _ => -math.round(math.exp(rng.nextDouble() * 12))))
    for ((name, gen) <- shapes; k <- Seq(3, 8)) {
      val rows = (1 to 3000).map(i => (i.toLong, gen(i)))
      def df = spark.createDataFrame(rows).toDF("id", "v")
      val got = Relational.scalableNtile(df, col("v"), col("id"), k, "tile")
        .select(col("id"), col("tile"))
      val want = df.withColumn("tile",
          ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select(col("id"), col("tile"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"ntile mismatch for shape=$name k=$k")
    }
  }

  test("scalableNtile: all-equal values degenerate to one bucket but " +
    "still match NTILE") {
    def df = spark.range(1, 101).toDF("id").withColumn("v", lit(42L))
    val got = Relational.scalableNtile(df, col("v"), col("id"), 4, "tile")
      .select(col("id"), col("tile"))
    val want = df.withColumn("tile",
        ntile(4).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select(col("id"), col("tile"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
