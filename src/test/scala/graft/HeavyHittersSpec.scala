package graft

import org.apache.spark.sql.functions._
import graft.queries.TextAnalysis

/** Pins the Misra-Gries guarantee behind q_heavy_hitters in the LOSSY
  * regime (m far below the vocabulary), which the tiny synthetic corpus
  * never enters on its own — plus plan and determinism checks on the
  * registry form. Value-correctness of the registry form is oracle-gated
  * (exact top-k SQL) in Verify/check.
  */
class HeavyHittersSpec extends SparkSpec {

  test("registry form: exact counts, deterministic, candidate set broadcast") {
    // plan shape is asserted on the LIVE stage-2 subtree — the registry
    // form checkpoints the <= k top rows (so the guard and the output
    // share one evaluation), which hides these operators behind a
    // Scan ExistingRDD in the outer plan
    val livePlan = TextAnalysis.heavyHitterParts(spark, sf, 20, 1024)
      ._2.queryExecution.executedPlan.toString
    assert(livePlan.contains("BroadcastHashJoin") || livePlan.contains("BroadcastExchange"),
      s"candidate semi-join must broadcast:\n${livePlan.take(800)}")
    val out = TextAnalysis.qHeavyHitters(spark, sf)
    val rows = out.collect()
    assert(rows.length == 20)
    // counts are exact: compare against the plain exact aggregation
    val exact = Tables.documents(spark, sf)
      .select(explode(graft.functions.WordNgrams.grams(col("text"), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(20).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      exact.map(r => (r.getString(0), r.getLong(1))).toSeq,
      "guarantee regime: output must equal the exact top-k")
  }

  test("runtime guard: leaving the exact regime fails loudly, not silently") {
    // On the synthetic corpus the k-th bigram count is far below N/16,
    // so m=16 violates kth*m > N and the in-plan assert_true must trip
    // at materialization time.
    val ex = intercept[Exception] {
      TextAnalysis.qHeavyHitters(spark, sf, k = 20, m = 16).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("outside the Misra-Gries exact regime")),
      s"expected the exactness guard, got: ${ex.getMessage}")
  }

  test("lossy regime (m << vocab): every gram with count > N/m survives") {
    import spark.implicits._
    // Skewed fixture: gram i appears ~ 1000/i times (Zipf-ish), vocab 200,
    // shuffled deterministically so heavy grams are interleaved with tail.
    val rows = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"g$i"))
    val shuffled = rows.zipWithIndex
      .sortBy { case (_, ix) => (ix * 2654435761L) % 1000000007L }
      .map(_._1)
    val df = shuffled.toDF("text").repartition(4)
    val m = 16
    val n = rows.length.toLong
    val out = df.select(col("text").as("gram")).as[String]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { g =>
          counters.get(g) match {
            case Some(c) => counters(g) = c + 1
            case None if counters.size < m => counters(g) = 1L
            case None =>
              counters.mapValuesInPlace((_, v) => v - 1)
              counters.filterInPlace((_, v) => v > 0)
          }
        }
        counters.keysIterator
      }.collect().toSet
    assert(out.size <= m * 4, "each partition emits at most m survivors")
    val trueCounts = rows.groupBy(identity).view.mapValues(_.size.toLong)
    val mustSurvive = trueCounts.filter { case (_, c) => c > n / m }.keys
    assert(mustSurvive.nonEmpty, "fixture must exercise the guarantee")
    mustSurvive.foreach { g =>
      assert(out.contains(g), s"gram $g with count ${trueCounts(g)} > N/m=${n / m} must survive")
    }
  }
}
