package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_percentile stays within 5% of the exact per-group percentiles") {
    val exact = Relational.qAggPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Relational.qAggPercentileApprox(spark, sf).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (em, ep, eq) = exact(r.getString(0))
      // atol absorbs the discrete-vs-interpolated quantile definition
      // gap: approx_percentile returns an actual data value, exact
      // percentile() interpolates between two
      def close(a: Double, e: Double, atol: Double) =
        math.abs(a - e) <= math.max(0.05 * math.abs(e), atol)
      assert(close(r.getDouble(1), em, 0), s"median ${r.getDouble(1)} vs $em")
      assert(close(r.getDouble(2), ep, 0), s"p90 ${r.getDouble(2)} vs $ep")
      // l_quantity is integer-valued: one discrete step of tolerance
      assert(close(r.getDouble(3), eq, 1.0), s"q1 ${r.getDouble(3)} vs $eq")
    }
  }

  test("q_agg_group: 6 groups, aliased columns, deterministic order") {
    val df = Relational.qAggGroup(spark, sf)
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty",
      "avg_price", "avg_disc", "count_order"))
    val rows = df.collect()
    assert(rows.length == 6)
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(flags == flags.sorted)
    assert(rows.map(_.getLong(9)).sum > 0)
  }

  test("every query id has spark impl; oracle keys are a subset") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("no query id collides across family registries (Map ++ overrides silently)") {
    import graft.queries._
    val families = Seq(Relational.queries, RelationalTpch.queries,
      Funcs.queries, Events.queries,
      TextAnalysis.queries, Dedup.queries, Similarity.queries,
      Extensions.queries, Curation.queries, Profiling.queries,
      Graph.queries, Streaming.queries, Cdc.queries, Ingest.queries)
    val total = families.map(_.size).sum
    assert(SparkEntry.queries.size == total,
      s"registry collision: merged=${SparkEntry.queries.size} sum=$total")
  }

  test("approx_count_distinct stays within 5% of exact") {
    Relational.qAggApprox(spark, sf).collect().foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"approx=$approx exact=$exact")
    }
  }
}
