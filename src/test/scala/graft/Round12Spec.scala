package graft

import org.apache.spark.sql.functions._
import graft.queries.{Curation, Events, Graph, Profiling, TextAnalysis}

/** Semantics and plan-shape checks for this session's additions
  * (value-correctness is oracle-gated at three scales in Verify/check):
  * q_events_ewma, q_events_attribution, q_graph_bfs, q_curation_kanon,
  * q_profile_corr.
  */
class Round12Spec extends SparkSpec {

  test("ewma: all 16 lag terms ride ONE window pass, and the dyadic sum " +
    "is partition-count independent") {
    val out = Events.qEventsEwma(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert("(?i)\\bwindow\\b".r.findAllIn(plan).size >= 1)
    // exactly one Window node: the 16 lags share a single buffer walk
    assert(plan.linesIterator.count(_.trim.startsWith("+- Window")) +
      plan.linesIterator.count(_.trim.startsWith("Window")) <= 2,
      s"expected a single Window operator, plan:\n$plan")
    val a = out.collect()
    val b = withSQLConf("spark.sql.shuffle.partitions" -> "1") {
      Events.qEventsEwma(spark, sf).collect()
    }
    // bit-identical doubles at any parallelism — the dyadic-exactness claim
    assert(a.map(_.getDouble(3)).toSeq == b.map(_.getDouble(3)).toSeq)
  }

  test("ewma: first event of a user equals its own value; bounds hold") {
    val rows = Events.qEventsEwma(spark, sf).collect()
    // ewma16 ∈ [x_min_window, 2·x_max] (geometric series bound Σ2⁻ᵏ < 2)
    rows.foreach { r =>
      val e = r.getDouble(3)
      assert(e >= 0.0 && e < 2.0 * 328, s"ewma out of bound: $e")
    }
  }

  test("attribution: channels are non-purchase types plus direct, and " +
    "conversions sum to the purchase count") {
    val out = Events.qEventsAttribution(spark, sf).collect()
    val channels = out.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("click", "view", "signup", "error", "direct")))
    val nPurch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(out.map(_.getLong(1)).sum == nPurch)
  }

  test("bfs: seeds at distance 0, all distances within the hop bound, " +
    "frontier rounds don't lose reachability monotonicity") {
    val rows = Graph.qGraphBfs(spark, sf).collect()
    val dist = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist.values.forall(d => d >= 0 && d <= 3))
    // every seed customer (custkey % 100 == 0) present at distance 0
    val seeds = Tables.customer(spark, sf)
      .filter(pmod(col("c_custkey"), lit(100)) === 0)
      .select("c_custkey").collect().map(_.getLong(0))
    seeds.foreach(u => assert(dist.get(u).contains(0L), s"seed $u not at 0"))
    // customers sit in even levels and suppliers in odd ones (the graph
    // is bipartite customer↔supplier, so parity is forced)
    dist.foreach { case (u, d) =>
      if (u < 1000000L) assert(d % 2 == 0, s"customer $u at odd dist $d")
      else assert(d % 2 == 1, s"supplier $u at even dist $d")
    }
  }

  test("kanon: every reported class is below k, and suppressing them " +
    "leaves only k-anonymous classes") {
    val k = 5
    val out = Curation.qCurationKanon(spark, sf, k).collect()
    assert(out.forall(_.getLong(3) < k))
    // complement check: violating rows + surviving rows = table size
    val total = Tables.customer(spark, sf).count()
    val violating = out.map(_.getLong(3)).sum
    assert(violating <= total)
    assert((total - violating) >= 0)
  }

  test("concurrency: sweep line starts/ends at zero, never negative, " +
    "and peak is bounded by one session per user") {
    val rows = Events.qEventsConcurrency(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= 0,
      s"negative active count at t=${r.getLong(0)}"))
    assert(rows.last.getLong(2) == 0, "timeline must close at 0")
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).max <= nUsers,
      "sessions of one user never overlap, so peak <= user count")
    // deltas sum to zero: every +1 has its -1
    assert(rows.map(_.getLong(1)).sum == 0)
  }

  test("concurrency: the data-sized cumsum window is bucket-partitioned, " +
    "not single-partition") {
    val plan = Events.qEventsConcurrency(spark, sf)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the t_us-level cumsum must run under a bucket partition key …
    assert(plan.contains("windowspecdefinition(bucket"),
      s"expected a bucket-partitioned cumsum window, plan:\n$plan")
    // … and the offsets join must broadcast (hours-sized side metadata)
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast offsets join, plan:\n$plan")
  }

  test("running distinct: monotone per user, ends at the user's " +
    "distinct type count") {
    val rows = Events.qWindowRunningDistinct(spark, sf).collect()
    val events = Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
    val exact = events.groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getString(1)).distinct.size }
    val byUser = rows.groupBy(_.getLong(1))
    byUser.foreach { case (u, rs) =>
      val vals = rs.map(_.getLong(2))
      assert(vals.max == exact(u),
        s"user $u final distinct ${vals.max} != exact ${exact(u)}")
      assert(vals.min >= 1)
    }
  }

  test("bpe apply: merges only ever shrink token counts, every word " +
    "still yields at least one token, and counts bound chars") {
    val rows = TextAnalysis.qBpeApply(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, chars, toks) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(toks <= chars, s"tokens $toks above char count $chars")
      assert(toks >= words, s"tokens $toks below word count $words")
    }
    // the learned merges actually fire: corpus-wide tokens < chars
    assert(rows.map(_.getLong(3)).sum < rows.map(_.getLong(2)).sum)
  }

  test("confusion matrix: rows sum to per-language doc counts and " +
    "basis points to ~10000") {
    import graft.queries.TextAnalysis
    val m = TextAnalysis.qTextConfusion(spark, sf).collect()
    val docCounts = Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    m.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      assert(cells.map(_.getLong(2)).sum == docCounts(lang))
      val bp = cells.map(_.getLong(3)).sum
      assert(bp > 10000 - cells.length && bp <= 10000,
        s"$lang basis points $bp (floor-division dust bound)")
    }
  }

  test("interarrival: per-type median equals the driver-side lower " +
    "median of the lag gaps") {
    val out = Events.qEventsInterarrival(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("ts div 1000"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    out.foreach { r =>
      val tpe = r.getString(0)
      val tg = ev.groupBy(t => (t._1, t._2)).filter(_._1._2 == tpe).values
        .flatMap { rs =>
          val s2 = rs.sortBy(t => (t._3, t._4)).map(_._3)
          s2.zip(s2.drop(1)).map { case (a, b) => b - a }
        }.toSeq.sorted
      assert(r.getLong(1) == tg.length.toLong)
      assert(r.getLong(2) == tg((tg.length + 1) / 2 - 1),
        s"$tpe median mismatch")
      assert(r.getLong(3) == tg.max)
    }
  }

  test("rfm: bucketed two-level NTILE matches Spark's own ntile() under " +
    "the identical total order, and segments partition the customers") {
    import graft.queries.Relational
    import org.apache.spark.sql.expressions.Window
    val out = Relational.qAggRfm(spark, sf).collect()
    // re-derive with the single-partition ntile() Spark ships — the
    // arithmetic the scalable form must reproduce exactly
    val percust = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_date"),
        count(lit(1)).as("frequency"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
          .cast("decimal(20,0)")).cast("long").as("monetary_cents"))
    val ref = percust.agg(max(col("last_date")).as("ref_date"))
    val want = percust.crossJoin(broadcast(ref))
      .withColumn("recency_days", datediff(col("ref_date"), col("last_date")))
      .withColumn("r_score", ntile(5).over(
        Window.orderBy(col("recency_days"), col("o_custkey"))))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy(col("frequency").desc, col("o_custkey"))))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy(col("monetary_cents").desc, col("o_custkey"))))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"))
      .collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong, r.getInt(2).toLong)
        -> r.getLong(3)).toMap
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))
      -> r.getLong(3)).toMap == want)
    val nCust = Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(out.map(_.getLong(3)).sum == nCust)
  }

  test("backlog: opens equal closes overall, the running census never " +
    "dips negative, and the final month drains to zero") {
    import graft.queries.Relational
    val rows = Relational.qOrdersBacklog(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == rows.map(_.getLong(2)).sum)
    assert(rows.forall(_.getLong(3) >= 0L))
    assert(rows.last.getLong(3) == 0L)
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).sorted.toSeq)
  }

  test("market basket: top pair's support and lift recompute exactly " +
    "from the raw co-order counts") {
    import graft.queries.Relational
    val out = Relational.qMarketBasket(spark, sf).collect()
    assert(out.length == 20 && out.map(_.getLong(0)).toSeq == (1L to 20L))
    val op = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = op.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    val partCount = op.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val nOrders = byOrder.size.toLong
    val top = out.head
    val (pa, pb) = (top.getLong(1), top.getLong(2))
    val nAb = byOrder.count(s => s(pa) && s(pb)).toLong
    assert(top.getLong(3) == nAb)
    assert(top.getLong(4) == nAb * 1000000L / nOrders)
    assert(top.getLong(5) ==
      nAb * nOrders * 10000L / (partCount(pa) * partCount(pb)))
  }

  test("engagement: rolling-24h at each hour is the driver-side distinct " +
    "of the trailing window, and stickiness never exceeds 10000") {
    val out = Events.qEventsEngagement(spark, sf).collect()
    val ua = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 3600000000000").as("hr"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    out.foreach { r =>
      val h = r.getLong(0)
      val want = ua.filter(t => t._2 <= h && t._2 > h - 24).map(_._1).distinct.length
      assert(r.getLong(2) == want.toLong, s"hour $h rolling mismatch")
      assert(r.getLong(3) <= 10000L && r.getLong(3) > 0L)
    }
  }

  test("cohorts: the offset-0 diagonal is the cohort itself (10000 bp), " +
    "and offsets never precede the first-active day") {
    val rows = Events.qEventsCohorts(spark, sf).collect()
    assert(rows.forall(_.getLong(1) >= 0L))
    val diag = rows.filter(_.getLong(1) == 0L)
    assert(diag.nonEmpty)
    diag.foreach { r =>
      assert(r.getLong(2) == r.getLong(3), s"cohort ${r.getLong(0)} diagonal")
      assert(r.getLong(4) == 10000L)
    }
    val nUsers = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head.getLong(0)
    assert(diag.map(_.getLong(3)).sum == nUsers)
  }

  test("seasonality: cells cover every event once and per-day shares " +
    "sum to 10000 minus floor dust") {
    val rows = Events.qEventsSeasonality(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == Tables.events(spark, sf).count())
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 7 &&
      r.getLong(1) >= 0 && r.getLong(1) < 24))
    rows.groupBy(_.getLong(0)).foreach { case (dow, cells) =>
      val bp = cells.map(_.getLong(4)).sum
      assert(bp > 10000 - cells.length && bp <= 10000, s"dow $dow shares $bp")
    }
  }

  test("weighted percentile: reduces to the unweighted form under " +
    "uniform weights, and revenue-weighting shifts medians upward") {
    import graft.queries.Relational
    val weighted = Relational.qAggPercentileWeighted(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val unweighted = Relational.qAggPercentileCounting(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // price grows with quantity, so the revenue-weighted median
    // quantity sits at or above the row-count median in every group
    weighted.foreach { case (g, m) =>
      assert(m >= unweighted(g),
        s"group $g: revenue-weighted median $m below count median ${unweighted(g)}")
    }
  }

  test("windowed funnel: bounded by the unbounded funnel's reach and " +
    "by raw purchase counts") {
    val r = Events.qEventsFunnelWindowed(spark, sf).collect().head
    val nPurch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    val nClicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(r.getLong(3) <= nPurch, "conversions cannot exceed purchases")
    assert(r.getLong(2) <= nClicks, "qualified clicks bounded by clicks")
    assert(r.getLong(1) > 0 && r.getLong(0) > 0)
  }

  test("label prop: bipartite parity (even rounds return labels to " +
    "their own side) and labels are graph node ids") {
    val rows = Graph.qGraphLabelprop(spark, sf).collect()
    assert(rows.nonEmpty)
    val nodes = rows.map(_.getLong(0)).toSet
    rows.foreach { r =>
      val (u, c) = (r.getLong(0), r.getLong(1))
      assert(nodes.contains(c), s"community $c is not a graph node")
      // customer<1e6 / supplier>=1e6; 2 propagation rounds = 2 hops,
      // so every label comes from the node's own bipartite side
      assert((u < 1000000L) == (c < 1000000L),
        s"node $u got a cross-side label $c after an even round count")
    }
  }

  test("weighted sampling: every threshold 1..k is covered by exactly " +
    "one selected document, and selection is PPS") {
    val k = 100
    val sel = Curation.qSampleWeighted(spark, sf, k).collect()
    assert(sel.nonEmpty && sel.length <= k)
    // recompute spans on the driver from the flat cumsum
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = docs.map(_._2).sum
    var cum = 0L
    val expect = docs.flatMap { case (id, w) =>
      val lo = cum * k / total; cum += w
      val hi = cum * k / total
      if (hi > lo) Some(id) else None
    }.toSet
    assert(sel.map(_.getLong(0)).toSet == expect)
    // PPS property on this corpus: mean selected weight above corpus mean
    val meanSel = sel.map(_.getLong(1)).sum.toDouble / sel.length
    val meanAll = total.toDouble / docs.length
    assert(meanSel >= meanAll * 0.9,
      s"selected mean weight $meanSel far below corpus mean $meanAll")
  }

  test("counting percentile: equals the sort-based type-1 quantile, " +
    "and the plan has no per-group sort of raw rows") {
    import graft.queries.Relational
    val out = Relational.qAggPercentileCounting(spark, sf).collect()
    // recompute type-1 quantiles from the raw rows on the driver
    val raw = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect().groupBy(_.getString(0))
    out.foreach { r =>
      val vs = raw(r.getString(0)).map(_.getLong(1)).sorted
      def q(p: Double) = vs(math.ceil(p * vs.length).toInt - 1)
      assert(r.getLong(1) == q(0.5), "median")
      assert(r.getLong(2) == q(0.9), "p90")
      assert(r.getLong(3) == q(0.25), "q1")
      assert(r.getLong(4) == vs.length.toLong)
    }
    // the windows must run over the counted (group x domain) relation:
    // the aggregate keyed on (flag, v) happens BELOW the first window
    val plan = Relational.qAggPercentileCounting(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate"), plan)
  }

  test("paths: counts respect containment (adjacent click>purchase " +
    "implies eventual-purchase paths exist) and total session parity") {
    val r = Events.qEventsPaths(spark, sf).collect().head
    val nSessions = Events.qEventsSessions(spark, sf).count()
    assert(r.getLong(0) == nSessions)
    assert(r.getLong(1) <= nSessions && r.getLong(2) <= nSessions &&
      r.getLong(3) <= nSessions)
    assert(r.getLong(1) >= 0)
  }

  test("robust anomaly: median/MAD are genuine lower medians, and a " +
    "planted burst flags under MAD but is what a stddev would absorb") {
    val rows = Events.qEventsAnomalyRobust(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val cs = rs.map(_.getLong(2)).sorted
      val med = rs.head.getLong(3)
      // lower median: rank ceil(n/2) of the sorted counts
      assert(med == cs((cs.length + 1) / 2 - 1))
      val devs = rs.map(r => math.abs(r.getLong(2) - med)).sorted
      assert(rs.head.getLong(4) == devs((devs.length + 1) / 2 - 1))
      rs.foreach { r =>
        val dev = math.abs(r.getLong(2) - r.getLong(3))
        assert(r.getBoolean(5) == (dev > 3 * r.getLong(4)))
      }
    }
  }

  test("temperature mix: probabilities sum to 1 within one ulp-fold, " +
    "and sqrt damping sits between raw and uniform") {
    val rows = Curation.qDataMixTemperature(spark, sf).collect()
    val ps = rows.map(_.getDouble(3))
    assert(math.abs(ps.sum - 1.0) < 1e-12)
    val ns = rows.map(_.getLong(1).toDouble)
    val total = ns.sum
    rows.indices.foreach { i =>
      val raw = ns(i) / total
      val uniform = 1.0 / rows.length
      val lo = math.min(raw, uniform) - 1e-12
      val hi = math.max(raw, uniform) + 1e-12
      assert(ps(i) >= lo && ps(i) <= hi,
        s"lang ${rows(i).getString(0)}: p=${ps(i)} outside [$lo,$hi]")
    }
  }

  test("moments: match Spark's built-in skewness/kurtosis to float " +
    "tolerance") {
    val out = Profiling.qProfileMoments(spark, sf).collect()
    val ref = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    out.foreach { r =>
      val (sk, ku) = ref(r.getString(0))
      assert(math.abs(r.getDouble(3) - sk) < 1e-6,
        s"${r.getString(0)}: skew ${r.getDouble(3)} vs builtin $sk")
      assert(math.abs(r.getDouble(4) - ku) < 1e-6,
        s"${r.getString(0)}: kurt ${r.getDouble(4)} vs builtin $ku")
    }
  }

  test("interval join: bucket equi-join plan (no cartesian, no " +
    "nested loop), pairs match the brute-force overlap predicate") {
    val df = Events.qJoinInterval(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a product plan:\n$plan")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // brute force at spec scale: every (session, incident) with true overlap
    val sess = graft.queries.Events.qEventsSessions(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val inc = Tables.events(spark, sf)
      .filter(col("event_type") === "error")
      .select(col("event_id"), expr("ts div 1000").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(1) + 600000000L))
    val want = (for {
      (u, sq, s0, s1) <- sess
      (e, i0, i1) <- inc
      if s0 <= i1 && i0 <= s1
    } yield (u, sq, e, math.min(s1, i1) - math.max(s0, i0))).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  test("pca power: matches a driver-side dense power iteration on the " +
    "collected covariance bit-for-bit, with a positive Rayleigh estimate") {
    import graft.queries.Similarity
    val out = Similarity.qEmbedPcaPower(spark, sf).collect()
    assert(out.length == 8)
    val lambda = out.head.getDouble(2)
    assert(lambda > 0.0, s"top eigenvalue of a covariance must be > 0: $lambda")
    // rebuild C from the oracle-green covariance query and replay the
    // same two index-ordered folds locally
    val covRows = Similarity.qEmbedCovariance(spark, sf).collect()
    val c = Array.ofDim[Double](8, 8)
    covRows.foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(3))
      c(i)(j) = v; c(j)(i) = v
    }
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(8)(i => (0 until 8).foldLeft(0.0)((a, j) => a + c(i)(j) * v(j)))
    val v1 = Array.tabulate(8)(i => (0 until 8).foldLeft(0.0)((a, j) => a + c(i)(j)))
    val v2 = matvec(v1)
    out.foreach { r =>
      assert(r.getDouble(1) == v2(r.getLong(0).toInt),
        s"loading dim ${r.getLong(0)} diverges from the local fold")
    }
  }

  test("corr: matches Spark's built-in corr to float tolerance, and the " +
    "plan is one partial+final aggregate (no extra shuffle)") {
    val out = Profiling.qProfileCorr(spark, sf)
    val r = out.collect().head
    val ref = Tables.lineitem(spark, sf)
      .select(corr(col("l_quantity"), col("l_extendedprice")).as("c1"),
        corr(col("l_quantity"), col("l_discount")).as("c2"),
        corr(col("l_extendedprice"), col("l_discount")).as("c3"))
      .collect().head
    assert(math.abs(r.getDouble(1) - ref.getDouble(0)) < 1e-6)
    assert(math.abs(r.getDouble(2) - ref.getDouble(1)) < 1e-6)
    assert(math.abs(r.getDouble(3) - ref.getDouble(2)) < 1e-6)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // AQE prints the pre-AQE plan too
    assert(!plan.contains("CartesianProduct"))
    // global agg: exactly one exchange (partial → single-partition final)
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1,
      s"expected ≤1 exchange, plan:\n$plan")
  }
}
