package graft

/** Automated plan-quality guard: no query may silently regress into a
  * non-broadcast cartesian product, and parquet scans must prune
  * columns (a scan reading every column for a narrow projection means
  * pushdown broke). Runs over the whole registry so future queries get
  * audited for free.
  */
class PlanAuditSpec extends SparkSpec {

  // these intentionally pair every row with a broadcast side
  private val broadcastNlAllowed = Set(
    "q_embed_cosine_topk", "q_ann_lsh", "q_ann_ivf", "q_dedup_embed")

  test("no query plans a non-broadcast CartesianProduct") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${plan.take(2000)}")
    }
  }

  test("Q21/Q2 decorrelate: semi/anti hash joins, aggregate-join MIN, no cartesian") {
    // Q21's EXISTS / NOT EXISTS must become left-semi / left-anti joins
    // on l_orderkey, never per-row subquery re-execution
    val p21 = graft.queries.Relational.qSqlQ21(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p21.contains("LeftSemi"), s"Q21 EXISTS not a semi join:\n${p21.take(1500)}")
    assert(p21.contains("LeftAnti"), s"Q21 NOT EXISTS not an anti join:\n${p21.take(1500)}")
    // Q2's correlated scalar MIN must decorrelate into one aggregate
    // joined back (RewriteCorrelatedScalarSubquery), with the region/
    // nation/supplier dims broadcast
    val p2 = graft.queries.Relational.qSqlQ2(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p2.contains("HashAggregate"), s"Q2 MIN not decorrelated:\n${p2.take(1500)}")
    assert(p2.contains("BroadcastHashJoin"), s"Q2 dims not broadcast:\n${p2.take(1500)}")
  }

  test("round-12 TPC-H shapes decorrelate: Q4/Q20 semi, Q22 anti, Q17 aggregate-join") {
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    // Q4's correlated EXISTS (with the non-equi shipdate conjunct) must
    // be a left-semi hash join on the order key, not per-row execution
    val p4 = plan("q_sql_q4")
    assert(p4.contains("LeftSemi"), s"Q4 EXISTS not a semi join:\n${p4.take(1500)}")
    // Q20's IN-over-aggregate is a semi join against the HAVING output
    val p20 = plan("q_sql_q20")
    assert(p20.contains("LeftSemi"), s"Q20 IN not a semi join:\n${p20.take(1500)}")
    // Q22's NOT EXISTS is an anti join; the scalar mean is a subquery,
    // not a per-row rescan
    val p22 = plan("q_sql_q22")
    assert(p22.contains("LeftAnti"), s"Q22 NOT EXISTS not an anti join:\n${p22.take(1500)}")
    // Q17's correlated scalar AVG decorrelates to ONE aggregate over
    // lineitem joined back on partkey (no re-execution per part)
    val p17 = plan("q_sql_q17")
    assert(p17.contains("HashAggregate"), s"Q17 AVG not decorrelated:\n${p17.take(1500)}")
    assert(!p17.contains("CartesianProduct"))
  }

  test("round-12 second-wave queries keep their declared plan shapes") {
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    // triangles: witnesses come from array_intersect inside the
    // projection over the checkpointed adjacency — the wedge population
    // must not ride a join of the edge list with itself
    val tri = plan("q_graph_triangles")
    assert(tri.contains("array_intersect"), s"triangles lost the edge-iterator:\n${tri.take(1000)}")
    assert(!tri.contains("SortMergeJoin"), "triangles should broadcast the node-sized adjacency at sf scale")
    // blocklist: the OR-match over the tiny policy list is a BROADCAST
    // nested loop (broadcast side = the 3-entry list), never a cartesian
    val bl = plan("q_curation_blocklist")
    assert(bl.contains("BroadcastNestedLoopJoin"), s"blocklist join shape:\n${bl.take(1000)}")
    // temporal: a hash join on the user key with the interval condition
    // riding the join — no nested loop over versions
    val tj = plan("q_join_temporal")
    assert(!tj.contains("BroadcastNestedLoopJoin") && !tj.contains("CartesianProduct"),
      s"temporal join degenerated:\n${tj.take(1000)}")
    // drift: one aggregation pass + broadcast totals, no Window node
    val dr = plan("q_profile_drift")
    assert(!dr.contains("Window"), s"drift should not need a window:\n${dr.take(1000)}")
  }

  test("NOT IN over a nullable list plans the null-AWARE anti join") {
    // a plain LeftAnti would be wrong the moment the probe list held a
    // real NULL; Spark's executed plan must carry the
    // isNullAwareAntiJoin flag on the broadcast hash join
    // AdaptiveSparkPlanExec is a leaf for collect(), so pin the flag on
    // the rendered plan: BroadcastHashJoinExec prints isNullAwareAntiJoin
    // as the trailing boolean after the build side
    val plan = SparkEntry.queries("q_join_null_aware_anti")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"NOT IN did not plan a null-aware anti join:\n${plan.take(1500)}")
  }

  test("narrow projections prune parquet scan columns") {
    // q_scan_project reads 5 of lineitem's 11 columns + nothing else
    val plan = graft.queries.Relational.qScanProject(spark, sf)
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      s"scan not pruned: $readSchema")
    // q_join_multiway's lineitem scan carries only 3 columns
    val plan2 = graft.queries.Relational.qJoinMultiway(spark, sf)
      .queryExecution.executedPlan.toString
    val li = "ReadSchema: [^\n]*l_extendedprice[^\n]*".r.findFirstIn(plan2).getOrElse("")
    assert(li.nonEmpty && !li.contains("l_shipdate") && !li.contains("l_quantity"),
      s"multiway lineitem scan not pruned: $li")
  }

  test("skew join broadcasts the replicated dim and keeps the salt out of the scan") {
    val plan = graft.queries.Extensions.qSkewJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"salted dim should broadcast at this size:\n${plan.take(1200)}")
    // lineitem scan reads only the join/agg/salt-source columns
    val li = "ReadSchema: [^\n]*l_suppkey[^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(li.nonEmpty && !li.contains("l_extendedprice"),
      s"lineitem scan not pruned: $li")
  }

  test("quality filter is one window shuffle over a pruned scan") {
    val plan = graft.queries.TextAnalysis.qQualityFilter(spark, sf)
      .queryExecution.executedPlan.toString
    // the only wide ops: the dedup window and the final orderBy
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)".r
      .findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 exchanges (window + sort), got $exchanges:\n${plan.take(1500)}")
    val rs = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(!rs.contains("n_chars"), s"documents scan not pruned: $rs")
  }

  test("curation queries keep their declared shuffle budgets") {
    def exchanges(plan: String): Int =
      "Exchange (hashpartitioning|rangepartitioning)".r.findAllIn(plan).length
    // pii scrub is pure map-side + the output sort
    val pii = graft.queries.Curation.qPiiScrub(spark, sf)
      .queryExecution.executedPlan.toString
    assert(exchanges(pii) <= 1, s"q_pii_scrub grew a shuffle:\n${pii.take(1200)}")
    // data mix / context pack: one per-source window + the output sort
    Seq(graft.queries.Curation.qDataMix(spark, sf),
      graft.queries.Curation.qContextPack(spark, sf)).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(exchanges(p) <= 2, s"window query exceeded 2 exchanges:\n${p.take(1200)}")
    }
    // doc repetition: (doc,word) agg + (doc) agg + sort
    val rep = graft.queries.Curation.qDocRepetition(spark, sf)
      .queryExecution.executedPlan.toString
    assert(exchanges(rep) <= 3, s"q_doc_repetition exceeded 3 exchanges:\n${rep.take(1200)}")
  }

  test("round-5 queries keep their declared plan shapes") {
    // the dimension-scaffold cross join broadcasts (never a shuffled cartesian)
    val cross = graft.queries.Relational.qJoinCross(spark, sf)
      .queryExecution.executedPlan.toString
    assert(cross.contains("BroadcastNestedLoopJoin"),
      s"q_join_cross should broadcast its tiny side:\n${cross.take(1200)}")
    // tfidf's corpus-size scalar arrives via a broadcast 1-row aggregate
    val tfidf = graft.queries.TextAnalysis.qTfidf(spark, sf)
      .queryExecution.executedPlan.toString
    assert(tfidf.contains("BroadcastNestedLoopJoin") || tfidf.contains("BroadcastExchange"),
      s"q_tfidf should broadcast the n_docs scalar:\n${tfidf.take(1200)}")
    // hash sampling is pure map-side: no hash-shuffle at all, just the output sort
    val samp = graft.queries.Curation.qSampleHash(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!"Exchange hashpartitioning".r.findFirstIn(samp).isDefined,
      s"q_sample_hash grew a shuffle:\n${samp.take(1200)}")
    // centroid aggregation combines map-side: one hash shuffle on (label,pos) + sort
    val cent = graft.queries.Similarity.qEmbedCentroid(spark, sf)
      .queryExecution.executedPlan.toString
    val centEx = "Exchange hashpartitioning".r.findAllIn(cent).length
    assert(centEx <= 1, s"q_embed_centroid exceeded 1 hash exchange:\n${cent.take(1200)}")
  }

  test("round-6 queries keep their declared plan shapes") {
    def hashEx(plan: String): Int =
      "Exchange hashpartitioning".r.findAllIn(plan).length
    // SCD2: lag + running-sum + island-agg + lead all share the user_id
    // partitioning — ONE hash exchange plus the output sort
    val scd2 = graft.queries.Events.qScd2Build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(hashEx(scd2) <= 2, s"q_scd2_build exceeded 2 hash exchanges:\n${scd2.take(1500)}")
    // stratified sample and holdout split: map-side trial + one manifest agg
    Seq(graft.queries.Curation.qSampleStratified(spark, sf),
      graft.queries.Curation.qSplitHoldout(spark, sf)).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(hashEx(p) <= 1, s"manifest query grew a shuffle:\n${p.take(1200)}")
    }
    // Q5's region→nation→supplier dim chain broadcasts; only the
    // customer⋈orders⋈lineitem spine may shuffle
    val q5 = graft.queries.Relational.qSqlQ5(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(q5).length >= 2,
      s"q_sql_q5 must broadcast its dim chain:\n${q5.take(1500)}")
    assert(!q5.contains("CartesianProduct"))
    // ngram counts: explode + partial/final count + Expand for the doc
    // frequency, topped by TakeOrderedAndProject (never a global sort)
    val ng = graft.queries.TextAnalysis.qNgramCounts(spark, sf)
      .queryExecution.executedPlan.toString
    assert(ng.contains("TakeOrderedAndProject"),
      s"q_ngram_counts top-k must be TakeOrderedAndProject:\n${ng.take(1200)}")
  }

  test("filters push down to the parquet scan") {
    val plan = graft.queries.Relational.qFilterPred(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThanOrEqual(o_totalprice"),
      s"filter not pushed:\n${plan.take(1500)}")
  }

  test("runtime bloom filter injects on a selectively-filtered shuffle join") {
    // The 1000-executor lever the AQE skew evidence doesn't cover: a
    // selective dim-side filter should seed a bloom filter that prunes
    // the fact side's shuffle AT THE SCAN — Spark's InjectRuntimeFilter
    // rule. Broadcast joins don't need it (the hash table IS the
    // filter), so force the shuffle-join regime the rule exists for and
    // drop the size thresholds to sf scale.
    import org.apache.spark.sql.functions._
    withSQLConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // default 10GB — the "is the fact side big enough to be worth
      // filtering" gate, scaled down to the sf corpus
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.lineitem(spark, sf)
      val ord = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n${optimized.take(2000)}")
      // and the result is unaffected by the filter's pruning
      assert(joined.collect().head.getLong(1) > 0)
    }
  }
}
