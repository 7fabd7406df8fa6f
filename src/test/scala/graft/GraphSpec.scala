package graft

import org.apache.spark.sql.functions._
import graft.queries.Graph

/** Semantics and scale-shape checks for the iterative graph family
  * (value-correctness of q_pagerank is oracle-gated in Verify/check). */
class GraphSpec extends SparkSpec {

  test("pagerank conserves rank mass within the teleport/rounding drift") {
    // After each iteration total mass = 0.15·n·10¹² + 0.85·(prev mass)
    // minus integer-division dust (< 1 unit per edge per round). With
    // uniform init the fixed point is n·10¹², so 3 rounds stay within
    // a fraction of a percent of it.
    val out = Graph.qPagerank(spark, sf, iters = 3)
    val rows = out.collect()
    assert(rows.length > 0)
    // every rank is at least the teleport floor and positive
    rows.foreach(r => assert(r.getLong(1) >= 150000000000L))
    // top node is a supplier (offset 10⁶): suppliers aggregate demand
    // from many customers in this bipartite graph
    assert(rows.head.getLong(0) >= 1000000L,
      s"expected a supplier on top, got node ${rows.head.getLong(0)}")
  }

  test("pagerank on a hand-computed triangle matches exact arithmetic") {
    import spark.implicits._
    // Triangle a-b, b-c: degrees a=1, b=2, c=1 (undirected).
    // r0 = 1e12 each.
    // contrib: a→b 1e12, b→a 5e11, b→c 5e11, c→b 1e12
    // r1(a) = 15e10 + 17*5e11/20 = 15e10 + 425e9 = 575e9
    // r1(b) = 15e10 + 17*2e12/20 = 15e10 + 17e11 = 1850e9
    // r1(c) = 575e9
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("u", "v")
    val deg = edges.groupBy("u").agg(count(lit(1)).as("d"))
    val r0 = deg.select(col("u"), lit(1000000000000L).as("r"))
    val r1 = edges.join(r0, "u").join(deg, "u")
      .select(col("v"), expr("r div d").as("c"))
      .groupBy("v").agg(sum(col("c")).as("sc"))
      .select(col("v").as("u"),
        (lit(150000000000L) + expr("(17 * sc) div 20")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(1L) == 575000000000L)
    assert(r1(2L) == 1850000000000L)
    assert(r1(3L) == 575000000000L)
  }

  test("pagerank plan: no cartesian product, aggregate per iteration") {
    val plan = Graph.qPagerank(spark, sf, iters = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "iterations must be equi-joins")
  }
}
