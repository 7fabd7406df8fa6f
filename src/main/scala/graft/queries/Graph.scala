package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Iterative graph analytics over relationship edges mined from the
  * relational tables — the second member (beside the connected-components
  * labeler in Dedup) of the "repeat a join-aggregate until done" family
  * that dedup graphs, citation ranking, and influence scoring all reduce
  * to at 100 TB.
  *
  * Determinism discipline: ranks are INTEGER-SCALED (initial mass 10¹²
  * per node) and every per-edge contribution is an integer division
  * (`div` in Spark, `//` in DuckDB — identical on non-negative BIGINTs),
  * so iteration sums are order-independent exact integer arithmetic and
  * the oracle hash matches bit-for-bit with no float-summation caveats.
  * The 0.85 damping factor is the exact rational 17/20 applied as
  * (17·x) div 20. Headroom: per-node rank is bounded by the total mass
  * n·10¹² (~1.6e16 at sf0.1), and 17× that stays far inside int64; for
  * corpora past ~10⁵ nodes the initial mass per node is the knob to
  * shrink (total mass, not node count, is what must stay under 2⁶³/17).
  */
object Graph {

  /** PageRank (3 iterations, damping 17/20) over the undirected
    * customer–supplier graph: an edge per (customer, supplier) pair that
    * shares at least one order. Undirected (both orientations) so every
    * node has out-degree ≥ 1 and no dangling-mass redistribution term is
    * needed. Output: top 100 nodes by rank (suppliers offset by 10⁶ to
    * disjoin the key spaces).
    *
    * Scale: edge generation is one equi-join + distinct; each iteration
    * is one join (ranks are re-keyed by the edge source — broadcastable
    * once ranks ≪ edges, AQE's call) + one groupBy on the destination —
    * O(|E|) per round, the plan that survives a billion-edge graph. The
    * edge list and per-round ranks are localCheckpoint'd to cut lineage
    * growth across iterations, exactly like the connected-components
    * loop. */
  def qPagerank(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val e0 = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast(LongType).as("u"),
        (col("l_suppkey") + lit(1000000L)).cast(LongType).as("v"))
      .distinct()
    // customers < 10⁶ ≤ suppliers, so the two orientations cannot collide
    val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    val deg = edges.groupBy("u").agg(count(lit(1)).as("d"))
    var ranks = deg.select(col("u"), lit(1000000000000L).as("r"))
    for (_ <- 1 to iters) {
      ranks = edges.join(ranks, "u").join(deg, "u")
        .select(col("v"), expr("r div d").as("c"))
        .groupBy(col("v"))
        .agg(sum(col("c")).as("sc"))
        .select(col("v").as("u"),
          (lit(150000000000L) + expr("(17 * sc) div 20")).as("r"))
        .localCheckpoint(true)
    }
    ranks.select(col("u").as("node_id"), col("r").cast(LongType).as("rank_score"))
      .orderBy(col("rank_score").desc, col("node_id"))
      .limit(100)
  }

  private val qPagerankOracle = {
    def step(prev: String, next: String) =
      s"""$next AS (
         |  SELECT e.v AS u,
         |    150000000000 + (17 * SUM(($prev.r // deg.d))) // 20 AS r
         |  FROM e JOIN $prev ON e.u = $prev.u JOIN deg ON e.u = deg.u
         |  GROUP BY e.v)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT o.o_custkey AS u, 1000000 + l.l_suppkey AS v
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       |deg AS (SELECT u, COUNT(*) AS d FROM e GROUP BY u),
       |r0 AS (SELECT u, CAST(1000000000000 AS BIGINT) AS r FROM deg),
       |${step("r0", "r1")},
       |${step("r1", "r2")},
       |${step("r2", "r3")}
       |SELECT u AS node_id, CAST(r AS BIGINT) AS rank_score
       |FROM r3 ORDER BY rank_score DESC, node_id LIMIT 100""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> ((s, d) => qPagerank(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "q_pagerank" -> qPagerankOracle
  )
}
