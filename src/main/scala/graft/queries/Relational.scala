package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables
import graft.queries.QueryUtil._

/** Relational query inventory (SURVEY.md §2.D): scans, filters, joins,
  * aggregations, windows, sorts, set ops — each declared with the
  * DataFrame API so Catalyst owns the physical strategy (partial
  * aggregation, join selection, pushdown, AQE). Every query ends in a
  * total ORDER BY on a unique key set so the driver's ordered hash
  * compare is deterministic; every float aggregate uses the exact-decimal
  * discipline from [[QueryUtil]].
  *
  * Scale notes (100 TB): small dimensions (region/nation/customer at
  * dim-scale) are broadcast explicitly; fact-fact joins shuffle on their
  * keys and AQE handles skew; aggregations are partial+final (map-side
  * combine) by construction.
  */
object Relational {

  // ── scan / project ────────────────────────────────────────────────

  /** Projection + arithmetic; pushes a 6-column ReadSchema to parquet. */
  def qScanProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"),
        discPrice(col("l_extendedprice"), col("l_discount")).as("disc_price"))

  private val qScanProjectOracle =
    s"""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
       |  ${discPriceSql("l_extendedprice", "l_discount")} AS disc_price
       |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** AND/OR/IN/BETWEEN/LIKE predicate mix; all pushable to the scan. */
  def qFilterPred(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_totalprice").between(1000.0, 200000.0) &&
        col("o_orderstatus").isin("O", "F") &&
        (col("o_orderpriority").like("1-%") || col("o_orderpriority").like("2-%")) &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority")
      .orderBy("o_orderkey")

  private val qFilterPredOracle =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, o_orderpriority
      |FROM orders
      |WHERE o_totalprice BETWEEN 1000.0 AND 200000.0
      |  AND o_orderstatus IN ('O','F')
      |  AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |ORDER BY o_orderkey""".stripMargin

  // ── aggregation family ────────────────────────────────────────────

  /** TPC-H Q1-like pricing summary: one hash aggregate, map-side partial. */
  def qAggGroup(s: SparkSession, dir: String): DataFrame = {
    val price = col("l_extendedprice")
    val disc = col("l_discount")
    val tax = col("l_tax")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumDisc(price, disc).as("sum_disc_price"),
        dsumDiscTax(price, disc, tax).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val qAggGroupOracle = {
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumDiscSql("l_extendedprice", "l_discount")} AS sum_disc_price,
       |  ${dsumDiscTaxSql("l_extendedprice", "l_discount", "l_tax")} AS sum_charge,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_extendedprice")} AS avg_price,
       |  ${davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  /** Distinct counts per group (expands to a two-phase aggregate). */
  def qAggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderstatus")).as("n_statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  private val qAggDistinctOracle =
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(DISTINCT o_orderstatus) AS n_statuses,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Rollup over (returnflag, linestatus); subtotal rows keyed '(all)'. */
  def qAggRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy(col("rf"), col("ls"))

  private val qAggRollupOracle =
    s"""SELECT COALESCE(l_returnflag, '(all)') AS rf,
       |  COALESCE(l_linestatus, '(all)') AS ls,
       |  ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY rf, ls""".stripMargin

  /** Cube over (orderstatus, orderpriority). */
  def qAggCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("st"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("pri"),
        col("sum_price"), col("n"))
      .orderBy(col("st"), col("pri"))

  private val qAggCubeOracle =
    s"""SELECT COALESCE(o_orderstatus, '(all)') AS st,
       |  COALESCE(o_orderpriority, '(all)') AS pri,
       |  ${dsumSql("o_totalprice")} AS sum_price, COUNT(*) AS n
       |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY st, pri""".stripMargin

  /** Statistical moments without float-order nondeterminism: stddev and
    * correlation computed from EXACT decimal power sums (Sx, Sxx, Sxy),
    * combined in double by the closed-form formulas — the distributed
    * merge order can't perturb an exact sum, so both engines agree
    * bit-for-bit. (Built-in stddev/corr use Welford-style merges whose
    * float error depends on partitioning — unusable for hash compare.) */
  def qAggStats(s: SparkSession, dir: String): DataFrame = {
    // integer-cents power sums: the per-row squares are LONG products
    // (a decimal q*q would BigDecimal-multiply every row — QueryUtil),
    // the sums are exact integers, the closed forms then run in double
    val cq = cents(col("l_quantity"))
    val cp = cents(col("l_extendedprice"))
    // decimal(20,0) input → (30,0) buffer: compact adds (QueryUtil.isum)
    def isumD(c: Column) = sum(c.cast(DecimalType(20, 0))).cast(DoubleType)
    val n = count(lit(1)).cast(DoubleType)
    val sq = isumD(cq) / 100.0
    val sp = isumD(cp) / 100.0
    val sqq = isumD(cq * cq) / 10000.0
    val spp = isumD(cp * cp) / 10000.0
    val sqp = isumD(cq * cp) / 10000.0
    val varQ = (sqq - sq * sq / n) / (n - 1)
    val varP = (spp - sp * sp / n) / (n - 1)
    val covQP = (sqp - sq * sp / n) / (n - 1)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(sqrt(varQ), 6).as("stddev_qty"),
        round(sqrt(varP), 4).as("stddev_price"),
        round(covQP / (sqrt(varQ) * sqrt(varP)), 6).as("corr_qty_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  private val qAggStatsOracle = {
    val cq = centsSql("l_quantity")
    val cp = centsSql("l_extendedprice")
    val n = "CAST(COUNT(*) AS DOUBLE)"
    val sq = s"(CAST(SUM($cq) AS DOUBLE) / 100.0)"
    val sp = s"(CAST(SUM($cp) AS DOUBLE) / 100.0)"
    val sqq = s"(CAST(SUM($cq * $cq) AS DOUBLE) / 10000.0)"
    val spp = s"(CAST(SUM($cp * $cp) AS DOUBLE) / 10000.0)"
    val sqp = s"(CAST(SUM($cq * $cp) AS DOUBLE) / 10000.0)"
    val varQ = s"(($sqq - $sq * $sq / $n) / ($n - 1))"
    val varP = s"(($spp - $sp * $sp / $n) / ($n - 1))"
    val covQP = s"(($sqp - $sq * $sp / $n) / ($n - 1))"
    s"""SELECT l_returnflag,
       |  round(sqrt($varQ), 6) AS stddev_qty,
       |  round(sqrt($varP), 4) AS stddev_price,
       |  round($covQP / (sqrt($varQ) * sqrt($varP)), 6) AS corr_qty_price,
       |  COUNT(*) AS n
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  /** Exact percentiles (type-7 linear interpolation — Spark `percentile`
    * and DuckDB `quantile_cont` produce bit-identical doubles). Exact
    * percentile sorts within each group; at 100 TB prefer
    * approx_percentile (t-digest) — exact is the verification form. */
  def qAggPercentile(s: SparkSession, dir: String): DataFrame =
    // round-20 optimization: the two l_extendedprice percentiles ride
    // ONE percentile(..., array(0.5, 0.9)) aggregate — one value-count
    // buffer + one per-group sort instead of two (guide §1.2 "per-task
    // work"). Spark's Percentile evaluates each requested fraction from
    // the same counts with the same type-7 interpolation, so the output
    // doubles are bit-identical to the separate-agg form and the DuckDB
    // oracle is unmoved.
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("_pp"),
        expr("percentile(l_quantity, 0.25)").as("q1_qty"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        col("_pp").getItem(0).as("median_price"),
        col("_pp").getItem(1).as("p90_price"),
        col("q1_qty"), col("n"))
      .orderBy("l_returnflag")

  private val qAggPercentileOracle =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.5) AS median_price,
      |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
      |  quantile_cont(l_quantity, 0.25) AS q1_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** The THIRD percentile form — EXACT at scale when the value domain
    * is bounded (integral quantities here, any enum/band/bucketed
    * measure in general): count occurrences per (group, value), prefix-
    * sum the counts in value order, and select the smallest value whose
    * cumulative count reaches ⌈p·n⌉ — the lower (type-1/inverted-CDF)
    * quantile, no interpolation. Completes the family: q_agg_percentile
    * is the exact-sort verification form, q_agg_percentile_approx the
    * sketch for unbounded domains, and THIS is exact AND scalable for
    * bounded domains — a combine-friendly count aggregation plus
    * windows over the (groups × domain)-sized count relation; the raw
    * corpus is touched exactly once, nothing per-group is sorted.
    *
    * Everything is integer arithmetic (counts, ⌈p·n⌉ as (n+k-1) div k
    * for p = j/k), so the oracle hash has no float surface at all. */
  def qAggPercentileCounting(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_quantity").cast(LongType).as("v"))
      .agg(count(lit(1)).as("c"))
    val byG = Window.partitionBy(col("l_returnflag"))
    val cum = sum(col("c")).over(byG.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0))
    val n = sum(col("c")).over(byG)
    def pick(numer: Int, denom: Int): Column =
      min(when(col("cum") * denom >= col("n") * numer, col("v"))).over(byG)
    counts
      .withColumn("cum", cum).withColumn("n", n)
      .select(col("l_returnflag"),
        pick(1, 2).as("median_qty"),
        pick(9, 10).as("p90_qty"),
        pick(1, 4).as("q1_qty"),
        col("n").cast(LongType).as("n"))
      .distinct()
      .orderBy("l_returnflag")
  }

  private val qAggPercentileCountingOracle =
    """WITH counts AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT l_returnflag, v, c,
      |    SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(c) OVER (PARTITION BY l_returnflag) AS n
      |  FROM counts)
      |SELECT DISTINCT l_returnflag,
      |  MIN(CASE WHEN cum * 2 >= n * 1 THEN v END)
      |    OVER (PARTITION BY l_returnflag) AS median_qty,
      |  MIN(CASE WHEN cum * 10 >= n * 9 THEN v END)
      |    OVER (PARTITION BY l_returnflag) AS p90_qty,
      |  MIN(CASE WHEN cum * 4 >= n * 1 THEN v END)
      |    OVER (PARTITION BY l_returnflag) AS q1_qty,
      |  CAST(n AS BIGINT) AS n
      |FROM cum ORDER BY l_returnflag""".stripMargin

  /** WEIGHTED percentiles via the same counting identity — each value
    * weighted by its revenue (integer cents), so "the median quantity
    * by money moved" rather than by row count: the fairness/exposure
    * quantile shape. Identical scale story to the unweighted form
    * (one combine-friendly weight-sum per (group, value), windows over
    * the domain-sized relation), and still pure integers: the
    * threshold test is `cumW·k ≥ W·j` with the weight sums exact
    * decimal cast to long (corpus headroom documented at the dsum
    * site). */
  def qAggPercentileWeighted(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_quantity").cast(LongType).as("v"))
      .agg(sum(QueryUtil.cents(col("l_extendedprice"))
        .cast(org.apache.spark.sql.types.DecimalType(20, 0)))
        .cast(LongType).as("w"))
    val byG = Window.partitionBy(col("l_returnflag"))
    val cum = sum(col("w")).over(byG.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0))
    val tot = sum(col("w")).over(byG)
    def pick(numer: Int, denom: Int): Column =
      min(when(col("cum") * denom >= col("tot") * numer, col("v"))).over(byG)
    counts
      .withColumn("cum", cum).withColumn("tot", tot)
      .select(col("l_returnflag"),
        pick(1, 2).as("median_qty_by_revenue"),
        pick(9, 10).as("p90_qty_by_revenue"),
        col("tot").cast(LongType).as("total_weight_cents"))
      .distinct()
      .orderBy("l_returnflag")
  }

  private val qAggPercentileWeightedOracle =
    s"""WITH counts AS (
       |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v,
       |    CAST(SUM(CAST(${QueryUtil.centsSql("l_extendedprice")}
       |      AS DECIMAL(20,0))) AS BIGINT) AS w
       |  FROM lineitem GROUP BY 1, 2),
       |cum AS (
       |  SELECT l_returnflag, v, w,
       |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(w) OVER (PARTITION BY l_returnflag) AS tot
       |  FROM counts)
       |SELECT DISTINCT l_returnflag,
       |  MIN(CASE WHEN cum * 2 >= tot * 1 THEN v END)
       |    OVER (PARTITION BY l_returnflag) AS median_qty_by_revenue,
       |  MIN(CASE WHEN cum * 10 >= tot * 9 THEN v END)
       |    OVER (PARTITION BY l_returnflag) AS p90_qty_by_revenue,
       |  CAST(tot AS BIGINT) AS total_weight_cents
       |FROM cum ORDER BY l_returnflag""".stripMargin

  /** The at-scale twin of [[qAggPercentile]]: approx_percentile's
    * Greenwald-Khanna sketch merges map-side (mergeable summary ⇒ one
    * partial+final aggregation, no per-group sort), with rank error
    * ≤ 1/accuracy. No oracle (sketch internals are engine-specific);
    * RelationalSpec bounds it against the exact form. */
  def qAggPercentileApprox(s: SparkSession, dir: String): DataFrame =
    // one GK sketch per (group, column), both price fractions read from
    // the same digest (round 21, guide §1.2 per-task work): two separate
    // approx_percentile calls over l_extendedprice built two identical
    // digests per group; the array form builds one and queries both
    // ranks — same insertion order, same accuracy, identical values
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D), 1000)").as("_pp"),
        expr("approx_percentile(l_quantity, 0.25, 1000)").as("q1_qty"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("_pp")(0).as("median_price"),
        col("_pp")(1).as("p90_price"), col("q1_qty"), col("n"))
      .orderBy("l_returnflag")

  /** The registry form of [[qAggPercentileApprox]], oracle-GATED
    * (round-13): the Greenwald–Khanna sketch's published contract —
    * the returned value's exact rank is within n/accuracy of the
    * target rank p·n — is checked EXACTLY inside the query. One extra
    * counting aggregation joins the fact against the broadcast ≤|groups|
    * sketch row and counts, per group, how many values fall strictly
    * below / at-or-below each returned quantile; the ok flags then
    * assert the rank interval `[below+1, at_or_below]` intersects
    * `[p·n − n/acc − 1, p·n + n/acc + 1]`, all in exact integer
    * arithmetic (common denominator 20, scaled by the accuracy — no
    * floats in the decision). The DuckDB oracle is the all-ones
    * relation with exact group counts, so the hash gate passes iff
    * every sketch answer honors its rank bound: a sketch regression
    * produces a 0 flag and FAILS the entry, which is what moves this
    * from `no_oracle`-by-contract to driver-gated (the heavy-hitters
    * guard move). At 100 TB the sketch alone ([[qAggPercentileApprox]])
    * is the production form — mergeable summaries, one partial+final
    * aggregation; this gated twin adds one combine-friendly counting
    * pass and is what a nightly validation run executes. */
  def qAggPercentileApproxGated(s: SparkSession, dir: String): DataFrame = {
    val acc = 1000L
    val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
      col("l_extendedprice"), col("l_quantity"))
    // one price digest queried at both fractions (see
    // qAggPercentileApprox's round-21 note) — identical values, half
    // the sketch build work on the widest aggregate of the entry
    val appx = li.groupBy(col("l_returnflag"))
      .agg(expr(s"approx_percentile(l_extendedprice, array(0.5D, 0.9D), $acc)").as("_vp"),
        expr(s"approx_percentile(l_quantity, 0.25, $acc)").as("vq"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("_vp")(0).as("vm"),
        col("_vp")(1).as("vp"), col("vq"), col("n"))
    val counts = li.join(broadcast(appx), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_extendedprice") < col("vm"), 1L).otherwise(0L)).as("bm"),
        sum(when(col("l_extendedprice") <= col("vm"), 1L).otherwise(0L)).as("am"),
        sum(when(col("l_extendedprice") < col("vp"), 1L).otherwise(0L)).as("bp"),
        sum(when(col("l_extendedprice") <= col("vp"), 1L).otherwise(0L)).as("ap"),
        sum(when(col("l_quantity") < col("vq"), 1L).otherwise(0L)).as("bq"),
        sum(when(col("l_quantity") <= col("vq"), 1L).otherwise(0L)).as("aq"),
        first(col("n")).as("n"))
    def ok(below: Column, atOrBelow: Column, pNum20: Long): Column =
      rankOk(below, atOrBelow, col("n"), pNum20, acc)
    counts.select(col("l_returnflag"),
      ok(col("bm"), col("am"), 10L).as("ok_median"),
      ok(col("bp"), col("ap"), 18L).as("ok_p90"),
      ok(col("bq"), col("aq"), 5L).as("ok_q1"),
      col("n"))
      .orderBy("l_returnflag")
  }

  /** Rank-interval vs target-interval intersection for the
    * approx-percentile gate, ×(20·acc) exact integer arithmetic:
    * 1 iff `[below+1, atOrBelow]` intersects
    * `[n·p − n/acc − 1, n·p + n/acc + 1]`, where p = pNum20/20.
    * Package-private so the spec can assert both the accept and the
    * REJECT side with planted counts. */
  private[graft] def rankOk(below: Column, atOrBelow: Column, n: Column,
      pNum20: Long, acc: Long): Column = {
    val d = 20L * acc
    val target = n * pNum20 * acc
    val slack = n * 20L + d
    when((below + 1L) * d <= target + slack &&
      atOrBelow * d >= target - slack, 1L).otherwise(0L)
  }

  private val qAggPercentileApproxGatedOracle =
    """SELECT l_returnflag,
      |  CAST(1 AS BIGINT) AS ok_median,
      |  CAST(1 AS BIGINT) AS ok_p90,
      |  CAST(1 AS BIGINT) AS ok_q1,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Explicit grouping sets: by flag, by status, and grand total. */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("sum_price"), col("n"))
      .orderBy(col("rf"), col("ls"))

  private val qGroupingSetsOracle =
    s"""SELECT COALESCE(l_returnflag, '(all)') AS rf,
       |  COALESCE(l_linestatus, '(all)') AS ls,
       |  ${dsumSql("l_extendedprice")} AS sum_price, COUNT(*) AS n
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
       |ORDER BY rf, ls""".stripMargin

  /** The GROUPING()/grouping_id() surface: distinguishes a real NULL
    * group key from a rollup ALL row — the disambiguation every
    * warehouse report needs once group columns are nullable (COALESCE
    * labeling, as in q_grouping_sets, silently conflates the two).
    * Same partial+final aggregate as any rollup; the grouping id is
    * computed from the grouping-set bitmask, no extra pass. */
  def qGroupingId(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast(LongType).as("g_st"),
        grouping(col("o_orderpriority")).cast(LongType).as("g_pri"),
        grouping_id(col("o_orderstatus"), col("o_orderpriority"))
          .cast(LongType).as("gid"),
        dsum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("-")).as("st"),
        coalesce(col("o_orderpriority"), lit("-")).as("pri"),
        col("g_st"), col("g_pri"), col("gid"), col("sum_price"), col("n"))
      .orderBy(col("gid"), col("st"), col("pri"))

  private val qGroupingIdOracle =
    s"""SELECT COALESCE(o_orderstatus, '-') AS st,
       |  COALESCE(o_orderpriority, '-') AS pri,
       |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
       |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
       |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       |  ${dsumSql("o_totalprice")} AS sum_price, COUNT(*) AS n
       |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
       |ORDER BY gid, st, pri""".stripMargin

  // ── join family ───────────────────────────────────────────────────

  /** orders ⋈ customer, revenue per market segment. At scale: customer
    * shuffles on custkey with orders (both fact-sized) — Catalyst picks
    * sort-merge; AQE converts to broadcast when the filtered side fits. */
  def qJoinInner(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))

  private val qJoinInnerOracle =
    s"""SELECT c_mktsegment, ${dsumSql("o_totalprice")} AS revenue, COUNT(*) AS n_orders
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** customer LEFT JOIN orders: non-matches keep the customer row. */
  def qJoinLeft(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey"))

  private val qJoinLeftOracle =
    s"""SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders,
       |  COALESCE(${dsumSql("o_totalprice")}, 0.0) AS total_spent
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin

  /** Customers with ≥1 order — LEFT SEMI (EXISTS): no row multiplication,
    * right side reduced to its join key before the probe. */
  def qJoinSemi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  private val qJoinSemiOracle =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Customers with no recent orders — LEFT ANTI (NOT EXISTS). The date
    * filter keeps the result non-degenerate (every customer has SOME
    * order) and pushes down below the join. */
  def qJoinAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  private val qJoinAntiOracle =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderdate >= TIMESTAMP '2000-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** FULL OUTER join: recent big spenders vs the premium-segment
    * customer list — each side keeps its exclusives with nulls on the
    * other. (Full outer can't broadcast either side; it shuffles both —
    * the correct plan at any scale.) */
  def qJoinFull(s: SparkSession, dir: String): DataFrame = {
    val spenders = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 250000.0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big_orders"))
    val premium = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 8000.0)
      .select(col("c_custkey"), col("c_mktsegment"))
    spenders.join(premium, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        coalesce(col("n_big_orders"), lit(0L)).as("n_big_orders"),
        coalesce(col("c_mktsegment"), lit("(none)")).as("segment"))
      .orderBy("custkey")
  }

  private val qJoinFullOracle =
    """SELECT COALESCE(o_custkey, c_custkey) AS custkey,
      |  COALESCE(n_big_orders, 0) AS n_big_orders,
      |  COALESCE(c_mktsegment, '(none)') AS segment
      |FROM (SELECT o_custkey, COUNT(*) AS n_big_orders FROM orders
      |      WHERE o_totalprice > 250000.0 GROUP BY o_custkey) s
      |FULL JOIN (SELECT c_custkey, c_mktsegment FROM customer
      |           WHERE c_acctbal > 8000.0) p
      |  ON o_custkey = c_custkey
      |ORDER BY custkey""".stripMargin

  /** TPC-H Q5-like 5-way join. region/nation are broadcast explicitly
    * (dim tables stay tiny at any fact scale); customer⋈orders⋈lineitem
    * shuffle on their keys. */
  def qJoinMultiway(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsumDisc(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val qJoinMultiwayOracle = {
    s"""SELECT r_name, n_name,
       |  ${dsumDiscSql("l_extendedprice", "l_discount")} AS revenue, COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin
  }

  /** TPC-H Q3-like shipping-priority query authored in SQL — the
    * spark.sql surface over registered views compiles to the same
    * Catalyst plan as the DataFrame API (join reorder, pushdown, partial
    * aggregation all apply). Revenue uses the exact-decimal discipline.
    */
  def qSqlQ3(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
    s.sql(
      s"""SELECT l_orderkey,
        |  ${dsumDiscSql("l_extendedprice", "l_discount")} AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin)
  }

  private val qSqlQ3Oracle =
    s"""SELECT l_orderkey,
      |  ${dsumDiscSql("l_extendedprice", "l_discount")} AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-like local-supplier volume: the SIX-table join with the
    * classic non-tree constraint c_nationkey = s_nationkey (the customer
    * and the supplier of each line item must share a nation) — the query
    * optimizer's join-reorder stress test. Catalyst broadcasts the three
    * dim tables (region→nation→supplier chain collapses to a broadcast
    * filter on the fact scan) and shuffles only customer⋈orders⋈lineitem;
    * revenue is the integer-cents kernel, so the 5-nation rollup is
    * exact at any parallelism. */
  def qSqlQ5(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("q5_customer")
    Tables.orders(s, dir).createOrReplaceTempView("q5_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("q5_lineitem")
    Tables.supplier(s, dir).createOrReplaceTempView("q5_supplier")
    Tables.nation(s, dir).createOrReplaceTempView("q5_nation")
    Tables.region(s, dir).createOrReplaceTempView("q5_region")
    s.sql(
      s"""SELECT n_name,
        |  ${dsumDiscSql("l_extendedprice", "l_discount")} AS revenue,
        |  COUNT(*) AS n_items
        |FROM q5_customer
        |JOIN q5_orders ON c_custkey = o_custkey
        |JOIN q5_lineitem ON l_orderkey = o_orderkey
        |JOIN q5_supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN q5_nation ON s_nationkey = n_nationkey
        |JOIN q5_region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)
  }

  private val qSqlQ5Oracle =
    s"""SELECT n_name,
      |  ${dsumDiscSql("l_extendedprice", "l_discount")} AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Correlated scalar subquery — Catalyst decorrelates it into a left
    * outer aggregate join (no per-row re-execution; the same plan shape
    * at any scale). */
  def qSubqueryScalar(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer_sq")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders_sq")
    s.sql(
      """SELECT c_custkey, c_mktsegment,
        |  (SELECT MAX(o_totalprice) FROM v_orders_sq WHERE o_custkey = c_custkey) AS max_order,
        |  (SELECT COUNT(*) FROM v_orders_sq WHERE o_custkey = c_custkey
        |     AND o_orderpriority LIKE '1-%') AS n_urgent
        |FROM v_customer_sq
        |ORDER BY c_custkey""".stripMargin)
  }

  private val qSubqueryScalarOracle =
    """SELECT c_custkey, c_mktsegment,
      |  (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order,
      |  (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey
      |     AND o_orderpriority LIKE '1-%') AS n_urgent
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** TPC-H Q10-like returned-items report: revenue lost to returns per
    * customer over a quarter, top 20. The canonical 4-way star join +
    * aggregate + top-k: dims broadcast, the orders⋈lineitem shuffle
    * carries only the date/flag-filtered rows (both predicates push to
    * the scans), and the final top-k is TakeOrderedAndProject — no
    * global sort. Exact-decimal revenue; c_custkey breaks ties. */
  def qSqlQ10(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("q10_customer")
    Tables.orders(s, dir).createOrReplaceTempView("q10_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("q10_lineitem")
    Tables.nation(s, dir).createOrReplaceTempView("q10_nation")
    s.sql(
      s"""SELECT c_custkey, c_name,
        |  ${dsumDiscSql("l_extendedprice", "l_discount")} AS revenue,
        |  c_acctbal, n_name, COUNT(*) AS n_items
        |FROM q10_customer
        |JOIN q10_orders ON c_custkey = o_custkey
        |JOIN q10_lineitem ON l_orderkey = o_orderkey
        |JOIN q10_nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin)
  }

  private val qSqlQ10Oracle =
    s"""SELECT c_custkey, c_name,
      |  ${dsumDiscSql("l_extendedprice", "l_discount")} AS revenue,
      |  c_acctbal, n_name, COUNT(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Correlated scalar subqueries in the WHERE clause: orders strictly
    * above their own customer's average order value. The comparison is
    * phrased multiplicatively (`price_cents * n > sum_cents`) so
    * everything stays in exact integer arithmetic — no double average
    * whose rounding could disagree between engines at the boundary, and
    * no per-row decimal multiply (QueryUtil).
    *
    * Scale: Catalyst decorrelates both subqueries into ONE per-customer
    * aggregate joined back to orders (RewriteCorrelatedScalarSubquery) —
    * no per-row re-execution; the plan is the same aggregate-join shape
    * at any corpus size. */
  def qSubqueryCorrelated(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("v_orders_corr")
    s.sql(
      s"""SELECT o_custkey, o_orderkey, o_totalprice
        |FROM v_orders_corr o
        |WHERE ${centsSql("o_totalprice")} *
        |    (SELECT COUNT(*) FROM v_orders_corr i
        |     WHERE i.o_custkey = o.o_custkey)
        |  > (SELECT SUM(${centsSql("o_totalprice")})
        |     FROM v_orders_corr i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  private val qSubqueryCorrelatedOracle =
    s"""SELECT o_custkey, o_orderkey, o_totalprice
      |FROM orders o
      |WHERE ${centsSql("o_totalprice")} *
      |    (SELECT COUNT(*) FROM orders i
      |     WHERE i.o_custkey = o.o_custkey)
      |  > (SELECT SUM(${centsSql("o_totalprice")})
      |     FROM orders i WHERE i.o_custkey = o.o_custkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** TPC-H Q18-like large-volume-customer report: orders whose total
    * line quantity exceeds a threshold, found via IN over an
    * AGGREGATED subquery — Catalyst turns the IN into a left-semi join
    * against the HAVING-filtered aggregate (no correlated
    * re-execution). Exact-decimal quantity sums on both sides. */
  def qSqlQ18(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("q18_customer")
    Tables.orders(s, dir).createOrReplaceTempView("q18_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("q18_lineitem")
    // integer-cents sums (QueryUtil): the decimal form costs a
    // BigDecimal.valueOf+setScale per ROW over both lineitem passes —
    // the HAVING threshold becomes an exact integer compare
    s.sql(
      s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  ${dsumSql("l_quantity")} AS sum_qty
        |FROM q18_customer
        |JOIN q18_orders ON c_custkey = o_custkey
        |JOIN q18_lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM q18_lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(${centsSql("l_quantity")}) > 18000)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin)
  }

  private val qSqlQ18Oracle =
    s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |  ${dsumSql("l_quantity")} AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING SUM(${centsSql("l_quantity")}) > 18000)
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q21-shaped suppliers-who-kept-waiting: for each 'F' order,
    * find the supplier whose line was flagged ('R') while EVERY other
    * supplier on the same multi-supplier order was clean — one EXISTS
    * and one NOT EXISTS, both correlated self-joins on lineitem. (The
    * corpus carries no commit/receipt dates, so the returnflag is the
    * lateness predicate; the decorrelation shape is the point.)
    *
    * Scale: Catalyst rewrites EXISTS → left-semi and NOT EXISTS →
    * left-anti hash joins on l_orderkey — the self-join shuffles
    * lineitem on its natural key twice, no correlated re-execution and
    * no cartesian; supplier/nation broadcast. The grouped count is
    * bounded by |suppliers|. */
  def qSqlQ21(s: SparkSession, dir: String): DataFrame = {
    Tables.supplier(s, dir).createOrReplaceTempView("q21_supplier")
    Tables.lineitem(s, dir).createOrReplaceTempView("q21_lineitem")
    Tables.orders(s, dir).createOrReplaceTempView("q21_orders")
    Tables.nation(s, dir).createOrReplaceTempView("q21_nation")
    s.sql(
      """SELECT n_name, s_name, COUNT(*) AS numwait
        |FROM q21_supplier
        |JOIN q21_lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN q21_orders ON o_orderkey = l1.l_orderkey
        |JOIN q21_nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT 1 FROM q21_lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM q21_lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY n_name, s_name
        |ORDER BY numwait DESC, n_name, s_name
        |LIMIT 100""".stripMargin)
  }

  private val qSqlQ21Oracle =
    """SELECT n_name, s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY n_name, s_name
      |ORDER BY numwait DESC, n_name, s_name
      |LIMIT 100""".stripMargin

  /** TPC-H Q2-shaped minimum-cost supplier: for each sized part, the
    * EUROPE supplier(s) whose line price equals the part's minimum over
    * the same region — a correlated scalar MIN whose subquery repeats
    * the outer's multi-table join (lineitem⋈supplier⋈nation⋈region),
    * the decorrelation stress Q2 exists to apply. (No partsupp table in
    * the corpus; lineitem is the part↔supplier bridge and
    * l_extendedprice the cost. Values pass through from parquet to the
    * equality untouched, so double comparison is exact cross-engine.)
    *
    * Scale: Catalyst decorrelates the MIN into one region-filtered
    * aggregate on l_partkey joined back on (partkey, price) — the
    * subquery's join tree executes ONCE, not per part; region/nation/
    * supplier broadcast, the two lineitem passes shuffle on partkey.
    * Full-column ORDER BY makes the LIMIT deterministic under ties. */
  def qSqlQ2(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("q2_part")
    Tables.supplier(s, dir).createOrReplaceTempView("q2_supplier")
    Tables.lineitem(s, dir).createOrReplaceTempView("q2_lineitem")
    Tables.nation(s, dir).createOrReplaceTempView("q2_nation")
    Tables.region(s, dir).createOrReplaceTempView("q2_region")
    s.sql(
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |  l_extendedprice AS cost
        |FROM q2_part, q2_supplier, q2_lineitem, q2_nation, q2_region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size = 5 AND s_nationkey = n_nationkey
        |  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  AND l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice)
        |    FROM q2_lineitem l2, q2_supplier s2, q2_nation n2, q2_region r2
        |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, p_brand, cost
        |LIMIT 100""".stripMargin)
  }

  private val qSqlQ2Oracle =
    """SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
      |  l_extendedprice AS cost
      |FROM part, supplier, lineitem, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND p_size = 5 AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |  AND l_extendedprice = (
      |    SELECT MIN(l2.l_extendedprice)
      |    FROM lineitem l2, supplier s2, nation n2, region r2
      |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, p_brand, cost
      |LIMIT 100""".stripMargin

  /** Null-safe equality join (`<=>`): NULL keys MATCH each other
    * instead of vanishing — the join semantics deduplication and SCD
    * pipelines need when the business key is nullable. Catalyst plans
    * this as a hash join on a coalesced key (EqualNullSafe is
    * hashable), NOT a cartesian: same shuffle shape as q_join_inner.
    * The nullable key is synthesized deterministically (every 7th
    * customer) so both engines see identical NULL populations. */
  def qJoinNullSafe(s: SparkSession, dir: String): DataFrame = {
    def keyed(df: DataFrame, keyCol: String, out: String) =
      df.withColumn(out,
        when(col(keyCol) % 7 === 0, lit(null)).otherwise(col(keyCol) % 100))
    val c = keyed(Tables.customer(s, dir), "c_custkey", "ck")
    val o = keyed(Tables.orders(s, dir), "o_custkey", "ok")
      .groupBy(col("ok")).agg(count(lit(1)).as("n_orders"))
    c.join(o, col("ck") <=> col("ok"), "inner")
      .groupBy(col("ck").cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n_cust"), sum(col("n_orders")).as("n_orders"))
      .orderBy(col("bucket").asc_nulls_first)
  }

  private val qJoinNullSafeOracle =
    """WITH c AS (
      |  SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
      |    ELSE c_custkey % 100 END AS ck
      |  FROM customer),
      |o AS (
      |  SELECT ok, COUNT(*) AS n_orders FROM (
      |    SELECT CASE WHEN o_custkey % 7 = 0 THEN NULL
      |      ELSE o_custkey % 100 END AS ok
      |    FROM orders) GROUP BY ok)
      |SELECT CAST(ck AS BIGINT) AS bucket, COUNT(*) AS n_cust,
      |  CAST(SUM(n_orders) AS BIGINT) AS n_orders
      |FROM c JOIN o ON ck IS NOT DISTINCT FROM ok
      |GROUP BY ck ORDER BY bucket NULLS FIRST""".stripMargin

  /** Several COUNT(DISTINCT x) over DIFFERENT columns in one
    * aggregation — Catalyst rewrites this through an Expand node (one
    * row replica per distinct group), the plan shape that makes
    * multi-distinct a single pass instead of N self-joins. */
  def qAggMultiDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("d_parts"),
        countDistinct(col("l_suppkey")).as("d_supps"),
        countDistinct(col("l_quantity")).as("d_qtys"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  private val qAggMultiDistinctOracle =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS d_parts,
      |  COUNT(DISTINCT l_suppkey) AS d_supps,
      |  COUNT(DISTINCT l_quantity) AS d_qtys,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Schema-evolution union: two projections with different column
    * sets combine BY NAME with missing columns null-filled — how a
    * pipeline appends a v2 corpus (extra columns) to a v1 corpus
    * without positional breakage. Pure map-side (no shuffle until the
    * final sort). */
  def qUnionByName(s: SparkSession, dir: String): DataFrame = {
    val v1 = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val v2 = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 3 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    v1.unionByName(v2, allowMissingColumns = true)
      .select(col("o_orderkey"), col("o_totalprice"),
        coalesce(col("o_orderstatus"), lit("(v1)")).as("status"))
      .orderBy("o_orderkey")
  }

  private val qUnionByNameOracle =
    """SELECT o_orderkey, o_totalprice,
      |  COALESCE(o_orderstatus, '(v1)') AS status
      |FROM (
      |  SELECT o_orderkey, o_totalprice, NULL AS o_orderstatus
      |  FROM orders WHERE o_orderkey % 3 = 0
      |  UNION ALL BY NAME
      |  SELECT o_orderkey, o_totalprice, o_orderstatus
      |  FROM orders WHERE o_orderkey % 3 = 1)
      |ORDER BY o_orderkey""".stripMargin

  // ── window family ─────────────────────────────────────────────────

  /** Top-3 orders per customer by price (unique tiebreak on orderkey). */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  private val qWindowRankOracle =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Sliding 3-row sum per customer over order history. */
  def qWindowFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("moving_spend",
        sum(cents(col("o_totalprice"))).over(w).cast(DoubleType) / 100.0)
      .select("o_custkey", "o_orderkey", "o_totalprice", "moving_spend")
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qWindowFrameOracle =
    s"""SELECT o_custkey, o_orderkey, o_totalprice,
       |  CAST(SUM(${centsSql("o_totalprice")}) OVER (PARTITION BY o_custkey
       |    ORDER BY o_orderdate, o_orderkey
       |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS moving_spend
       |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Order-over-order delta per customer with lag/lead. */
  def qWindowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val tp = cents(col("o_totalprice"))
    Tables.orders(s, dir)
      .withColumn("delta_prev",
        (tp - lag(tp, 1).over(w)).cast(DoubleType) / 100.0)
      .withColumn("delta_next",
        (lead(tp, 1).over(w) - tp).cast(DoubleType) / 100.0)
      .select("o_custkey", "o_orderkey", "o_totalprice", "delta_prev", "delta_next")
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qWindowLagOracle = {
    val tp = centsSql("o_totalprice")
    s"""SELECT o_custkey, o_orderkey, o_totalprice,
       |  CAST($tp - LAG($tp, 1) OVER w AS DOUBLE) / 100.0 AS delta_prev,
       |  CAST(LEAD($tp, 1) OVER w - $tp AS DOUBLE) / 100.0 AS delta_next
       |FROM orders
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
       |ORDER BY o_custkey, o_orderkey""".stripMargin
  }

  /** Window navigation beyond q_window_analytic: nth_value over the
    * full frame (the "second/third order ever" report column) and
    * lag/lead with DEFAULTS (edge rows get a sentinel instead of null —
    * the form running-delta pipelines actually use). Same single
    * per-customer sort as every window query; explicit full frame so
    * both engines agree on what nth_value sees. */
  def qWindowNav(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .withColumn("order2", nth_value(col("o_orderkey"), 2).over(wFull))
      .withColumn("order3", nth_value(col("o_orderkey"), 3).over(wFull))
      .withColumn("prev2_price", lag(col("o_totalprice"), 2, -1.0).over(w))
      .withColumn("next2_price", lead(col("o_totalprice"), 2, -1.0).over(w))
      .select("o_custkey", "o_orderkey", "order2", "order3",
        "prev2_price", "next2_price")
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qWindowNavOracle =
    """SELECT o_custkey, o_orderkey,
      |  nth_value(o_orderkey, 2) OVER wf AS order2,
      |  nth_value(o_orderkey, 3) OVER wf AS order3,
      |  lag(o_totalprice, 2, -1.0) OVER w AS prev2_price,
      |  lead(o_totalprice, 2, -1.0) OVER w AS next2_price
      |FROM orders
      |WINDOW
      |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Analytic window suite: ntile / percent_rank / cume_dist /
    * first+last over the same per-customer frame. percent_rank and
    * cume_dist are exact rational values (rank ratios) — deterministic
    * doubles in both engines given the tie-free ordering. */
  def qWindowAnalytic(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wFrame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .withColumn("cheapest", first(col("o_orderkey")).over(wFrame))
      .withColumn("priciest", last(col("o_orderkey")).over(wFrame))
      .select("o_custkey", "o_orderkey", "quartile", "pct_rank", "cume",
        "cheapest", "priciest")
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qWindowAnalyticOracle =
    """SELECT o_custkey, o_orderkey,
      |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      |  round(PERCENT_RANK() OVER w, 6) AS pct_rank,
      |  round(CUME_DIST() OVER w, 6) AS cume,
      |  FIRST_VALUE(o_orderkey) OVER wf AS cheapest,
      |  LAST_VALUE(o_orderkey) OVER wf AS priciest
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** HyperLogLog approximate distinct vs the exact count. Approximate
    * values are engine-specific → no value oracle; the driver's
    * rows-only check applies and AggSpec bounds the relative error.
    *
    * The exact count runs as its own two-level aggregation (distinct
    * pairs, then count) joined back to the sketch aggregate: mixing
    * exact-distinct with other aggregates in ONE agg makes Spark Expand
    * every input row per aggregate (3× the scan through the first
    * shuffle); split, the sketches partial-aggregate map-side and the
    * exact path shuffles distinct pairs only. */
  def qAggApprox(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val sketches = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
    val exact = li.select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
    sketches.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("approx_parts"),
        col("exact_parts"), col("approx_orders"))
      .orderBy("l_returnflag")
  }

  /** The registry form of [[qAggApprox]], oracle-GATED (round-14, the
    * q_agg_percentile_approx recipe): HLL++ estimates cannot hash-match
    * a different engine's HLL, but the ε-contract can be checked
    * exactly in-query — both sketch counts must land within 15 % of
    * the exact distinct counts (3σ at the default rsd = 0.05; realized
    * max on these corpora is 5.5 %, i.e. 1.1σ — a 1σ bound flapped on
    * the 1.1k-cardinality group, measured round-14 — and the flag is
    * stable across partition layouts because every layout's estimate
    * honors 3σ with 2.7× margin). Flags are exact integer arithmetic
    * (|est−exact|·20 ≤ 3·exact); DuckDB mirrors the exact counts and the
    * all-ones flags, so a sketch regression hash-fails the entry. The
    * production form stays [[qAggApprox]] (sketches only, one
    * partial+final aggregation); this gate adds the two exact-distinct
    * passes a nightly validation run executes. */
  def qAggApproxGated(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val sk = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_orderkey")).as("ao"))
    val ep = li.select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
    val eo = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_orders"))
    sk.join(ep, "l_returnflag").join(eo, "l_returnflag")
      .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
        when(abs(col("ap") - col("exact_parts")) * 20 <= col("exact_parts") * 3, 1L)
          .otherwise(0L).as("ok_parts_eps"),
        when(abs(col("ao") - col("exact_orders")) * 20 <= col("exact_orders") * 3, 1L)
          .otherwise(0L).as("ok_orders_eps"))
      .orderBy("l_returnflag")
  }

  private val qAggApproxGatedOracle =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS exact_parts,
      |  COUNT(DISTINCT l_orderkey) AS exact_orders,
      |  CAST(1 AS BIGINT) AS ok_parts_eps,
      |  CAST(1 AS BIGINT) AS ok_orders_eps
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ── sort / limit ──────────────────────────────────────────────────

  /** Global top-100 by price. Spark plans TakeOrderedAndProject: per-
    * partition top-k then a k-sized merge on the driver — no full sort,
    * no shuffle of the full table, scales to any row count. */
  def qSortTopk(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")

  private val qSortTopkOracle =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Pivot: order counts + revenue per priority, spread over the three
    * order statuses (explicit value list keeps the schema static — the
    * distributed-safe form; an unlisted pivot would need an extra
    * distinct pass). Oracle mirrors with conditional aggregation. */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  private val qPivotOracle =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Unpivot (melt): wide numeric lineitem columns to (metric, value)
    * rows — Dataset.unpivot, mirrored by UNION ALL in the oracle. */
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_tax"))
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_tax")),
        "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric")

  private val qUnpivotOracle =
    """SELECT l_orderkey, l_linenumber, metric, value FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem) t
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  /** Range (non-equi) join: bucket order values into literal price
    * brackets. The bracket table is broadcast, so the non-equi predicate
    * evaluates as a broadcast nested loop over 4 rows — the right plan
    * at any fact size. */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val brackets = s.createDataFrame(Seq(
      ("budget", 0.0, 50000.0),
      ("mid", 50000.0, 150000.0),
      ("premium", 150000.0, 300000.0),
      ("luxury", 300000.0, 1e9)
    )).toDF("bracket", "lo", "hi")
    Tables.orders(s, dir)
      .join(broadcast(brackets),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("bracket"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("bracket")
  }

  private val qRangeJoinOracle =
    s"""WITH brackets(bracket, lo, hi) AS (VALUES
       |  ('budget', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
       |  ('premium', 150000.0, 300000.0), ('luxury', 300000.0, 1e9))
       |SELECT bracket, COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS revenue
       |FROM orders JOIN brackets
       |  ON o_totalprice >= lo AND o_totalprice < hi
       |GROUP BY bracket ORDER BY bracket""".stripMargin

  // ── set ops ───────────────────────────────────────────────────────

  /** UNION (distinct) of key sets. */
  def qSetUnion(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(col("o_custkey").as("key"))
      .union(Tables.customer(s, dir).select(col("c_custkey").as("key")))
      .distinct()
      .orderBy("key")

  private val qSetUnionOracle =
    """SELECT o_custkey AS key FROM orders UNION SELECT c_custkey FROM customer
      |ORDER BY key""".stripMargin

  /** INTERSECT of order keys present in lineitem. */
  def qSetIntersect(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(col("o_orderkey").as("key"))
      .intersect(Tables.lineitem(s, dir).select(col("l_orderkey").as("key")))
      .orderBy("key")

  private val qSetIntersectOracle =
    """SELECT o_orderkey AS key FROM orders INTERSECT SELECT l_orderkey FROM lineitem
      |ORDER BY key""".stripMargin

  /** EXCEPT: customers that never placed a big-ticket order. */
  def qSetExcept(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey").as("key"))
      .except(Tables.orders(s, dir)
        .filter(col("o_totalprice") > 150000.0)
        .select(col("o_custkey").as("key")))
      .orderBy("key")

  private val qSetExceptOracle =
    """SELECT c_custkey AS key FROM customer
      |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0
      |ORDER BY key""".stripMargin

  /** Multiset (bag) set operations — the ALL variants the distinct
    * forms above don't cover, closing the ANSI set-op family:
    * `INTERSECT ALL` keeps each key min(multiplicity-left,
    * multiplicity-right) times, `EXCEPT ALL` subtracts multiplicities
    * (both directions shown — bag difference is asymmetric), and
    * `UNION ALL` concatenates. Sides are two overlapping multiset
    * projections of the same fact (quantity > 25 vs returned lines) so
    * every duplicate-count path is exercised.
    *
    * Scale: Catalyst rewrites INTERSECT/EXCEPT ALL into per-side count
    * aggregation + replication (`RewriteIntersectAll`/
    * `RewriteExceptAll`) — one shuffle on the key with map-side partial
    * counts, then a generate to re-expand; never a row-pairing join, so
    * the plan is the same combine-friendly shape as any groupBy at
    * 100 TB. UNION ALL is a zero-shuffle concatenation. */
  def qSetOpsAll(s: SparkSession, dir: String): DataFrame = {
    def a = Tables.lineitem(s, dir).filter(col("l_quantity") > 25)
      .select(col("l_partkey").as("key"))
    def b = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select(col("l_partkey").as("key"))
    a.unionAll(b).withColumn("op", lit("union_all"))
      .unionByName(a.intersectAll(b).withColumn("op", lit("intersect_all")))
      .unionByName(a.exceptAll(b).withColumn("op", lit("except_all")))
      .unionByName(b.exceptAll(a).withColumn("op", lit("except_all_rev")))
      .select(col("op"), col("key"))
      .orderBy("op", "key")
  }

  private val qSetOpsAllOracle =
    """WITH a AS (SELECT l_partkey AS key FROM lineitem WHERE l_quantity > 25),
      |b AS (SELECT l_partkey AS key FROM lineitem WHERE l_returnflag = 'R')
      |SELECT 'union_all' AS op, key FROM
      |  (SELECT key FROM a UNION ALL SELECT key FROM b)
      |UNION ALL SELECT 'intersect_all' AS op, key FROM
      |  (SELECT key FROM a INTERSECT ALL SELECT key FROM b)
      |UNION ALL SELECT 'except_all' AS op, key FROM
      |  (SELECT key FROM a EXCEPT ALL SELECT key FROM b)
      |UNION ALL SELECT 'except_all_rev' AS op, key FROM
      |  (SELECT key FROM b EXCEPT ALL SELECT key FROM a)
      |ORDER BY op, key""".stripMargin

  // ── round-5 relational additions ──────────────────────────────────

  /** RIGHT OUTER join: every customer row survives, orders aggregate
    * against it (the mirror of q_join_left — exercises Catalyst's
    * right-outer plan path, which it rewrites to a left-outer with the
    * build side swapped). `count(o_orderkey)` counts matches only;
    * customers without orders show 0 and a NULL revenue. */
  def qJoinRight(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"), "right_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
      .orderBy("c_custkey")

  private val qJoinRightOracle =
    s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       |  ${dsumSql("o_totalprice")} AS revenue
       |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** Bounded CROSS JOIN: the dimension-scaffold pattern — the full
    * (status × priority) matrix left-joined with observed aggregates so
    * empty combinations surface explicitly (a coverage report needs the
    * zero rows a plain groupBy can't produce). Both distinct sides are
    * tiny (3 × 5); the cross join broadcasts, never a shuffled
    * cartesian — the only legitimate cross-join shape at 100 TB. */
  def qJoinCross(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val st = orders.select(col("o_orderstatus")).distinct()
    val pr = orders.select(col("o_orderpriority")).distinct()
    val observed = orders.groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
    st.crossJoin(broadcast(pr))
      .join(observed, Seq("o_orderstatus", "o_orderpriority"), "left_outer")
      .select(col("o_orderstatus"), col("o_orderpriority"),
        coalesce(col("n"), lit(0L)).as("n_orders"), col("revenue"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  private val qJoinCrossOracle =
    s"""WITH st AS (SELECT DISTINCT o_orderstatus FROM orders),
       |pr AS (SELECT DISTINCT o_orderpriority FROM orders),
       |obs AS (
       |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |    ${dsumSql("o_totalprice")} AS revenue
       |  FROM orders GROUP BY 1, 2)
       |SELECT st.o_orderstatus, pr.o_orderpriority,
       |  COALESCE(n, 0) AS n_orders, revenue
       |FROM st CROSS JOIN pr
       |LEFT JOIN obs ON st.o_orderstatus = obs.o_orderstatus
       |  AND pr.o_orderpriority = obs.o_orderpriority
       |ORDER BY st.o_orderstatus, pr.o_orderpriority""".stripMargin

  /** Arg-max / arg-min aggregates (`max_by`/`min_by`): the order key
    * holding each priority class's price extreme, tie-broken to the
    * smallest key via lexicographic struct ordering — one partial+final
    * aggregation instead of the rank-window detour (no per-group sort,
    * combines map-side; at 100 TB this is the shape to prefer over
    * row_number()=1 whenever only the extreme row is needed). */
  def qAggArgmax(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        max(col("o_totalprice")).as("max_price"),
        max_by(col("o_orderkey"),
          struct(col("o_totalprice"), (-col("o_orderkey")).as("nk"))).as("max_order"),
        min(col("o_totalprice")).as("min_price"),
        min_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("min_order"))
      .orderBy("o_orderpriority")

  private val qAggArgmaxOracle =
    """WITH rk AS (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rmax,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice, o_orderkey) AS rmin
      |  FROM orders)
      |SELECT o_orderpriority,
      |  MAX(CASE WHEN rmax = 1 THEN o_totalprice END) AS max_price,
      |  MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS max_order,
      |  MAX(CASE WHEN rmin = 1 THEN o_totalprice END) AS min_price,
      |  MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS min_order
      |FROM rk GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** LATERAL correlated subquery — top-2 orders per customer as a
    * lateral table reference (the SQL form of "per-row top-k probe").
    * Catalyst decorrelates the LIMIT-bearing lateral into a ranked
    * window join (DecorrelateInnerQuery), so the executed plan is the
    * same one shuffle q_window_rank runs — no per-customer re-scan of
    * orders, which is what a naive nested-loop would do at 100 TB. */
  def qJoinLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("lat_customer")
    Tables.orders(s, dir).createOrReplaceTempView("lat_orders")
    s.sql("""
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM lat_customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM lat_orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")
  }

  private val qJoinLateralOracle =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  /** RANGE window frame — the VALUE-based sibling of q_window_frame's
    * ROWS frame: each order sees the trailing 7 calendar DAYS of its
    * priority class, however many rows that spans (gaps and duplicate
    * dates behave correctly, which a ROWS frame gets wrong). Epoch-day
    * integers keep the frame arithmetic exact on both engines. One
    * window shuffle on the partition key. */
  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    val d = datediff(col("o_orderdate").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("d"))
      .rangeBetween(-6, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), d.as("d"),
        col("o_totalprice"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("d"),
        count(lit(1)).over(w).as("n_7d"),
        (sum(cents(col("o_totalprice"))).over(w).cast(DoubleType) / 100.0)
          .as("rev_7d"))
      .orderBy("o_orderkey")
  }

  private val qWindowRangeOracle =
    s"""WITH t AS (
       |  SELECT o_orderkey, o_orderpriority,
       |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
       |    o_totalprice
       |  FROM orders)
       |SELECT o_orderkey, o_orderpriority, d,
       |  COUNT(*) OVER w AS n_7d,
       |  CAST(SUM(${centsSql("o_totalprice")}) OVER w AS DOUBLE) / 100.0 AS rev_7d
       |FROM t
       |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY d
       |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
       |ORDER BY o_orderkey""".stripMargin

  /** Boolean aggregate surface: every/some (bool_and/bool_or) and
    * count_if per group — the predicate-rollup shape data-quality
    * dashboards aggregate ("did every row pass", "how many failed").
    * Partial+final like any other agg. */
  def qAggBool(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        every(col("o_totalprice") > 1000.0).as("all_over_1k"),
        some(col("o_totalprice") > 400000.0).as("any_over_400k"),
        count_if(col("o_orderpriority").startsWith("1")).as("n_urgent"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  private val qAggBoolOracle =
    """SELECT o_orderstatus,
      |  bool_and(o_totalprice > 1000.0) AS all_over_1k,
      |  bool_or(o_totalprice > 400000.0) AS any_over_400k,
      |  CAST(count_if(o_orderpriority LIKE '1%') AS BIGINT) AS n_urgent,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Null-semantics surface: null-safe equality (`<=>` / IS NOT
    * DISTINCT FROM), nullif, nvl2, and coalesce chains — the operators
    * that make three-valued logic explicit. The probe column is
    * deterministically nulled from the key so both engines build the
    * same nulls. Map-side only. */
  def qNullSemantics(s: SparkSession, dir: String): DataFrame = {
    val probe = when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
      .otherwise(col("o_orderstatus"))
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      probe.as("probe"),
      (probe <=> col("o_orderstatus")).as("nsafe_eq"),
      (probe <=> lit(null).cast("string")).as("nsafe_is_null"),
      nullif(col("o_orderstatus"), lit("O")).as("status_nz"),
      nvl2(probe, lit("present"), lit("absent")).as("presence"),
      coalesce(probe, col("o_orderpriority"), lit("?")).as("first_present"))
      .orderBy("o_orderkey")
  }

  private val qNullSemanticsOracle =
    """WITH t AS (
      |  SELECT o_orderkey, o_orderstatus, o_orderpriority,
      |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS probe
      |  FROM orders)
      |SELECT o_orderkey, probe,
      |  probe IS NOT DISTINCT FROM o_orderstatus AS nsafe_eq,
      |  probe IS NOT DISTINCT FROM NULL AS nsafe_is_null,
      |  nullif(o_orderstatus, 'O') AS status_nz,
      |  CASE WHEN probe IS NOT NULL THEN 'present' ELSE 'absent' END AS presence,
      |  COALESCE(probe, o_orderpriority, '?') AS first_present
      |FROM t ORDER BY o_orderkey""".stripMargin

  /** HAVING surface: a post-aggregation predicate (here: repeat
    * customers with big spend). Catalyst plans it as Filter ABOVE the
    * final HashAggregate — groups are pruned after the merge, so the
    * map-side partials are untouched and no second shuffle appears. */
  def qAggHaving(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("spend"))
      .filter(col("n_orders") >= 3 && col("spend") > 500000.0)
      .orderBy("o_custkey")

  private val qAggHavingOracle =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  round(SUM(o_totalprice), 2) AS spend
      |FROM orders GROUP BY o_custkey
      |HAVING COUNT(*) >= 3 AND round(SUM(o_totalprice), 2) > 500000.0
      |ORDER BY o_custkey""".stripMargin

  // ── RFM segmentation (scalable NTILE) ─────────────────────────────

  /** NTILE(`k`) by `(value, tie)` WITHOUT the single-partition global
    * window: the [[graft.queries.Curation.qCurationGlobalIndex]]
    * two-level discipline (monotone EQUAL-DEPTH buckets off a broadcast
    * 63-point `approx_percentile` sketch, per-bucket counts
    * prefix-summed into offsets over a ≤64-row side relation, local
    * rank partitioned by bucket), then SQL NTILE's row distribution
    * computed arithmetically from the global rank: with q = n div k
    * and r = n mod k the first r tiles hold q+1 rows —
    * `rn ≤ r(q+1) ⇒ ⌈rn/(q+1)⌉`, else `r + ⌈(rn − r(q+1))/q⌉`, all
    * integer (`⌈a/b⌉ = (a+b−1) div b`). Matches NTILE exactly under
    * the same total order, and every data-sized window is
    * bucket-partitioned.
    *
    * Skew robustness: `__bucket = #{splits < __v}` is a monotone
    * function of `__v`, and the downstream arithmetic is exact for ANY
    * such bucketing — split-point values never affect the answer, only
    * bucket balance. Equal-depth splits from the mergeable
    * Greenwald–Khanna sketch (accuracy 10⁴ ⇒ rank error ≤ n/10⁴)
    * bound every bucket at ≈ n/64 + 2n/10⁴ rows REGARDLESS of the
    * value distribution — long-tailed columns (e.g. RFM's right-skewed
    * monetary sum) no longer collapse into the lowest few equal-width
    * buckets and degenerate the per-bucket window toward a single-task
    * sort. The one irreducible case is a single value carrying > n/64
    * duplicates (its bucket must hold them all; SQL NTILE has no
    * answer below a value-granularity bucket either). Sketch merges
    * are order-dependent so split VALUES may vary run to run; the
    * output does not.
    *
    * The input is localCheckpoint'd: it feeds three subtrees (bounds
    * aggregate, offset counts, the ranked output), and chained calls
    * would otherwise compound that fan-out into exponential
    * re-evaluation of the upstream plan — one dim-sized
    * materialization per pass buys a linear total, the same lineage
    * discipline as the CC/BPE iteration cuts. */
  /** Equal-depth bucket assignment for [[scalableNtile]]: stamps
    * `__n` (total rows) and `__bucket` (count of broadcast equal-depth
    * split points strictly below `__v`) onto a relation that already
    * carries a long `__v`. Exposed package-private so the skew spec
    * can assert bucket balance on a planted long-tailed column. */
  private[graft] def ntileBuckets(in: DataFrame): DataFrame = {
    val fracs = (1 until 64).map(i => s"${i}D / 64").mkString(", ")
    // The 1-row sketch aggregate is localCheckpoint'd because it feeds
    // TWO independent subtrees (the offsets counts and the ranked
    // output) and GK merges are shuffle-order-dependent: without the
    // pin, correctness would silently hinge on exchange reuse
    // deduplicating the two evaluations — two different split arrays
    // would bucket the offsets and the ranks inconsistently. One
    // 1-row materialization makes the splits a constant.
    val bounds = in.agg(count(lit(1)).as("__n"),
      expr(s"approx_percentile(__v, array($fracs), 10000)").as("__spl"))
      .localCheckpoint()
    in.crossJoin(broadcast(bounds))
      .withColumn("__bucket",
        expr("size(filter(__spl, t -> t < __v))").cast(LongType))
  }

  private[graft] def scalableNtile(df: DataFrame, value: Column, tie: Column,
      k: Int, out: String): DataFrame = {
    val in = df.withColumn("__v", value.cast(LongType)).localCheckpoint()
    val bucketed = ntileBuckets(in)
    val offsets = bucketed.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset", coalesce(
        sum(col("__cnt")).over(Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    bucketed
      .withColumn("__local", row_number().over(
        Window.partitionBy(col("__bucket")).orderBy(col("__v"), tie)))
      .join(broadcast(offsets), "__bucket")
      .withColumn("__rn", col("__offset") + col("__local"))
      .withColumn(out, expr(
        s"""CASE WHEN __rn <= (__n % $k) * (__n div $k + 1)
           |  THEN (__rn + __n div $k) div (__n div $k + 1)
           |  ELSE (__n % $k) +
           |    (__rn - (__n % $k) * (__n div $k + 1) + __n div $k - 1)
           |      div (__n div $k)
           |END""".stripMargin).cast(LongType))
      .drop("__v", "__spl", "__n", "__bucket", "__cnt", "__offset",
        "__local", "__rn")
  }

  /** RFM customer segmentation — the marketing-analytics staple: per
    * customer RECENCY (days since last order, vs the corpus max date),
    * FREQUENCY (order count) and MONETARY (lifetime spend, integer
    * cents), each quintile-scored (1 = most recent / most frequent /
    * highest spend), then one segment rollup. The orders fact reduces
    * to a customers-sized relation in ONE combine-friendly aggregation;
    * each quintile score is a [[scalableNtile]] pass (no
    * single-partition window anywhere), and the output is the ≤125-row
    * (r,f,m) cube. Ties break by `o_custkey` so the oracle's NTILE
    * sees the identical total order. */
  def qAggRfm(s: SparkSession, dir: String): DataFrame = {
    val percust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_date"),
        count(lit(1)).as("frequency"),
        sum(QueryUtil.cents(col("o_totalprice")).cast(DecimalType(20, 0)))
          .cast(LongType).as("monetary_cents"))
    val ref = percust.agg(max(col("last_date")).as("ref_date"))
    val dims = percust.crossJoin(broadcast(ref))
      .withColumn("recency_days",
        datediff(col("ref_date"), col("last_date")).cast(LongType))
      .drop("ref_date", "last_date")
    val scored = Seq[(Column, String)](
      (col("recency_days"), "r_score"),
      (-col("frequency"), "f_score"),
      (-col("monetary_cents"), "m_score"))
      .foldLeft(dims) { case (d, (v, name)) =>
        scalableNtile(d, v, col("o_custkey"), 5, name)
      }
    scored.groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).cast(LongType).as("n_customers"),
        sum(col("frequency")).cast(LongType).as("total_orders"),
        sum(col("monetary_cents")).cast(LongType).as("monetary_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }

  private val qAggRfmOracle =
    s"""WITH percust AS (
       |  SELECT o_custkey,
       |    MAX(CAST(o_orderdate AS DATE)) AS last_date,
       |    COUNT(*) AS frequency,
       |    CAST(SUM(${QueryUtil.centsSql("o_totalprice")}) AS BIGINT)
       |      AS monetary_cents
       |  FROM orders GROUP BY 1),
       |ref AS (SELECT MAX(last_date) AS ref_date FROM percust),
       |scored AS (
       |  SELECT frequency, monetary_cents,
       |    NTILE(5) OVER (ORDER BY datediff('day', last_date, ref_date),
       |      o_custkey) AS r_score,
       |    NTILE(5) OVER (ORDER BY -frequency, o_custkey) AS f_score,
       |    NTILE(5) OVER (ORDER BY -monetary_cents, o_custkey) AS m_score
       |  FROM percust CROSS JOIN ref)
       |SELECT CAST(r_score AS BIGINT) AS r_score,
       |  CAST(f_score AS BIGINT) AS f_score,
       |  CAST(m_score AS BIGINT) AS m_score,
       |  CAST(COUNT(*) AS BIGINT) AS n_customers,
       |  CAST(SUM(frequency) AS BIGINT) AS total_orders,
       |  CAST(SUM(monetary_cents) AS BIGINT) AS monetary_cents
       |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ── market-basket pair analysis ───────────────────────────────────

  /** Market-basket association pairs: parts co-ordered in the same
    * order, scored by SUPPORT (co-order count, ppm of all orders) and
    * LIFT (observed/expected co-occurrence, integer basis points), top
    * 20. The pair explosion is the textbook a.pk < b.pk self-join on
    * the order key — bounded by (items-per-order choose 2), a CONSTANT
    * per order, so the join output is linear in the fact table at any
    * corpus size. Top-20 runs through TakeOrderedAndProject (orderBy +
    * limit — no global window); the rank stamp after the limit is a
    * 20-row window. Integer headroom is ENFORCED, not assumed: with
    * longs, Spark's non-ANSI multiply would WRAP silently past
    * n_ab·n_orders·10⁴ ≈ 2⁶³ while the DuckDB oracle's hugeint would
    * not — a divergence only a corpus-scale gate run would catch. Since
    * n_ab ≤ n_orders, the whole product is bounded by n_orders²·10⁴,
    * so one broadcast assert_true on n_orders ≤ 3·10⁷ (≈ the wrap
    * point) guards every row for free; past it the query fails LOUDLY
    * naming the fix (promote the ratio to DECIMAL(38,0) — measured
    * round 13: the always-decimal form tripled the 10× sweep cost to
    * 22.8 s by dragging every pair row through the checked-overflow
    * decimal path, so the fast long path + loud guard is the right
    * trade until a corpus actually crosses it). */
  def qMarketBasket(s: SparkSession, dir: String): DataFrame = {
    val op = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val pc = op.groupBy(col("pk")).agg(count(lit(1)).as("n_p"))
    val no = op.agg(countDistinct(col("ok")).as("n_orders"))
    val pairs = op.as("a")
      .join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    pairs
      .join(pc.toDF("part_a", "n_a"), "part_a")
      .join(pc.toDF("part_b", "n_b"), "part_b")
      .crossJoin(broadcast(no))
      .withColumn("support_ppm", expr("n_ab * 1000000 div n_orders"))
      .withColumn("_hr", assert_true(col("n_orders") <= 30000000L,
        lit("q_market_basket int64 lift headroom: n_orders > 3e7 - " +
          "promote lift_bp to DECIMAL(38,0)")))
      .filter(col("_hr").isNull).drop("_hr")
      .withColumn("lift_bp", expr("n_ab * n_orders * 10000 div (n_a * n_b)"))
      .orderBy(col("n_ab").desc, col("lift_bp").desc,
        col("part_a"), col("part_b"))
      .limit(20)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n_ab").desc, col("lift_bp").desc,
          col("part_a"), col("part_b"))).cast(LongType))
      .select(col("rk"), col("part_a"), col("part_b"),
        col("n_ab").cast(LongType).as("n_ab"),
        col("support_ppm").cast(LongType).as("support_ppm"),
        col("lift_bp").cast(LongType).as("lift_bp"))
      .orderBy("rk")
  }

  private val qMarketBasketOracle =
    """WITH op AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |pc AS (SELECT pk, COUNT(*) AS n_p FROM op GROUP BY pk),
      |no AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM op),
      |pairs AS (
      |  SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_ab
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |sc AS (
      |  SELECT part_a, part_b, n_ab,
      |    n_ab * 1000000 // n_orders AS support_ppm,
      |    n_ab * n_orders * 10000 // (pa.n_p * pb.n_p) AS lift_bp
      |  FROM pairs CROSS JOIN no
      |    JOIN pc pa ON part_a = pa.pk
      |    JOIN pc pb ON part_b = pb.pk),
      |r AS (
      |  SELECT *, row_number() OVER (ORDER BY n_ab DESC, lift_bp DESC,
      |    part_a, part_b) AS rk FROM sc)
      |SELECT CAST(rk AS BIGINT) AS rk, part_a, part_b,
      |  CAST(n_ab AS BIGINT) AS n_ab,
      |  CAST(support_ppm AS BIGINT) AS support_ppm,
      |  CAST(lift_bp AS BIGINT) AS lift_bp
      |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin

  // ── per-group OLS trend ───────────────────────────────────────────

  /** Per-segment revenue TREND — ordinary-least-squares slope of
    * monthly revenue against the month index, the analytics staple
    * behind "is this segment growing" dashboards (ANSI `REGR_SLOPE`
    * territory, but float aggregation there is summation-order-
    * dependent; this is the exact-arithmetic form). Revenue reduces to
    * integer cents per (segment, month) in one combine-friendly
    * aggregation (month domain ≈ 80 cells/segment), then the classic
    * closed form slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) is computed
    * from five integer sums over that domain-sized relation —
    * order-independent, no window, no float anywhere. The ratio rides
    * DECIMAL(38,0)/HUGEINT (the q_market_basket wrap-guard discipline)
    * and is emitted in basis points with explicit sign-split so both
    * engines truncate toward zero identically on negative slopes.
    * Scale: one fact-sized aggregation + one ≈|segments|·|months|
    * reduce; nothing else grows. */
  def qAggTrend(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast(LongType).as("x"),
        QueryUtil.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("segment"), col("x"))
      .agg(sum(col("cents").cast(DecimalType(20, 0))).cast(LongType).as("y"))
    monthly.groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y").cast(DecimalType(38, 0))).as("sy"),
        sum(col("x") * col("y").cast(DecimalType(38, 0))).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("num", expr(
        "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("den", expr(
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .select(col("segment"), col("n").cast(LongType).as("n_months"),
        col("sy").cast(LongType).as("total_cents"),
        expr("""CASE WHEN num >= 0 THEN CAST((num * 10000) div den AS BIGINT)
               |  ELSE -CAST(((-num) * 10000) div den AS BIGINT) END"""
          .stripMargin).as("slope_cents_per_month_bp"))
      .orderBy("segment")
  }

  private val qAggTrendOracle =
    s"""WITH monthly AS (
       |  SELECT c_mktsegment AS segment,
       |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS x,
       |    CAST(SUM(${QueryUtil.centsSql("o_totalprice")}) AS BIGINT) AS y
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1, 2),
       |st AS (
       |  SELECT segment, COUNT(*) AS n, SUM(x) AS sx,
       |    SUM(CAST(y AS HUGEINT)) AS sy,
       |    SUM(x * CAST(y AS HUGEINT)) AS sxy,
       |    SUM(x * x) AS sxx
       |  FROM monthly GROUP BY 1),
       |sl AS (
       |  SELECT segment, n, sy,
       |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
       |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den
       |  FROM st)
       |SELECT segment, CAST(n AS BIGINT) AS n_months,
       |  CAST(sy AS BIGINT) AS total_cents,
       |  CASE WHEN num >= 0 THEN CAST((num * 10000) // den AS BIGINT)
       |    ELSE -CAST(((-num) * 10000) // den AS BIGINT) END
       |    AS slope_cents_per_month_bp
       |FROM sl ORDER BY segment""".stripMargin

  // ── open-order backlog sweep-line ─────────────────────────────────

  /** Monthly open-order backlog: an order OPENS at `o_orderdate` and
    * CLOSES when its last lineitem ships (max `l_shipdate`) — the
    * sweep-line +1/−1 census, reported per calendar month (integer
    * month index year·12+month) with the running backlog. Two
    * combine-friendly aggregations (per-order close date, then
    * per-month open/close counts via one full-outer month join) reduce
    * the facts to a MONTH-DOMAIN relation; only that ~domain-sized
    * relation flows through the cumulative window, so the single
    * partition it sorts holds ≤ a few hundred rows at any corpus
    * size. */
  def qOrdersBacklog(s: SparkSession, dir: String): DataFrame = {
    def monthIdx(c: Column): Column = (year(c) * 12 + month(c)).cast(LongType)
    val spans = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir).groupBy(col("l_orderkey"))
          .agg(max(col("l_shipdate")).as("done_ts")),
        col("o_orderkey") === col("l_orderkey"))
      .select(monthIdx(col("o_orderdate")).as("m_open"),
        monthIdx(col("done_ts")).as("m_close"))
    val opened = spans.groupBy(col("m_open").as("m"))
      .agg(count(lit(1)).as("opened"))
    val closed = spans.groupBy(col("m_close").as("m"))
      .agg(count(lit(1)).as("closed"))
    opened.join(closed, Seq("m"), "full_outer")
      .select(col("m"), coalesce(col("opened"), lit(0L)).as("opened"),
        coalesce(col("closed"), lit(0L)).as("closed"))
      .withColumn("backlog", sum(col("opened") - col("closed")).over(
        Window.orderBy(col("m")).rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("m").as("month_idx"),
        col("opened").cast(LongType).as("n_opened"),
        col("closed").cast(LongType).as("n_closed"),
        col("backlog").cast(LongType).as("backlog"))
      .orderBy("month_idx")
  }

  private val qOrdersBacklogOracle =
    """WITH done AS (
      |  SELECT l_orderkey, MAX(l_shipdate) AS done_ts
      |  FROM lineitem GROUP BY 1),
      |sp AS (
      |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS m_open,
      |    year(done_ts) * 12 + month(done_ts) AS m_close
      |  FROM orders JOIN done ON o_orderkey = l_orderkey),
      |op AS (SELECT m_open AS m, COUNT(*) AS opened FROM sp GROUP BY 1),
      |cl AS (SELECT m_close AS m, COUNT(*) AS closed FROM sp GROUP BY 1),
      |mm AS (
      |  SELECT COALESCE(op.m, cl.m) AS m, COALESCE(opened, 0) AS opened,
      |    COALESCE(closed, 0) AS closed
      |  FROM op FULL OUTER JOIN cl ON op.m = cl.m)
      |SELECT CAST(m AS BIGINT) AS month_idx,
      |  CAST(opened AS BIGINT) AS n_opened,
      |  CAST(closed AS BIGINT) AS n_closed,
      |  CAST(SUM(opened - closed) OVER (ORDER BY m
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
      |FROM mm ORDER BY month_idx""".stripMargin

  // ── registry ──────────────────────────────────────────────────────

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_rfm" -> (qAggRfm _),
    "q_market_basket" -> (qMarketBasket _),
    "q_orders_backlog" -> (qOrdersBacklog _),
    "q_agg_having" -> (qAggHaving _),
    "q_agg_bool" -> (qAggBool _),
    "q_null_semantics" -> (qNullSemantics _),
    "q_window_range" -> (qWindowRange _),
    "q_join_lateral" -> (qJoinLateral _),
    "q_scan_project" -> (qScanProject _),
    "q_filter_pred" -> (qFilterPred _),
    "q_agg_group" -> (qAggGroup _),
    "q_agg_distinct" -> (qAggDistinct _),
    "q_agg_rollup" -> (qAggRollup _),
    "q_agg_stats" -> (qAggStats _),
    "q_agg_percentile" -> (qAggPercentile _),
    "q_agg_percentile_counting" -> (qAggPercentileCounting _),
    "q_agg_percentile_weighted" -> (qAggPercentileWeighted _),
    "q_agg_cube" -> (qAggCube _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_grouping_id" -> (qGroupingId _),
    "q_window_nav" -> (qWindowNav _),
    "q_join_null_safe" -> (qJoinNullSafe _),
    "q_agg_multi_distinct" -> (qAggMultiDistinct _),
    "q_union_by_name" -> (qUnionByName _),
    "q_join_inner" -> (qJoinInner _),
    "q_join_left" -> (qJoinLeft _),
    "q_join_semi" -> (qJoinSemi _),
    "q_join_anti" -> (qJoinAnti _),
    "q_join_full" -> (qJoinFull _),
    "q_join_multiway" -> (qJoinMultiway _),
    "q_join_right" -> (qJoinRight _),
    "q_join_cross" -> (qJoinCross _),
    "q_agg_argmax" -> (qAggArgmax _),
    "q_sql_q3" -> (qSqlQ3 _),
    "q_sql_q5" -> (qSqlQ5 _),
    "q_sql_q10" -> (qSqlQ10 _),
    "q_sql_q18" -> (qSqlQ18 _),
    "q_sql_q21" -> (qSqlQ21 _),
    "q_sql_q2" -> (qSqlQ2 _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_range_join" -> (qRangeJoin _),
    "q_subquery_scalar" -> (qSubqueryScalar _),
    "q_subquery_correlated" -> (qSubqueryCorrelated _),
    "q_window_rank" -> (qWindowRank _),
    "q_window_frame" -> (qWindowFrame _),
    "q_window_lag" -> (qWindowLag _),
    "q_window_analytic" -> (qWindowAnalytic _),
    "q_agg_approx" -> (qAggApproxGated _),
    "q_agg_percentile_approx" -> (qAggPercentileApproxGated _),
    "q_sort_topk" -> (qSortTopk _),
    "q_set_union" -> (qSetUnion _),
    "q_set_intersect" -> (qSetIntersect _),
    "q_set_except" -> (qSetExcept _),
    "q_set_ops_all" -> (qSetOpsAll _),
    "q_agg_trend" -> (qAggTrend _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg_rfm" -> qAggRfmOracle,
    "q_market_basket" -> qMarketBasketOracle,
    "q_orders_backlog" -> qOrdersBacklogOracle,
    "q_agg_having" -> qAggHavingOracle,
    "q_agg_bool" -> qAggBoolOracle,
    "q_null_semantics" -> qNullSemanticsOracle,
    "q_window_range" -> qWindowRangeOracle,
    "q_join_lateral" -> qJoinLateralOracle,
    "q_scan_project" -> qScanProjectOracle,
    "q_filter_pred" -> qFilterPredOracle,
    "q_agg_group" -> qAggGroupOracle,
    "q_agg_distinct" -> qAggDistinctOracle,
    "q_agg_rollup" -> qAggRollupOracle,
    "q_agg_stats" -> qAggStatsOracle,
    "q_agg_percentile" -> qAggPercentileOracle,
    "q_agg_percentile_approx" -> qAggPercentileApproxGatedOracle,
    "q_agg_approx" -> qAggApproxGatedOracle,
    "q_agg_percentile_counting" -> qAggPercentileCountingOracle,
    "q_agg_percentile_weighted" -> qAggPercentileWeightedOracle,
    "q_agg_cube" -> qAggCubeOracle,
    "q_grouping_sets" -> qGroupingSetsOracle,
    "q_grouping_id" -> qGroupingIdOracle,
    "q_window_nav" -> qWindowNavOracle,
    "q_join_null_safe" -> qJoinNullSafeOracle,
    "q_agg_multi_distinct" -> qAggMultiDistinctOracle,
    "q_union_by_name" -> qUnionByNameOracle,
    "q_join_inner" -> qJoinInnerOracle,
    "q_join_left" -> qJoinLeftOracle,
    "q_join_semi" -> qJoinSemiOracle,
    "q_join_anti" -> qJoinAntiOracle,
    "q_join_full" -> qJoinFullOracle,
    "q_join_multiway" -> qJoinMultiwayOracle,
    "q_join_right" -> qJoinRightOracle,
    "q_join_cross" -> qJoinCrossOracle,
    "q_agg_argmax" -> qAggArgmaxOracle,
    "q_sql_q3" -> qSqlQ3Oracle,
    "q_sql_q5" -> qSqlQ5Oracle,
    "q_sql_q10" -> qSqlQ10Oracle,
    "q_sql_q18" -> qSqlQ18Oracle,
    "q_sql_q21" -> qSqlQ21Oracle,
    "q_sql_q2" -> qSqlQ2Oracle,
    "q_pivot" -> qPivotOracle,
    "q_unpivot" -> qUnpivotOracle,
    "q_range_join" -> qRangeJoinOracle,
    "q_subquery_scalar" -> qSubqueryScalarOracle,
    "q_subquery_correlated" -> qSubqueryCorrelatedOracle,
    "q_window_rank" -> qWindowRankOracle,
    "q_window_frame" -> qWindowFrameOracle,
    "q_window_lag" -> qWindowLagOracle,
    "q_window_analytic" -> qWindowAnalyticOracle,
    "q_sort_topk" -> qSortTopkOracle,
    "q_set_union" -> qSetUnionOracle,
    "q_set_ops_all" -> qSetOpsAllOracle,
    "q_agg_trend" -> qAggTrendOracle,
    "q_set_intersect" -> qSetIntersectOracle,
    "q_set_except" -> qSetExceptOracle
  )
}
