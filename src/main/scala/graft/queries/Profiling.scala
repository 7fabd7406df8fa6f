package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables

/** Data-profiling operators — the "what's in this table" pass every
  * pipeline runs before trusting 100 TB of parquet: per-column
  * stats and value histograms, both oracle-checked.
  *
  * Scale: q_profile_stats is ONE aggregation job over the scan (the
  * exact distinct counts expand map-side; at petabyte scale you'd swap
  * approx_count_distinct — the declared-approximate twin pattern used
  * by q_agg_approx). q_profile_hist is a plain groupBy on a derived
  * bin key — partial counts combine map-side, the shuffle carries one
  * row per bin per partition.
  */
object Profiling {

  /** Per-column profile of lineitem's money/rate columns: row count,
    * nulls, exact distinct count, min/max. One pass; the row-per-column
    * shape comes from exploding an array of structs built on the single
    * aggregate row (no re-scan per column). */
  def qProfileStats(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
          count_distinct(col(c)).as(s"${c}_distinct"),
          min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max"))
      }
    Tables.lineitem(s, dir)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"${c}_nulls").cast(LongType).as("n_nulls"),
        col(s"${c}_distinct").cast(LongType).as("n_distinct"),
        col(s"${c}_min").cast(DoubleType).as("min_val"),
        col(s"${c}_max").cast(DoubleType).as("max_val"))): _*)).as("r"))
      .select("r.*")
      .orderBy("col_name")
  }

  private val qProfileStatsOracle = {
    def row(c: String) =
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(MIN($c) AS DOUBLE) AS min_val, CAST(MAX($c) AS DOUBLE) AS max_val
         |FROM lineitem""".stripMargin
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(row).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Equal-width value histogram of l_extendedprice (fixed 10k-wide
    * bins — fixed bounds keep it one pass; data-driven bounds would be
    * the standard two-pass variant). The 2-decimal money values divide
    * a power-of-ten width exactly, so the floor is cross-engine
    * deterministic. */
  def qProfileHist(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(floor(col("l_extendedprice") / 10000).cast(LongType).as("bin"))
      .agg(count(lit(1)).as("n"),
        QueryUtil.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("bin")

  private val qProfileHistOracle =
    s"""SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bin,
       |  COUNT(*) AS n, ${QueryUtil.dsumSql("l_extendedprice")} AS sum_price
       |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin

  /** Winsorized (5–95% trimmed) per-group profile: exact percentile
    * bounds, outlier counts on each side, and the trimmed decimal sum /
    * mean. Numeric-outlier clipping is the tabular sibling of text
    * quality filtering.
    *
    * Determinism: the bounds are interpolated doubles that both engines
    * compute identically (percentile ≡ quantile_cont, proven by
    * q_agg_percentile); comparisons against them are exact; the trimmed
    * sum converts to DECIMAL before adding (order-independent), so no
    * double accumulation anywhere.
    *
    * Scale: exact per-group percentiles need a per-group sort (the
    * documented verification form — the at-scale twin substitutes
    * approx_percentile's mergeable sketch); the bounds table is one row
    * per group and broadcasts back onto the scan. */
  def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // round-20 optimization: both bounds from ONE percentile(...,
    // array(0.05, 0.95)) aggregate — one value-count buffer + one
    // per-group sort instead of two; same type-7 interpolation from the
    // same counts, so lo/hi are bit-identical (q_agg_percentile note).
    val bounds = li.groupBy(col("l_returnflag")).agg(
        expr("percentile(l_extendedprice, array(0.05D, 0.95D))").as("_b"))
      .select(col("l_returnflag"),
        col("_b").getItem(0).as("lo"), col("_b").getItem(1).as("hi"))
    val price = col("l_extendedprice")
    li.join(broadcast(bounds), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(price < col("lo"), 1L).otherwise(0L)).as("n_below"),
        sum(when(price > col("hi"), 1L).otherwise(0L)).as("n_above"),
        min(col("lo")).as("lo"),
        min(col("hi")).as("hi"),
        QueryUtil.dsumIf(price >= col("lo") && price <= col("hi"), price)
          .as("trimmed_sum"),
        round(QueryUtil.dsumIf(price >= col("lo") && price <= col("hi"), price) /
          sum(when(price >= col("lo") && price <= col("hi"), 1L).otherwise(0L)), 4)
          .as("trimmed_mean"))
      .orderBy("l_returnflag")
  }

  private val qWinsorizeOracle =
    s"""WITH b AS (
      |  SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.05) AS lo,
      |    quantile_cont(l_extendedprice, 0.95) AS hi
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l.l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
      |  CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
      |  MIN(lo) AS lo, MIN(hi) AS hi,
      |  ${QueryUtil.dsumIfSql("l_extendedprice >= lo AND l_extendedprice <= hi",
           "l_extendedprice")} AS trimmed_sum,
      |  round(${QueryUtil.dsumIfSql("l_extendedprice >= lo AND l_extendedprice <= hi",
           "l_extendedprice")} /
      |    SUM(CASE WHEN l_extendedprice >= lo AND l_extendedprice <= hi THEN 1 ELSE 0 END), 4)
      |    AS trimmed_mean
      |FROM lineitem l JOIN b USING (l_returnflag)
      |GROUP BY l.l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Equi-depth histogram: ntile(10) over the total price order splits
    * the column into equal-count buckets with data-driven bounds — the
    * twin of q_profile_hist's equal-width bins. ntile's remainder rule
    * (first `n mod k` buckets get the extra row) is standard SQL, and
    * the order key is made total with the row's unique id, so bucket
    * assignment is cross-engine exact.
    *
    * Scale: the global ntile window is a single-partition sort — the
    * exact verification form (same pattern as q_agg_percentile). At
    * 100 TB substitute approx_percentile bucket BOUNDS (mergeable
    * sketch, q_agg_percentile_approx) and assign buckets map-side by
    * comparing against the broadcast bounds. */
  def qHistEquidepth(s: SparkSession, dir: String, buckets: Int = 10): DataFrame = {
    val order = Window.orderBy(
      col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, dir)
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("bucket", ntile(buckets).over(order).cast(LongType))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"),
        QueryUtil.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("bucket")
  }

  private val qHistEquidepthOracle =
    s"""WITH b AS (
       |  SELECT l_extendedprice,
       |    ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bucket
       |  FROM lineitem)
       |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
       |  MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
       |  ${QueryUtil.dsumSql("l_extendedprice")} AS sum_price
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Scale-safe equi-depth histogram — the 100 TB form of
    * [[qHistEquidepth]]. The global-ntile twin is the exact verification
    * form but funnels the whole table through ONE task (a single-
    * partition window sort); this form never materializes a global
    * order:
    *
    *  1. ONE aggregation computes the k-1 interior split points with
    *     `approx_percentile` — a mergeable KLL-style sketch, combined
    *     map-side like any partial aggregate;
    *  2. the 1-row bounds frame broadcasts back onto the scan and each
    *     row bins itself map-side against the (tiny) splits array;
    *  3. one combine-friendly groupBy over k groups.
    *
    * Shuffle volume: k-1 doubles for the sketch merge + k rows per
    * partition for the final groupBy — independent of corpus size.
    * Bucket depths are approximate within the sketch's rank error
    * (≤ n/accuracy per bound; ProfilingApproxSpec bounds the realized
    * skew vs the exact ntile twin); declared rows-only per the driver
    * contract, like q_agg_percentile_approx. */
  def qHistEquidepthApprox(s: SparkSession, dir: String, buckets: Int = 10,
                           accuracy: Int = 10000): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_extendedprice"))
    val probs = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = li.agg(expr(
      s"approx_percentile(l_extendedprice, array(${probs.mkString(",")}), $accuracy)")
      .as("splits"))
    li.join(broadcast(bounds))
      .withColumn("bucket",
        (size(filter(col("splits"), b => col("l_extendedprice") > b)) + 1)
          .cast(LongType))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"),
        QueryUtil.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("bucket")
  }

  /** The registry form of [[qHistEquidepthApprox]], oracle-GATED
    * (round-14, the q_agg_percentile_approx rank-bracket move): each of
    * the k−1 sketch split points must honor the published GK rank
    * contract — its exact rank sits within n/accuracy of the target
    * rank i·n/k. One extra counting aggregation (strictly-below /
    * at-or-below per split, 2(k−1) combine-friendly sums in ONE pass)
    * feeds [[Relational.rankOk]]'s exact integer interval check; the
    * DuckDB oracle is the all-ones relation over range(1,k), so the
    * hash gate passes iff every split honors its bound. A sketch
    * regression produces a 0 flag and FAILS the entry — this is what
    * moves the entry from `no_oracle`-by-contract to driver-gated.
    * At 100 TB the histogram itself ([[qHistEquidepthApprox]]) is the
    * production form; this gate adds one counting pass (shuffle: 2(k−1)
    * longs per partition) and is what a nightly validation executes. */
  def qHistEquidepthApproxGated(s: SparkSession, dir: String,
      buckets: Int = 10, accuracy: Int = 10000): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_extendedprice"))
    val probs = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = li.agg(expr(
      s"approx_percentile(l_extendedprice, array(${probs.mkString(",")}), $accuracy)")
      .as("splits"))
    val aggs = (1 until buckets).flatMap { i =>
      val sp = col("splits").getItem(i - 1)
      Seq(sum(when(col("l_extendedprice") < sp, 1L).otherwise(0L)).as(s"b$i"),
        sum(when(col("l_extendedprice") <= sp, 1L).otherwise(0L)).as(s"a$i"))
    } :+ count(lit(1)).as("n")
    val counts = li.join(broadcast(bounds)).agg(aggs.head, aggs.tail: _*)
    // p = i/k = (20·i/k)/20 exactly when k divides 20·i — true for
    // k=10 (pNum20 = 2i); guard so a non-divisor bucket count can't
    // silently shift the target rank
    require(20 % buckets == 0, s"buckets must divide 20, got $buckets")
    counts.select(explode(array((1 until buckets).map { i =>
        struct(lit(i.toLong).as("split_idx"),
          Relational.rankOk(col(s"b$i"), col(s"a$i"), col("n"),
            20L * i / buckets, accuracy.toLong).as("ok_rank"),
          col("n").as("n"))
      }: _*)).as("r"))
      .select(col("r.split_idx"), col("r.ok_rank"), col("r.n"))
      .orderBy("split_idx")
  }

  private val qHistEquidepthApproxGatedOracle =
    """SELECT CAST(i AS BIGINT) AS split_idx,
      |  CAST(1 AS BIGINT) AS ok_rank,
      |  (SELECT COUNT(*) FROM lineitem) AS n
      |FROM range(1, 10) t(i) ORDER BY split_idx""".stripMargin

  /** Scale-safe winsorized profile — the 100 TB form of [[qWinsorize]]:
    * identical output shape, but the per-group 5/95% bounds come from
    * `approx_percentile`'s mergeable sketch instead of the exact
    * `percentile` aggregate (which buffers a per-group value map). The
    * bounds stage becomes an ordinary partial-aggregating groupBy; the
    * rest (broadcast bounds back, one trim pass) is unchanged.
    * Approximate bounds move only rows within the sketch's rank error
    * of the cut points, so the trimmed sum differs from the exact twin
    * by a bounded sliver (ProfilingApproxSpec pins it); declared
    * rows-only per the driver contract. */
  def qWinsorizeApprox(s: SparkSession, dir: String,
                       accuracy: Int = 10000): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // one GK digest per group, both bounds read from it (round 21,
    // guide §1.2): the two single-fraction calls built two identical
    // sketches over the same column — same insertions, same accuracy,
    // so the array form's values are bit-identical
    val bounds = li.groupBy(col("l_returnflag")).agg(
        expr(s"approx_percentile(l_extendedprice, array(0.05D, 0.95D), $accuracy)")
          .as("_b"))
      .select(col("l_returnflag"), col("_b")(0).as("lo"), col("_b")(1).as("hi"))
    val price = col("l_extendedprice")
    li.join(broadcast(bounds), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(price < col("lo"), 1L).otherwise(0L)).as("n_below"),
        sum(when(price > col("hi"), 1L).otherwise(0L)).as("n_above"),
        min(col("lo")).cast(DoubleType).as("lo"),
        min(col("hi")).cast(DoubleType).as("hi"),
        QueryUtil.dsumIf(price >= col("lo") && price <= col("hi"), price)
          .as("trimmed_sum"),
        round(QueryUtil.dsumIf(price >= col("lo") && price <= col("hi"), price) /
          sum(when(price >= col("lo") && price <= col("hi"), 1L).otherwise(0L)), 4)
          .as("trimmed_mean"))
      .orderBy("l_returnflag")
  }

  /** The registry form of [[qWinsorizeApprox]], oracle-GATED (round-14):
    * the per-group 5 %/95 % sketch bounds must honor the GK rank
    * contract exactly — `[below+1, at_or_below]` of each returned bound
    * intersects `[p·n_g − n_g/acc − 1, p·n_g + n_g/acc + 1]` in integer
    * arithmetic (p = 1/20 and 19/20 — exact twentieths, no float in the
    * decision). Same plan shape as the production trim pass: the ≤|groups|
    * bounds row broadcasts back onto the scan, one combine-friendly
    * counting aggregation per group. The DuckDB oracle is the all-ones
    * relation with exact group counts — a sketch regression FAILS the
    * hash gate instead of hiding behind a declared error bound. */
  def qWinsorizeApproxGated(s: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
    // fused bounds sketch — see qWinsorizeApprox's round-21 note
    val bounds = li.groupBy(col("l_returnflag")).agg(
        expr(s"approx_percentile(l_extendedprice, array(0.05D, 0.95D), $accuracy)")
          .as("_b"))
      .select(col("l_returnflag"), col("_b")(0).as("lo"), col("_b")(1).as("hi"))
    val price = col("l_extendedprice")
    li.join(broadcast(bounds), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(price < col("lo"), 1L).otherwise(0L)).as("bl"),
        sum(when(price <= col("lo"), 1L).otherwise(0L)).as("al"),
        sum(when(price < col("hi"), 1L).otherwise(0L)).as("bh"),
        sum(when(price <= col("hi"), 1L).otherwise(0L)).as("ah"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        Relational.rankOk(col("bl"), col("al"), col("n"), 1L,
          accuracy.toLong).as("ok_lo"),
        Relational.rankOk(col("bh"), col("ah"), col("n"), 19L,
          accuracy.toLong).as("ok_hi"),
        col("n"))
      .orderBy("l_returnflag")
  }

  private val qWinsorizeApproxGatedOracle =
    """SELECT l_returnflag,
      |  CAST(1 AS BIGINT) AS ok_lo,
      |  CAST(1 AS BIGINT) AS ok_hi,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Data-quality audit — the constraint-validation pass a production
    * pipeline gates every load on: key uniqueness, referential
    * integrity, domain and range rules, null contracts. One row per
    * check with checked/violation counts (the synthetic corpus
    * genuinely violates lineitem's (orderkey, linenumber) uniqueness,
    * so the audit demonstrably fires, while the FK and range checks
    * demonstrably pass — both outcomes under the oracle gate).
    *
    * Scale: all per-table rules FUSE into one aggregation pass per
    * table (the qProfileStats shape — counters as parallel aggregates,
    * then one explode to check-per-row); referential integrity is one
    * anti-join count against the (broadcastable) dimension. Adding a
    * rule adds a counter, never a pass. */
  def qDqAudit(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    def viol(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))
    val liChecks = li.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - count_distinct(struct(col("l_orderkey"), col("l_linenumber"))))
        .as("pk_viol"),
      viol(col("l_quantity") < 1.0 || col("l_quantity") > 50.0).as("qty_viol"),
      viol(col("l_discount") < 0.0 || col("l_discount") > 0.1).as("disc_viol"))
    val ordChecks = ord.agg(
      count(lit(1)).as("n"),
      viol(col("o_orderdate").isNull).as("date_null"),
      viol(!col("o_orderstatus").isin("F", "O", "P")).as("status_viol"))
    val fkViol = ord.join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("fk_viol"))
    def row(name: String, checked: Column, violations: Column): Column =
      struct(lit(name).as("check_name"),
        checked.cast(LongType).as("n_checked"),
        violations.cast(LongType).as("n_violations"))
    val liRows = liChecks.select(explode(array(
      row("lineitem_pk_unique", col("n"), col("pk_viol")),
      row("lineitem_quantity_range", col("n"), col("qty_viol")),
      row("lineitem_discount_range", col("n"), col("disc_viol")))).as("r"))
    val ordRows = ordChecks.select(explode(array(
      row("orders_date_not_null", col("n"), col("date_null")),
      row("orders_status_domain", col("n"), col("status_viol")))).as("r"))
    val fkRows = fkViol.crossJoin(ord.agg(count(lit(1)).as("n")))
      .select(row("orders_fk_customer", col("n"), col("fk_viol")).as("r"))
    liRows.unionByName(ordRows).unionByName(fkRows)
      .select(col("r.check_name"), col("r.n_checked"), col("r.n_violations"))
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("check_name")
  }

  private val qDqAuditOracle =
    """WITH checks AS (
      |  SELECT 'lineitem_pk_unique' AS check_name,
      |    (SELECT COUNT(*) FROM lineitem) AS n_checked,
      |    (SELECT COUNT(*) FROM lineitem) -
      |      (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
      |        FROM lineitem)) AS n_violations
      |  UNION ALL
      |  SELECT 'lineitem_quantity_range',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT CAST(SUM(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
      |      THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)
      |  UNION ALL
      |  SELECT 'lineitem_discount_range',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 0.1
      |      THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)
      |  UNION ALL
      |  SELECT 'orders_date_not_null',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) FROM orders)
      |  UNION ALL
      |  SELECT 'orders_status_domain',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P')
      |      THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
      |  UNION ALL
      |  SELECT 'orders_fk_customer',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS (
      |      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)))
      |SELECT check_name, n_checked, n_violations,
      |  n_violations = 0 AS passed
      |FROM checks ORDER BY check_name""".stripMargin

  /** Two-sample distribution DRIFT report — the data-shift monitor a
    * training pipeline runs between corpus snapshots: lineitem's
    * quantity distribution in the early half (shipdate < 1996-01-01)
    * vs the late half, per bin. Each bin reports both counts and its
    * cross-multiplied chi-square-family contribution
    * `(n_early·N_late − n_late·N_early)² / (N_early·N_late·(n_early+n_late))`
    * — zero when the bin's share is identical across samples, growing
    * with divergence. The report is PER-BIN (ranked by contribution),
    * deliberately not a float total: a sum of per-bin doubles is
    * addition-order-dependent across engines, while each bin's single
    * fixed-order float expression is bit-exact (the same discipline as
    * q_tfidf's score). Integer counts everywhere else.
    *
    * Scale: one combine-friendly (bin, half) count aggregation over the
    * scan; the totals arrive as a broadcast 1-row aggregate; the float
    * expression evaluates once per bin — 50 rows here, bounded by the
    * value domain at any corpus size. */
  def qProfileDrift(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_quantity").cast(LongType).as("bin"),
      when(col("l_shipdate") < lit("1996-01-01").cast("timestamp_ntz"), 1L)
        .otherwise(0L).as("early"))
    val perBin = li.groupBy("bin").agg(
      sum(col("early")).as("n_early"),
      sum(lit(1L) - col("early")).as("n_late"))
    val totals = perBin.agg(sum(col("n_early")).as("tot_early"),
      sum(col("n_late")).as("tot_late"))
    perBin.crossJoin(broadcast(totals))
      .select(col("bin"),
        col("n_early").cast(LongType).as("n_early"),
        col("n_late").cast(LongType).as("n_late"),
        round(
          (col("n_early").cast(DoubleType) * col("tot_late").cast(DoubleType) -
            col("n_late").cast(DoubleType) * col("tot_early").cast(DoubleType)) *
            (col("n_early").cast(DoubleType) * col("tot_late").cast(DoubleType) -
              col("n_late").cast(DoubleType) * col("tot_early").cast(DoubleType)) /
            (col("tot_early").cast(DoubleType) * col("tot_late").cast(DoubleType) *
              (col("n_early") + col("n_late")).cast(DoubleType)), 6)
          .as("drift_contribution"))
      .orderBy(col("drift_contribution").desc, col("bin"))
  }

  private val qProfileDriftOracle =
    """WITH li AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS bin,
      |    CASE WHEN l_shipdate < TIMESTAMP '1996-01-01' THEN 1 ELSE 0 END
      |      AS early
      |  FROM lineitem),
      |pb AS (
      |  SELECT bin, SUM(early) AS n_early, SUM(1 - early) AS n_late
      |  FROM li GROUP BY bin),
      |t AS (SELECT SUM(n_early) AS tot_early, SUM(n_late) AS tot_late FROM pb)
      |SELECT bin, CAST(n_early AS BIGINT) AS n_early,
      |  CAST(n_late AS BIGINT) AS n_late,
      |  round(
      |    (CAST(n_early AS DOUBLE) * CAST(tot_late AS DOUBLE) -
      |      CAST(n_late AS DOUBLE) * CAST(tot_early AS DOUBLE)) *
      |    (CAST(n_early AS DOUBLE) * CAST(tot_late AS DOUBLE) -
      |      CAST(n_late AS DOUBLE) * CAST(tot_early AS DOUBLE)) /
      |    (CAST(tot_early AS DOUBLE) * CAST(tot_late AS DOUBLE) *
      |      CAST(n_early + n_late AS DOUBLE)), 6) AS drift_contribution
      |FROM pb CROSS JOIN t
      |ORDER BY drift_contribution DESC, bin""".stripMargin

  /** Snapshot DIFF — the reconciliation report between two versions of
    * a keyed table (nightly load vs yesterday's): every key classifies
    * as added / removed / changed / unchanged via ONE full-outer join
    * on the snapshot key, and the report carries counts plus an exact
    * integer key-sum checksum per class (a dropped or double-counted
    * row moves the checksum even when counts collide). The snapshots
    * derive deterministically from lineitem (old = keys outside the
    * %17 stripe; new = outside the %19 stripe, quantity bumped on the
    * %13 stripe), so both engines build identical inputs.
    *
    * Scale: the full-outer join shuffles both snapshots on the key —
    * the canonical reconciliation shape; at 100 TB both sides are
    * bucketed/partitioned by the same key and the join co-locates. The
    * report aggregation is 4 groups, combine-friendly. */
  def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(LongType).as("q"))
    val old = li.filter(pmod(col("l_orderkey"), lit(17)) =!= 0)
      .select(col("l_orderkey").as("k1"), col("l_linenumber").as("k2"),
        col("q").as("q_old"))
    val neu = li.filter(pmod(col("l_orderkey"), lit(19)) =!= 0)
      .select(col("l_orderkey").as("k1"), col("l_linenumber").as("k2"),
        (col("q") + when(pmod(col("l_orderkey"), lit(13)) === 0, 1L)
          .otherwise(0L)).as("q_new"))
    old.join(neu, Seq("k1", "k2"), "full_outer")
      .select(col("k1"),
        when(col("q_old").isNull, "added")
          .when(col("q_new").isNull, "removed")
          .when(col("q_old") =!= col("q_new"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        sum(col("k1")).cast(LongType).as("sum_keys"))
      .orderBy("status")
  }

  private val qSnapshotDiffOracle =
    """WITH li AS (
      |  SELECT l_orderkey AS k1, l_linenumber AS k2,
      |    CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem),
      |o AS (SELECT k1, k2, q AS q_old FROM li WHERE k1 % 17 <> 0),
      |n AS (SELECT k1, k2,
      |    q + CASE WHEN k1 % 13 = 0 THEN 1 ELSE 0 END AS q_new
      |  FROM li WHERE k1 % 19 <> 0),
      |j AS (
      |  SELECT COALESCE(o.k1, n.k1) AS k1,
      |    CASE WHEN o.k1 IS NULL THEN 'added'
      |         WHEN n.k1 IS NULL THEN 'removed'
      |         WHEN o.q_old <> n.q_new THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM o FULL OUTER JOIN n ON o.k1 = n.k1 AND o.k2 = n.k2)
      |SELECT status, COUNT(*) AS n, CAST(SUM(k1) AS BIGINT) AS sum_keys
      |FROM j GROUP BY status ORDER BY status""".stripMargin

  /** Sketch-MERGE distinct counting (DataSketches HLL, lgK=12) — the
    * 100 TB distinct-count pattern: each shard builds its own sketch
    * (one shuffle row of ~KBs per shard, never the values), and the
    * sketches union into the corpus estimate — per-day/per-shard
    * sketches can be stored and re-aggregated forever without touching
    * raw data.
    *
    * The contract this entry pins is measured, not assumed — and it is
    * the ε-BOUND, not bit-equality. Two determinism hazards measured on
    * a 997-distinct column: (1) a DataSketches HLL that was never
    * unioned estimates via its HIP accumulator, but ANY union drops to
    * the composite (register-only) estimator — 1-partition direct 1001
    * vs unioned 996; (2) even the union path shifts at the ~0.3 % level
    * with the aggregation TREE SHAPE (1007 vs 1010 for the same value
    * set under different shuffle-partition configs — intermediate
    * union gadgets serialize through HLL_4 conversions between partial
    * and final aggregation, and that round-trip is shape-sensitive).
    * So the honest re-aggregation contract is: any sharding/partition
    * layout yields an estimate within the sketch's ε of truth and
    * within ~1 % of any other layout's estimate; sparse-regime (small
    * set) estimates are exact. HllMergeSpec pins all three plus the
    * lgK=12 bound (~1.04/√2¹² ≈ 1.6 %; realized error rides along in
    * `err_bp`).
    *
    * Declared-approximate entry (`no_oracle`): DuckDB's approx_distinct
    * is a different HLL implementation, so cross-engine hash equality
    * is impossible by construction; `n_exact` (one countDistinct at sf
    * scale) is the in-row exact twin. */
  def qAggHllMerge(s: SparkSession, dir: String, shards: Int = 8): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val merged = li
      .groupBy(pmod(col("l_orderkey"), lit(shards)).as("shard"))
      .agg(expr("hll_sketch_agg(l_partkey, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_merged"))
    val exact = li.agg(countDistinct(col("l_partkey")).as("n_exact"))
    merged.crossJoin(broadcast(exact))
      .select(
        col("est_merged").cast(LongType).as("est_merged"),
        col("n_exact"),
        (abs(col("est_merged") - col("n_exact")) * 10000 /
          col("n_exact")).cast(LongType).as("err_bp"))
  }

  /** The registry form of [[qAggHllMerge]], oracle-GATED (round-14,
    * the q_agg_percentile_approx recipe): the raw merged estimate is
    * tree-shape-sensitive (~0.3 % across partition layouts — measured,
    * see the scaladoc above) and a different engine's HLL can never
    * hash-match it, but the ε-CONTRACT — the merged estimate lands
    * within 5 % of the exact distinct count (lgK=12 ⇒ σ ≈ 1.6 %, so
    * 5 % ≈ 3σ, and every measured layout sits well inside) — is an
    * exact integer check (|est−exact|·20 ≤ exact) that is STABLE
    * across layouts precisely because all of them honor the bound.
    * DuckDB mirrors the exact count and the all-ones flag; a merge
    * regression (a union that loses registers) hash-fails the entry.
    * Production form stays the sketch-only merge; this gate adds the
    * one exact countDistinct a nightly validation run executes. */
  def qAggHllMergeGated(s: SparkSession, dir: String,
      shards: Int = 8): DataFrame =
    qAggHllMerge(s, dir, shards)
      .select(col("n_exact"),
        when(abs(col("est_merged") - col("n_exact")) * 20 <= col("n_exact"), 1L)
          .otherwise(0L).as("ok_eps"))

  private val qAggHllMergeGatedOracle =
    """SELECT COUNT(DISTINCT l_partkey) AS n_exact,
      |  CAST(1 AS BIGINT) AS ok_eps
      |FROM lineitem""".stripMargin

  /** Pearson correlation matrix over lineitem's numeric measures —
    * the dependency-structure profile (is discount coupled to quantity?
    * price to quantity?) a feature-engineering pass reads before
    * trusting a column as an independent signal. HASH-EXACT across
    * engines, which a naive `corr()` cannot be (its running-moment
    * accumulation is order-dependent float): every input is integer
    * CENTS, all five sums and three cross-sums are exact decimal
    * integer aggregation (the q_embed_covariance discipline), and the
    * final correlation formula is the SAME IEEE op sequence in both
    * engines over those exact integers — deterministic at any
    * parallelism. Cross-products stay in per-row long range (≤ 10¹⁴)
    * and sum in a DECIMAL(35,0) buffer. One caveat sets the contract
    * precision: past ~10⁵ rows the exact sums exceed 2⁵³, and the
    * decimal→double cast is correctly rounded in the JVM but composed
    * of two roundings in DuckDB's hugeint path — a possible last-ulp
    * disagreement (observed at sf0.1). The reported correlations are
    * therefore ROUNDED TO 12 DECIMALS, which the ±1-ulp cast fuzz on
    * an O(10⁻³) correlation can never reach across.
    *
    * Scale: ONE aggregation job, fully map-side combinable — nine
    * numbers per partition reach the reduce, corpus-size-independent.
    * The scale invariance of Pearson r absorbs the cents scaling. */
  def qProfileCorr(s: SparkSession, dir: String): DataFrame = {
    import QueryUtil.cents
    def big(c: Column) = c.cast(org.apache.spark.sql.types.DecimalType(25, 0))
    val q = cents(col("l_quantity"))
    val p = cents(col("l_extendedprice"))
    val d = cents(col("l_discount"))
    val agged = Tables.lineitem(s, dir).agg(
      count(lit(1)).cast(DoubleType).as("n"),
      sum(big(q)).cast(DoubleType).as("sq"),
      sum(big(p)).cast(DoubleType).as("sp"),
      sum(big(d)).cast(DoubleType).as("sd"),
      sum(big(q * q)).cast(DoubleType).as("sqq"),
      sum(big(p * p)).cast(DoubleType).as("spp"),
      sum(big(d * d)).cast(DoubleType).as("sdd"),
      sum(big(q * p)).cast(DoubleType).as("sqp"),
      sum(big(q * d)).cast(DoubleType).as("sqd"),
      sum(big(p * d)).cast(DoubleType).as("spd"))
    def corr2(sxy: Column, sx: Column, sy: Column,
              sxx: Column, syy: Column): Column =
      (col("n") * sxy - sx * sy) /
        (sqrt(col("n") * sxx - sx * sx) * sqrt(col("n") * syy - sy * sy))
    agged.select(
      col("n").cast(LongType).as("n_rows"),
      round(corr2(col("sqp"), col("sq"), col("sp"), col("sqq"), col("spp")),
        12).as("corr_qty_price"),
      round(corr2(col("sqd"), col("sq"), col("sd"), col("sqq"), col("sdd")),
        12).as("corr_qty_disc"),
      round(corr2(col("spd"), col("sp"), col("sd"), col("spp"), col("sdd")),
        12).as("corr_price_disc"))
  }

  private val qProfileCorrOracle = {
    def c(e: String) = QueryUtil.centsSql(e)
    def big(e: String) = s"CAST($e AS DECIMAL(25,0))"
    def s2(e: String) = s"CAST(SUM(${big(e)}) AS DOUBLE)"
    val q = c("l_quantity"); val p = c("l_extendedprice"); val d = c("l_discount")
    def corr2(sxy: String, sx: String, sy: String, sxx: String, syy: String) =
      s"ROUND((n * $sxy - $sx * $sy) / (sqrt(n * $sxx - $sx * $sx) * sqrt(n * $syy - $sy * $sy)), 12)"
    s"""WITH a AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${s2(q)} AS sq, ${s2(p)} AS sp, ${s2(d)} AS sd,
       |    ${s2(s"($q) * ($q)")} AS sqq, ${s2(s"($p) * ($p)")} AS spp,
       |    ${s2(s"($d) * ($d)")} AS sdd,
       |    ${s2(s"($q) * ($p)")} AS sqp, ${s2(s"($q) * ($d)")} AS sqd,
       |    ${s2(s"($p) * ($d)")} AS spd
       |  FROM lineitem)
       |SELECT CAST(n AS BIGINT) AS n_rows,
       |  ${corr2("sqp", "sq", "sp", "sqq", "spp")} AS corr_qty_price,
       |  ${corr2("sqd", "sq", "sd", "sqq", "sdd")} AS corr_qty_disc,
       |  ${corr2("spd", "sp", "sd", "spp", "sdd")} AS corr_price_disc
       |FROM a""".stripMargin
  }

  /** Higher-moment profile — per-group skewness and excess kurtosis of
    * the quantity distribution, the tail-shape signal outlier policies
    * and mixture checks read. Same exactness ladder as q_profile_corr,
    * tightened: l_quantity is integral 1..50, so the four power sums
    * (Σx…Σx⁴) stay under 2⁵³ even at 100× this corpus — the
    * decimal→double casts are EXACT, and the moment formulas avoid
    * `pow` entirely (not correctly rounded, engine-divergent): every
    * power is an explicit multiply and m₂^1.5 is m₂·√m₂, so the whole
    * result is bit-identical across engines with NO rounding step.
    *
    * Scale: one combine-friendly aggregation; five numbers per group
    * per partition reach the reduce. */
  def qProfileMoments(s: SparkSession, dir: String): DataFrame = {
    def big(c: Column) = c.cast(org.apache.spark.sql.types.DecimalType(25, 0))
    val x = col("l_quantity").cast(LongType)
    val agged = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast(DoubleType).as("n"),
        sum(big(x)).cast(DoubleType).as("s1"),
        sum(big(x * x)).cast(DoubleType).as("s2"),
        sum(big(x * x * x)).cast(DoubleType).as("s3"),
        sum(big(x * x * x * x)).cast(DoubleType).as("s4"))
    val n = col("n"); val m1 = col("s1") / n
    val m2 = col("s2") / n - m1 * m1
    val m3 = col("s3") / n - lit(3.0) * m1 * (col("s2") / n) +
      lit(2.0) * m1 * m1 * m1
    val m4 = col("s4") / n - lit(4.0) * m1 * (col("s3") / n) +
      lit(6.0) * m1 * m1 * (col("s2") / n) - lit(3.0) * m1 * m1 * m1 * m1
    agged.select(col("l_returnflag"),
      n.cast(LongType).as("n_rows"),
      m1.as("mean_qty"),
      (m3 / (m2 * sqrt(m2))).as("skewness"),
      (m4 / (m2 * m2) - lit(3.0)).as("kurtosis_excess"))
      .orderBy("l_returnflag")
  }

  private val qProfileMomentsOracle =
    """WITH a AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(25,0))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(x * x AS DECIMAL(25,0))) AS DOUBLE) AS s2,
      |    CAST(SUM(CAST(x * x * x AS DECIMAL(25,0))) AS DOUBLE) AS s3,
      |    CAST(SUM(CAST(x * x * x * x AS DECIMAL(25,0))) AS DOUBLE) AS s4
      |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x
      |        FROM lineitem)
      |  GROUP BY l_returnflag),
      |m AS (
      |  SELECT l_returnflag, n, s1 / n AS m1,
      |    s2 / n - (s1 / n) * (s1 / n) AS m2,
      |    s3 / n - 3.0 * (s1 / n) * (s2 / n)
      |      + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
      |    s4 / n - 4.0 * (s1 / n) * (s3 / n)
      |      + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
      |      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      |  FROM a)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows, m1 AS mean_qty,
      |  m3 / (m2 * sqrt(m2)) AS skewness,
      |  m4 / (m2 * m2) - 3.0 AS kurtosis_excess
      |FROM m ORDER BY l_returnflag""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_moments" -> (qProfileMoments _),
    "q_profile_corr" -> (qProfileCorr _),
    "q_agg_hll_merge" -> ((s, d) => qAggHllMergeGated(s, d)),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_profile_drift" -> (qProfileDrift _),
    "q_dq_audit" -> (qDqAudit _),
    "q_profile_stats" -> (qProfileStats _),
    "q_profile_hist" -> (qProfileHist _),
    "q_hist_equidepth" -> ((s, d) => qHistEquidepth(s, d)),
    "q_hist_equidepth_approx" -> ((s, d) => qHistEquidepthApproxGated(s, d)),
    "q_winsorize" -> (qWinsorize _),
    "q_winsorize_approx" -> ((s, d) => qWinsorizeApproxGated(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "q_profile_moments" -> qProfileMomentsOracle,
    "q_profile_corr" -> qProfileCorrOracle,
    "q_snapshot_diff" -> qSnapshotDiffOracle,
    "q_profile_drift" -> qProfileDriftOracle,
    "q_dq_audit" -> qDqAuditOracle,
    "q_profile_stats" -> qProfileStatsOracle,
    "q_profile_hist" -> qProfileHistOracle,
    "q_hist_equidepth" -> qHistEquidepthOracle,
    "q_hist_equidepth_approx" -> qHistEquidepthApproxGatedOracle,
    "q_agg_hll_merge" -> qAggHllMergeGatedOracle,
    "q_winsorize" -> qWinsorizeOracle,
    "q_winsorize_approx" -> qWinsorizeApproxGatedOracle
  )
}
