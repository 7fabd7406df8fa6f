package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables
import graft.queries.QueryUtil._

/** Event-stream analytics in batch form (SURVEY.md §2.D). The tumbling
  * window uses Spark's `window()` — the exact construct a Structured
  * Streaming job would use with a watermark, so the batch query IS the
  * streaming query's correctness twin (the live streaming variant runs
  * in graft.streaming.Sessionize / StreamingSpec).
  *
  * Session arithmetic runs on the raw nanosecond longs (`ts`), keeping
  * every comparison integer-exact in both engines.
  */
object Events {

  /** Tumbling 1-hour aggregation via window(). */
  def qEventsTumble(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts_ts"), "1 hour").getField("start").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("sum_value"))
      .orderBy("hour", "event_type")

  private val qEventsTumbleOracle =
    s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
       |  COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       |  ${dsumSql("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** CUSUM changepoint detection per event type — "did the hourly rate
    * shift, and when": the cumulative sum of centered hourly counts
    * (scaled by the hour count H so everything stays in INTEGERS:
    * `cusum_h = Σ_{i≤h} (H·c_i − total)`, which starts and ends at 0
    * and peaks in magnitude at the most likely rate changepoint). The
    * report row per type is the argmax-|cusum| hour (earliest on
    * ties) — exact integer arithmetic end-to-end, no mean, no float.
    *
    * Scale: one combine-friendly (type, hour) count aggregation, then
    * ALL windows (prefix sum + argmax) run over the type×hours
    * relation — bounded by the time range, never by event volume. One
    * shuffle carries everything. */
  def qEventsCusum(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        window(col("ts_ts"), "1 hour").getField("start").as("hour"))
      .agg(count(lit(1)).as("c"))
    val byType = Window.partitionBy(col("event_type"))
    val prefix = byType.orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val scored = hourly
      .withColumn("h_cnt", count(lit(1)).over(byType))
      .withColumn("total", sum(col("c")).over(byType))
      .withColumn("cusum",
        sum(col("h_cnt") * col("c") - col("total")).over(prefix))
    scored
      .withColumn("rk", row_number().over(byType.orderBy(
        abs(col("cusum")).desc, col("hour").asc)))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("hour").as("change_hour"),
        col("cusum").cast(LongType).as("peak_cusum"),
        col("h_cnt").cast(LongType).as("n_hours"),
        col("total").cast(LongType).as("n_events"))
      .orderBy("event_type")
  }

  private val qEventsCusumOracle =
    """WITH hourly AS (
      |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, hour, c,
      |    COUNT(*) OVER (PARTITION BY event_type) AS h_cnt,
      |    SUM(c) OVER (PARTITION BY event_type) AS total
      |  FROM hourly),
      |s AS (
      |  SELECT event_type, hour, h_cnt, total,
      |    SUM(h_cnt * c - total) OVER (PARTITION BY event_type
      |      ORDER BY hour ROWS UNBOUNDED PRECEDING) AS cusum
      |  FROM t),
      |r AS (
      |  SELECT event_type, hour, cusum, h_cnt, total,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY abs(cusum) DESC, hour ASC) AS rk
      |  FROM s)
      |SELECT event_type, hour AS change_hour,
      |  CAST(cusum AS BIGINT) AS peak_cusum,
      |  CAST(h_cnt AS BIGINT) AS n_hours, CAST(total AS BIGINT) AS n_events
      |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin

  /** Batch sessionization: a session breaks after a 30-minute gap.
    * Window lag → gap flag → running sum = session sequence — the
    * classic shuffle-once pattern (one partition-by-user sort carries
    * lag, running sum AND the final group-by). */
  def qEventsSessions(s: SparkSession, dir: String): DataFrame = {
    // µs granularity: DuckDB collapses TIMESTAMP_NS to µs through views,
    // so both engines compare at epoch-µs (floor division of the nanos).
    val gapUs = 30L * 60 * 1000000L
    val tus = expr("ts div 1000")
    val w = Window.partitionBy(col("user_id")).orderBy(tus, col("event_id"))
    val prev = lag(tus, 1).over(w)
    Tables.events(s, dir)
      .withColumn("new_session",
        when(prev.isNull || tus - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(tus).cast(LongType).as("start_us"),
        max(tus).cast(LongType).as("end_us"))
      .orderBy("user_id", "session_seq")
  }

  private val qEventsSessionsOracle =
    """WITH g AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tus,
      |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
      |      OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |), s AS (
      |  SELECT user_id, event_id, tus,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM g
      |)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
      |  MIN(tus) AS start_us, MAX(tus) AS end_us
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** Sliding 1-hour windows every 30 minutes via window() — each event
    * lands in two overlapping windows (Spark explodes them; the oracle
    * mirrors with a two-way UNION of epoch-aligned 30-min buckets). */
  def qEventsSliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts_ts"), "1 hour", "30 minutes").getField("start").as("ws"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy("ws", "event_type")

  private val qEventsSlidingOracle =
    s"""WITH w AS (
       |  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS ws,
       |    event_type, value FROM events
       |  UNION ALL
       |  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
       |    - INTERVAL 30 MINUTE, event_type, value FROM events
       |)
       |SELECT ws, event_type, COUNT(*) AS n_events,
       |  ${dsumSql("value")} AS sum_value
       |FROM w GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin

  /** AS-OF join — the classic operator Spark lacks natively, composed
    * from built-ins (preference (a), SURVEY §4.3): tag both sides, union
    * on the shared (key, time) axis, and carry the latest order forward
    * with last(ignoreNulls) over one partition-ordered window — a single
    * shuffle on the key, no per-row range probing, scales like any
    * window aggregation. Each event gets the most recent order (at or
    * before its timestamp) of the same customer. Orders are pre-reduced
    * to one row per (custkey, date) so the match is deterministic;
    * DuckDB's native ASOF LEFT JOIN is the oracle. */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val orders1 = Tables.orders(s, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val oTagged = orders1.select(
      col("o_custkey").as("key"), col("o_orderdate").cast("timestamp").as("t"),
      lit(null).cast(LongType).as("event_id"),
      col("o_orderkey").as("ord_key"), lit(1).as("side"))
    val eTagged = Tables.events(s, dir).select(
      col("user_id").as("key"), col("ts_ts").as("t"),
      col("event_id"), lit(null).cast(LongType).as("ord_key"), lit(0).as("side"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("side").desc) // order rows first on time ties
      .rowsBetween(Window.unboundedPreceding, 0)
    oTagged.unionByName(eTagged)
      .withColumn("matched_orderkey", last(col("ord_key"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("event_id"), col("key").as("user_id"), col("matched_orderkey"))
      .orderBy("event_id")
  }

  private val qAsofJoinOracle =
    """WITH o1 AS (
      |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY o_custkey, o_orderdate
      |)
      |SELECT e.event_id, e.user_id, o1.o_orderkey AS matched_orderkey
      |FROM events e ASOF LEFT JOIN o1
      |  ON e.user_id = o1.o_custkey AND CAST(e.ts AS TIMESTAMP) >= o1.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** NEAREST as-of join: each event matches the temporally closest
    * order of its user, looking BOTH directions (sensor-fusion
    * semantics — q_asof_join's backward-only rule is wrong when the
    * closest reading is just ahead). Same union trick, but ONE
    * partition sort serves two frames: the backward match is
    * last-non-null over (unbounded, current], the forward match is
    * first-non-null over [current, unbounded) — equal-time orders sort
    * before the event (side desc), so they land in the backward frame
    * only. The winner is min |Δt|, ties to backward; all comparisons
    * on integer microseconds.
    *
    * Scale: one shuffle on the join key, one sort, two window frames
    * over it — no self-join, no range blow-up, same cost profile as
    * the backward-only form. */
  def qAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val orders1 = Tables.orders(s, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val oTagged = orders1.select(
      col("o_custkey").as("key"), col("o_orderdate").cast("timestamp").as("t"),
      lit(null).cast(LongType).as("event_id"),
      col("o_orderkey").as("ord_key"), lit(1).as("side"))
    val eTagged = Tables.events(s, dir).select(
      col("user_id").as("key"), col("ts_ts").as("t"),
      col("event_id"), lit(null).cast(LongType).as("ord_key"), lit(0).as("side"))
    val w = Window.partitionBy(col("key")).orderBy(col("t"), col("side").desc)
    val wBk = w.rowsBetween(Window.unboundedPreceding, 0)
    val wFw = w.rowsBetween(0, Window.unboundedFollowing)
    val ordT = when(col("side") === 1, col("t"))
    val dBk = unix_micros(col("t")) - unix_micros(col("bk_t"))
    val dFw = unix_micros(col("fw_t")) - unix_micros(col("t"))
    oTagged.unionByName(eTagged)
      .withColumn("bk_key", last(col("ord_key"), ignoreNulls = true).over(wBk))
      .withColumn("bk_t", last(ordT, ignoreNulls = true).over(wBk))
      .withColumn("fw_key", first(col("ord_key"), ignoreNulls = true).over(wFw))
      .withColumn("fw_t", first(ordT, ignoreNulls = true).over(wFw))
      .filter(col("side") === 0)
      .select(col("event_id"), col("key").as("user_id"),
        when(col("bk_key").isNull, col("fw_key"))
          .when(col("fw_key").isNull, col("bk_key"))
          .when(dBk <= dFw, col("bk_key"))
          .otherwise(col("fw_key")).as("matched_orderkey"),
        when(col("bk_key").isNull && col("fw_key").isNull, lit("none"))
          .when(col("fw_key").isNull, lit("bk"))
          .when(col("bk_key").isNull, lit("fw"))
          .when(dBk <= dFw, lit("bk")).otherwise(lit("fw")).as("dir"))
      .orderBy("event_id")
  }

  private val qAsofNearestOracle =
    """WITH o1 AS (
      |  SELECT o_custkey AS key, CAST(o_orderdate AS TIMESTAMP) AS t,
      |    CAST(NULL AS BIGINT) AS event_id, max(o_orderkey) AS ord_key,
      |    1 AS side
      |  FROM orders GROUP BY o_custkey, o_orderdate),
      |e AS (
      |  SELECT user_id AS key, CAST(ts AS TIMESTAMP) AS t, event_id,
      |    CAST(NULL AS BIGINT) AS ord_key, 0 AS side
      |  FROM events),
      |u AS (SELECT * FROM o1 UNION ALL SELECT * FROM e),
      |m AS (
      |  SELECT *,
      |    last_value(ord_key IGNORE NULLS) OVER wbk AS bk_key,
      |    last_value(CASE WHEN side = 1 THEN t END IGNORE NULLS) OVER wbk AS bk_t,
      |    first_value(ord_key IGNORE NULLS) OVER wfw AS fw_key,
      |    first_value(CASE WHEN side = 1 THEN t END IGNORE NULLS) OVER wfw AS fw_t
      |  FROM u
      |  WINDOW
      |    wbk AS (PARTITION BY key ORDER BY t, side DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wfw AS (PARTITION BY key ORDER BY t, side DESC
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_id, key AS user_id,
      |  CASE WHEN bk_key IS NULL THEN fw_key
      |       WHEN fw_key IS NULL THEN bk_key
      |       WHEN epoch_us(t) - epoch_us(bk_t) <= epoch_us(fw_t) - epoch_us(t)
      |         THEN bk_key ELSE fw_key END AS matched_orderkey,
      |  CASE WHEN bk_key IS NULL AND fw_key IS NULL THEN 'none'
      |       WHEN fw_key IS NULL THEN 'bk'
      |       WHEN bk_key IS NULL THEN 'fw'
      |       WHEN epoch_us(t) - epoch_us(bk_t) <= epoch_us(fw_t) - epoch_us(t)
      |         THEN 'bk' ELSE 'fw' END AS dir
      |FROM m WHERE side = 0 ORDER BY event_id""".stripMargin

  /** Event-type co-occurrence (market-basket over user-hours): which
    * event types happen TOGETHER in the same user's hour, scored by
    * lift = P(a,b)/(P(a)·P(b)) — computed as the exact rational
    * n_ab·N/(n_a·n_b), so no probability ever exists as a float until
    * the final division. The association-mining complement of
    * q_events_transitions' sequential view.
    *
    * Scale: baskets are the deduped (user, hr, type) set — corpus
    * reduces in one combine-friendly distinct; the self-join on
    * (user, hr) produces at most |types|² rows per basket (types is a
    * small fixed vocabulary), and the final relation is |types|²
    * rows. The marginals relation is |types| rows and broadcasts. */
  def qEventsCooccurrence(s: SparkSession, dir: String): DataFrame = {
    val ua = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 3600000000000").as("hr"),
        col("event_type")).distinct()
    // N arrives as a broadcast 1-row aggregate (the scalar-subquery
    // shape q_tfidf uses) — no driver action in query construction
    val nDf = ua.select(col("user_id"), col("hr")).distinct()
      .agg(count(lit(1)).as("n_tot"))
    val marg = ua.groupBy(col("event_type").as("t")).agg(count(lit(1)).as("m"))
    val pairs = ua.select(col("user_id"), col("hr"), col("event_type").as("a"))
      .join(ua.select(col("user_id"), col("hr"), col("event_type").as("b")),
        Seq("user_id", "hr"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(marg.select(col("t").as("a"), col("m").as("n_a"))), "a")
      .join(broadcast(marg.select(col("t").as("b"), col("m").as("n_b"))), "b")
      .crossJoin(broadcast(nDf))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        round((col("n_ab") * col("n_tot")).cast(DoubleType) /
          (col("n_a") * col("n_b")).cast(DoubleType), 6).as("lift"))
      .orderBy("a", "b")
  }

  private val qEventsCooccurrenceOracle =
    """WITH ua AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 3600000000000 AS hr,
      |    event_type
      |  FROM events),
      |n AS (SELECT COUNT(*) AS n FROM (
      |  SELECT DISTINCT user_id, hr FROM ua)),
      |marg AS (SELECT event_type AS t, COUNT(*) AS m FROM ua GROUP BY 1),
      |p AS (
      |  SELECT x.event_type AS a, y.event_type AS b, COUNT(*) AS n_ab
      |  FROM ua x JOIN ua y ON x.user_id = y.user_id AND x.hr = y.hr
      |  WHERE x.event_type < y.event_type
      |  GROUP BY 1, 2)
      |SELECT a, b, n_ab, ma.m AS n_a, mb.m AS n_b,
      |  round(CAST(n_ab * n.n AS DOUBLE) / CAST(ma.m * mb.m AS DOUBLE), 6)
      |    AS lift
      |FROM p
      |JOIN marg ma ON ma.t = a
      |JOIN marg mb ON mb.t = b
      |CROSS JOIN n
      |ORDER BY a, b""".stripMargin

  /** Time-series densification: hourly event counts with the gaps
    * zero-filled — the resample step a metrics/monitoring pipeline
    * needs before windowed models ("no data" must be an explicit 0,
    * not a missing row). The hour spine explodes from a 2-value
    * bounds aggregate and joins back against the (already tiny,
    * one-row-per-hour) counts — the spine is never proportional to
    * the raw corpus, so densification costs one count aggregation
    * regardless of input size. */
  def qEventsDensify(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(window(col("ts_ts"), "1 hour").getField("start").as("hour"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    val spine = counts.agg(min("hour").as("lo"), max("hour").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("hour"))
    spine.join(counts, Seq("hour"), "left")
      .select(col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("hour")
  }

  private val qEventsDensifyOracle =
    s"""WITH c AS (
       |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       |    COUNT(*) AS n_events, ${dsumSql("value")} AS sum_value
       |  FROM events GROUP BY 1),
       |b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM c),
       |s AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b)
       |SELECT s.hour, COALESCE(n_events, 0) AS n_events,
       |  COALESCE(sum_value, 0.0) AS sum_value
       |FROM s LEFT JOIN c USING (hour) ORDER BY hour""".stripMargin

  /** Ordered conversion funnel: view → click → purchase, each step's
    * timestamp strictly AFTER the previous step's first occurrence per
    * user (the sequential-pattern semantics a naive per-type count gets
    * wrong). Three filtered aggregations chained by equi-joins on
    * user_id — each step's survivor set only shrinks, and all
    * comparisons run on the raw nanosecond longs (integer-exact).
    *
    * Scale: step tables are one groupBy each over a type-filtered scan
    * (filter pushed to parquet); the user-id joins shuffle only
    * distinct users, not events. */
  def qEventsFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def firstAfter(eventType: String, prev: DataFrame, prevTs: String, outTs: String) =
      ev.filter(col("event_type") === eventType)
        .join(prev, "user_id")
        .filter(col("ts") > col(prevTs))
        .groupBy(col("user_id")).agg(min(col("ts")).as(outTs))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = firstAfter("click", s1, "t1", "t2")
    val s3 = firstAfter("purchase", s2, "t2", "t3")
    def step(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("step"), col("n_users"))
    step("1_view", s1).unionAll(step("2_click", s2)).unionAll(step("3_purchase", s3))
      .orderBy("step")
  }

  private val qEventsFunnelOracle =
    """WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
      |SELECT '1_view' AS step, COUNT(*) AS n_users FROM s1
      |UNION ALL SELECT '2_click', COUNT(*) FROM s2
      |UNION ALL SELECT '3_purchase', COUNT(*) FROM s3
      |ORDER BY step""".stripMargin

  /** Hour-over-hour cohort retention: of the users active in hour h,
    * how many return in hour h+1. Hours are raw-nanosecond integer
    * divisions (exact both engines); the (user, hour) activity set is
    * deduped once, then self-joined with the hour shifted — the join
    * carries distinct (user, hour) pairs, not events.
    *
    * Scale: the activity set is the corpus' distinct (user, hour)
    * pairs — already the compact form retention dashboards materialize;
    * both the dedup and the shifted self-join shuffle on user_id. */
  def qEventsRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val ua = ev.select(col("user_id"),
      expr("ts div 3600000000000").as("hr")).distinct()
    val counts = ua.groupBy(col("hr")).agg(count(lit(1)).as("n_users"))
    val retained = ua.join(
        ua.select(col("user_id"), (col("hr") - 1).as("hr")), Seq("user_id", "hr"))
      .groupBy(col("hr")).agg(count(lit(1)).as("n_retained"))
    counts.join(retained, Seq("hr"), "left_outer")
      .select(col("hr").cast(LongType).as("hr"), col("n_users"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        round(coalesce(col("n_retained"), lit(0L)).cast("double") /
          col("n_users"), 6).as("retention"))
      .orderBy("hr")
  }

  private val qEventsRetentionOracle =
    """WITH ua AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 3600000000000 AS hr
      |  FROM events),
      |c AS (SELECT hr, COUNT(*) AS n_users FROM ua GROUP BY hr),
      |r AS (
      |  SELECT a.hr, COUNT(*) AS n_retained
      |  FROM ua a JOIN ua b ON a.user_id = b.user_id AND b.hr = a.hr + 1
      |  GROUP BY a.hr)
      |SELECT c.hr AS hr, n_users, COALESCE(n_retained, 0) AS n_retained,
      |  round(CAST(COALESCE(n_retained, 0) AS DOUBLE) / n_users, 6) AS retention
      |FROM c LEFT JOIN r USING (hr) ORDER BY hr""".stripMargin

  /** Event-transition matrix: per user in time order, count each
    * (event_type → next event_type) step — the Markov-chain view of
    * user journeys (what follows a click? how often does a view lead
    * nowhere?). `lead` over the per-user time order, then one
    * combine-friendly count per (from, to) pair; transitions out of a
    * user's LAST event go to the 'end' absorbing state so rows sum to
    * the event count exactly.
    *
    * Scale: the same single user-partitioned window shuffle as
    * sessionization; the final count's key space is |event types|²,
    * constant in corpus size. */
  def qEventsTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(expr("ts div 1000"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("next_type",
        coalesce(lead(col("event_type"), 1).over(w), lit("end")))
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  private val qEventsTransitionsOracle =
    """WITH t AS (
      |  SELECT event_type AS from_type,
      |    COALESCE(lead(event_type, 1) OVER (
      |      PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id), 'end') AS to_type
      |  FROM events)
      |SELECT from_type, to_type, COUNT(*) AS n
      |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Spark's NATIVE session-window operator (session_window groupBy) —
    * the built-in twin of q_events_sessions' hand-rolled lag/running-sum
    * form. Semantics differ at the exact-gap boundary: session_window
    * starts a new session when the next event lands AT the previous
    * window's end (diff >= gap), the manual form only when diff > gap —
    * the oracle mirrors the native rule so both engines pin it.
    * Window end = last event + gap (the operator's definition).
    *
    * Scale: one shuffle on user_id, then per-key in-order merging —
    * the same distribution as the manual form, without the window
    * function's full sort-frame machinery. */
  def qEventsSessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts_ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")

  private val qEventsSessionWindowOracle =
    """WITH t AS (
      |  SELECT user_id, epoch_us(ts) AS tus,
      |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
      |      OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
      |s AS (
      |  SELECT user_id, tus,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus
      |      ROWS UNBOUNDED PRECEDING) AS seq
      |  FROM t)
      |SELECT user_id, MIN(tus) AS start_us,
      |  MAX(tus) + 1800000000 AS end_us, COUNT(*) AS n_events
      |FROM s GROUP BY user_id, seq ORDER BY user_id, start_us""".stripMargin

  /** Volume-anomaly detection: z-score each (event_type, hour) count
    * against that type's overall hourly distribution. The mean/variance
    * come from EXACT integer power sums (n, Σc, Σc²) via a window over
    * the hourly-count relation — the same nondeterminism-free moment
    * trick as q_agg_stats — so the z-scores are cross-engine
    * bit-identical doubles. |z| > 2 flags the spike/outage hours.
    *
    * Scale: one groupBy over the scan reduces events to |types|×|hours|
    * rows; the stats window partitions on event_type over that already
    * tiny relation. Nothing downstream of the first aggregate is
    * proportional to corpus size. */
  def qEventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hr"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type"))
    val n = count(lit(1)).over(w).cast(DoubleType)
    val sc = sum(col("c")).over(w).cast(DoubleType)
    val scc = sum(col("c") * col("c")).over(w).cast(DoubleType)
    val mean = sc / n
    val variance = (scc - sc * sc / n) / (n - lit(1.0))
    val z = (col("c").cast(DoubleType) - mean) / sqrt(variance)
    hourly
      .select(col("event_type"), col("hr").cast(LongType).as("hr"), col("c"),
        round(z, 6).as("z"), (abs(z) > 2.0).as("is_anomaly"))
      .orderBy("event_type", "hr")
  }

  private val qEventsAnomalyOracle = {
    val n = "CAST(COUNT(*) OVER w AS DOUBLE)"
    val sc = "CAST(SUM(c) OVER w AS DOUBLE)"
    val scc = "CAST(SUM(c * c) OVER w AS DOUBLE)"
    val z = s"(CAST(c AS DOUBLE) - $sc / $n) / " +
      s"sqrt(($scc - $sc * $sc / $n) / ($n - 1.0))"
    s"""WITH h AS (
       |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
       |    COUNT(*) AS c
       |  FROM events GROUP BY event_type, hr)
       |SELECT event_type, CAST(hr AS BIGINT) AS hr, c,
       |  round($z, 6) AS z, abs($z) > 2.0 AS is_anomaly
       |FROM h
       |WINDOW w AS (PARTITION BY event_type)
       |ORDER BY event_type, hr""".stripMargin
  }

  /** OHLC downsampling: 5-minute bars per event_type — open/close are
    * the first/last value in each bar under the total (ts, event_id)
    * order, high/low/sum complete the candle. The time-series
    * compaction every metrics store runs; open/close are picked via
    * row_number flags folded into ONE aggregation (no self-join), so
    * the whole query is a window + groupBy on the same (type, bar)
    * partitioning — a single shuffle, and the picks are deterministic
    * even with duplicate timestamps (event_id tiebreak).
    *
    * Scale: the window and the aggregate share partitioning keys, so
    * Catalyst reuses one exchange; output is |types|×|bars| rows,
    * constant in corpus size per unit time. */
  def qEventsOhlc(s: SparkSession, dir: String): DataFrame = {
    val bar = expr("ts div 300000000000").as("bar")
    val w = Window.partitionBy(col("event_type"), col("bar"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_type"), bar, col("ts"), col("event_id"), col("value"))
      .withColumn("rn_a", row_number().over(w))
      .withColumn("n_in", count(lit(1)).over(
        Window.partitionBy(col("event_type"), col("bar"))))
      .groupBy(col("event_type"), col("bar").cast(LongType).as("bar"))
      .agg(
        max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn_a") === col("n_in"), col("value"))).as("close"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .orderBy("event_type", "bar")
  }

  private val qEventsOhlcOracle =
    s"""WITH t AS (
       |  SELECT event_type, epoch_ns(ts) // 300000000000 AS bar, value,
       |    row_number() OVER (PARTITION BY event_type, epoch_ns(ts) // 300000000000
       |      ORDER BY ts, event_id) AS rn_a,
       |    COUNT(*) OVER (PARTITION BY event_type, epoch_ns(ts) // 300000000000)
       |      AS n_in
       |  FROM events)
       |SELECT event_type, CAST(bar AS BIGINT) AS bar,
       |  MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       |  MAX(value) AS high, MIN(value) AS low,
       |  MAX(CASE WHEN rn_a = n_in THEN value END) AS close,
       |  COUNT(*) AS n_events, ${dsumSql("value")} AS sum_value
       |FROM t GROUP BY event_type, bar ORDER BY event_type, bar""".stripMargin

  /** SCD Type-2 interval build — the change-data-capture versioning job:
    * collapse each user's consecutive runs of the same event_type into
    * [valid_from, valid_to) versions with an is_current flag on the open
    * run. This is the "gaps and islands" shape every warehouse dimension
    * load runs: a change flag via lag, a running sum of flags numbering
    * the islands, one aggregate per island, and a lead stitching each
    * version's end to the next version's start.
    *
    * Scale: all three window passes share ONE partitioning (user_id), so
    * Catalyst plans a single exchange + sort; the island aggregate is a
    * combine-friendly groupBy on (user, version). Nothing global — the
    * 100 TB form is identical with user_id as the distribution key. */
  def qScd2Build(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val changed = when(
      lag(col("event_type"), 1).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id")))
        =!= col("event_type"), 1L)
      .otherwise(lit(0L)) // first row per user: lag is NULL -> =!= is NULL -> otherwise(0)
    Tables.events(s, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("chg", changed)
      .withColumn("version", sum(col("chg")).over(wOrd))
      .groupBy(col("user_id"), col("version"))
      .agg(
        min(col("event_type")).as("attr_value"),
        min(col("ts_us")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wVer))
      .select(col("user_id"), col("version"), col("attr_value"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"), col("n_events"))
      .orderBy("user_id", "version")
  }

  private val qScd2BuildOracle =
    """WITH flagged AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
      |    CASE WHEN lag(event_type, 1) OVER w IS NOT NULL
      |           AND lag(event_type, 1) OVER w <> event_type
      |      THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |versioned AS (
      |  SELECT user_id, event_type, ts_us,
      |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS version
      |  FROM flagged),
      |islands AS (
      |  SELECT user_id, version,
      |    MIN(event_type) AS attr_value,
      |    MIN(ts_us) AS valid_from,
      |    COUNT(*) AS n_events
      |  FROM versioned GROUP BY user_id, version)
      |SELECT user_id, CAST(version AS BIGINT) AS version, attr_value,
      |  valid_from,
      |  lead(valid_from, 1) OVER (PARTITION BY user_id ORDER BY version)
      |    AS valid_to,
      |  lead(valid_from, 1) OVER (PARTITION BY user_id ORDER BY version)
      |    IS NULL AS is_current,
      |  n_events
      |FROM islands ORDER BY user_id, version""".stripMargin

  /** POINT-IN-TIME (temporal) join — the feature-store "no leakage"
    * primitive: each purchase event looks up the SCD2 attribute version
    * VALID AT ITS EVENT TIME (`valid_from ≤ ts < valid_to`, open tail
    * included), never a later one. Composes q_scd2_build's versioned
    * dimension with one equi-join on the user key; the interval
    * containment rides the join as a post-condition, so the plan is a
    * plain hash join on user_id with versions-per-user-bounded
    * fan-out — no range explosion, no broadcast of the fact side. The
    * oracle reuses the SCD2 oracle verbatim as a CTE (textual reuse, no
    * drift). */
  def qJoinTemporal(s: SparkSession, dir: String): DataFrame = {
    val vers = qScd2Build(s, dir)
      .select(col("user_id").as("v_user"), col("version"),
        col("attr_value"), col("valid_from"), col("valid_to"))
    val facts = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
    facts.join(vers,
        col("user_id") === col("v_user") &&
          col("ts_us") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts_us") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("version"), col("attr_value"))
      .orderBy("event_id")
  }

  private val qJoinTemporalOracle = {
    // the SCD2 oracle verbatim, its final SELECT demoted to a CTE
    val base = qScd2BuildOracle.replace(
      """SELECT user_id, CAST(version AS BIGINT) AS version, attr_value,
        |  valid_from,
        |  lead(valid_from, 1) OVER (PARTITION BY user_id ORDER BY version)
        |    AS valid_to,
        |  lead(valid_from, 1) OVER (PARTITION BY user_id ORDER BY version)
        |    IS NULL AS is_current,
        |  n_events
        |FROM islands ORDER BY user_id, version""".stripMargin,
      """vers AS (
        |  SELECT user_id, CAST(version AS BIGINT) AS version, attr_value,
        |    valid_from,
        |    lead(valid_from, 1) OVER (PARTITION BY user_id ORDER BY version)
        |      AS valid_to
        |  FROM islands)""".stripMargin)
    s"""${base.replace("  FROM versioned GROUP BY user_id, version)",
          "  FROM versioned GROUP BY user_id, version),")},
       |f AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
       |  WHERE event_type = 'purchase')
       |SELECT f.event_id, f.user_id, f.ts_us, v.version, v.attr_value
       |FROM f JOIN vers v ON f.user_id = v.user_id
       |  AND f.ts_us >= v.valid_from
       |  AND (v.valid_to IS NULL OR f.ts_us < v.valid_to)
       |ORDER BY f.event_id""".stripMargin
  }

  /** Exponentially-decayed moving value per event — the signal-smoothing
    * primitive behind rate limiting, trend scoring, and per-user activity
    * decay — computed EXACTLY so the oracle hash can gate it.
    *
    * Classic EWMA (`e_i = α·x_i + (1−α)·e_{i−1}`) is an unbounded float
    * recursion: order-dependent rounding, no cross-engine hash. This is
    * the bounded dyadic form: decay α = 1/2, horizon K = 16, per-row
    * value floored to an integer, so each term `x_{i−k}·2⁻ᵏ` is a dyadic
    * rational with denominator 2¹⁵ and the 16-term sum's numerator stays
    * far under 2⁵³ — every partial sum is exactly representable and the
    * result is the SAME double in any evaluation order and any engine.
    * (Truncating the tail at K=16 discards weight < 2⁻¹⁵ of the window —
    * the approximation is in the OPERATOR DEFINITION, not the runtime.)
    *
    * Scale: one shuffle on user_id carries the single window pass; the
    * 16 LAG terms all ride that one WindowExec (one buffer walk, pure
    * codegen projection). Parallelism is user-cardinality — millions of
    * keys at 100 TB; the 15-user sf corpus is the degenerate floor. */
  def qEventsEwma(s: SparkSession, dir: String): DataFrame = {
    val tus = expr("ts div 1000")
    val w = Window.partitionBy(col("user_id")).orderBy(tus, col("event_id"))
    val x = floor(col("value"))
    val ewma = (0 until 16).map { k =>
      coalesce(lag(x, k).over(w), lit(0L)).cast(DoubleType) *
        lit(math.pow(2.0, -k))
    }.reduce(_ + _)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), x.cast(LongType).as("x"),
        ewma.as("ewma16"))
      .orderBy("event_id")
  }

  private val qEventsEwmaOracle = {
    val terms = (0 until 16).map { k =>
      val lagE =
        if (k == 0) "CAST(floor(value) AS BIGINT)"
        else s"LAG(CAST(floor(value) AS BIGINT), $k) OVER w"
      s"CAST(COALESCE($lagE, 0) AS DOUBLE) * ${java.lang.Double.toString(math.pow(2.0, -k))}"
    }.mkString("\n      + ")
    s"""SELECT event_id, user_id, CAST(floor(value) AS BIGINT) AS x,
       |  $terms
       |  AS ewma16
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
       |ORDER BY event_id""".stripMargin
  }

  /** Last-touch attribution — which channel gets credit for each
    * conversion: for every `purchase`, the attributed channel is the
    * latest preceding non-purchase event of the same user (µs order,
    * event_id tie-break); purchases with no preceding touch fall to
    * `direct`. Report = conversions and exact revenue per channel.
    *
    * Plan shape: ONE window pass (`last(..., ignoreNulls)` over the
    * unbounded-preceding frame) carries the channel to each purchase
    * row — no self-join of touches to conversions, which at 100 TB
    * would be a skew-prone range join; the window rides the same
    * user_id shuffle every per-user operator uses. Revenue is the
    * integer-cents sum (order-independent, hash-exact). */
  def qEventsAttribution(s: SparkSession, dir: String): DataFrame = {
    val tus = expr("ts div 1000")
    val w = Window.partitionBy(col("user_id")).orderBy(tus, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("conversions"),
        dsum(col("value")).as("revenue"))
      .orderBy("channel")
  }

  private val qEventsAttributionOracle =
    s"""WITH touched AS (
       |  SELECT event_type, value,
       |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
       |      IGNORE NULLS) OVER (PARTITION BY user_id
       |        ORDER BY epoch_us(ts), event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
       |  FROM events)
       |SELECT COALESCE(touch, 'direct') AS channel,
       |  COUNT(*) AS conversions, ${dsumSql("value")} AS revenue
       |FROM touched WHERE event_type = 'purchase'
       |GROUP BY 1 ORDER BY channel""".stripMargin

  /** Concurrency timeline — "how many sessions are active at time t",
    * the interval-overlap primitive behind load profiling and peak
    * sizing. Sessions are q_events_sessions' [start_us, end_us]
    * intervals; each emits +1 at start and −1 at end+1µs (closed
    * interval), deltas aggregate per timestamp, and the running sum
    * over the time axis IS the active-session count at each change
    * point. A sweep line — NOT an interval self-join, which at 100 TB
    * is quadratic in overlap density.
    *
    * The global prefix sum does NOT run as one single-partition
    * window: change points bucket by HOUR, the cumsum runs within
    * buckets in parallel, and per-bucket totals (a bounded, hours-sized
    * relation) prefix-sum once and broadcast back as offsets — the
    * q_curation_global_index discipline applied to a running sum.
    * The oracle states the same timeline as one flat window cumsum. */
  /** Session intervals (user_id, session_seq, start_us, end_us) — the
    * 30-min-gap sessionization shared by the concurrency sweep line
    * and the interval join. */
  private def sessionIntervals(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000L
    val tus = expr("ts div 1000")
    val w = Window.partitionBy(col("user_id")).orderBy(tus, col("event_id"))
    val prev = lag(tus, 1).over(w)
    Tables.events(s, dir)
      .withColumn("new_session",
        when(prev.isNull || tus - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(tus).cast(LongType).as("start_us"),
        max(tus).cast(LongType).as("end_us"))
  }

  def qEventsConcurrency(s: SparkSession, dir: String): DataFrame = {
    val sessions = sessionIntervals(s, dir)
    val deltas = sessions
      .select(col("start_us").as("t_us"), lit(1L).as("d"))
      .union(sessions.select((col("end_us") + 1L).as("t_us"), lit(-1L).as("d")))
      .groupBy("t_us").agg(sum(col("d")).as("delta"))
    // bucketed prefix sum: within-hour cumsum in parallel + hour offsets
    val hourUs = 3600L * 1000000L
    val bucketed = deltas.withColumn("bucket", expr(s"t_us div $hourUs"))
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(sum(col("delta")).as("tot"))
      .withColumn("offset", coalesce(
        sum(col("tot")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    bucketed
      .withColumn("local", sum(col("delta")).over(
        Window.partitionBy(col("bucket")).orderBy(col("t_us"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(offsets), "bucket")
      .select(col("t_us"), col("delta").cast(LongType).as("delta"),
        (col("offset") + col("local")).cast(LongType).as("active"))
      .orderBy("t_us")
  }

  private val qEventsConcurrencyOracle =
    """WITH sess AS (
      |  SELECT user_id, session_seq,
      |    MIN(tus) AS start_us, MAX(tus) AS end_us
      |  FROM (
      |    SELECT user_id, event_id, tus,
      |      SUM(new_session) OVER (PARTITION BY user_id
      |        ORDER BY tus, event_id) AS session_seq
      |    FROM (
      |      SELECT user_id, event_id, epoch_us(ts) AS tus,
      |        CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
      |          OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
      |          THEN 1 ELSE 0 END AS new_session
      |      FROM events
      |      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |    ) flagged
      |  ) numbered
      |  GROUP BY user_id, session_seq),
      |deltas AS (
      |  SELECT t_us, CAST(SUM(d) AS BIGINT) AS delta FROM (
      |    SELECT start_us AS t_us, 1 AS d FROM sess
      |    UNION ALL SELECT end_us + 1, -1 FROM sess)
      |  GROUP BY t_us)
      |SELECT t_us, delta,
      |  CAST(SUM(delta) OVER (ORDER BY t_us) AS BIGINT) AS active
      |FROM deltas ORDER BY t_us""".stripMargin

  /** Bin-bucketed interval join — sessions × incident windows WITHOUT
    * an equi-key: which user sessions overlap any system incident (an
    * `error` event's 10-minute window). The naive form is a pure range
    * predicate — a cartesian the optimizer can only nested-loop, the
    * classic 100 TB range-join trap. The scalable identity: explode
    * both interval sets onto HOUR buckets (bins bounded by interval
    * length ÷ bucket width — pick the bucket near the median interval
    * length), equi-join on the bucket, re-check the exact overlap, and
    * count each pair in exactly ONE bucket — the one holding the
    * overlap's START (`greatest(start, i_start) div hour`), the
    * standard attribution trick that replaces a pair-volume DISTINCT
    * shuffle with a map-side filter. Every shuffle is a hash join on
    * the bucket key; nothing is quadratic in either INPUT. The OUTPUT
    * is the overlapping-pair set itself, which genuinely grows with
    * overlap density (factor² under the replicated-corpus 10× — the
    * measured 40 s at 10× is ~100× the pairs, i.e. sublinear PER
    * PAIR); the linear-output scale twin is [[qJoinIntervalAgg]].
    * The oracle states the same pairs as the raw inequality join
    * (DuckDB's IEJoin handles it at verification scale — deliberately
    * a different algorithm than the plan under test). */
  def qJoinInterval(s: SparkSession, dir: String): DataFrame =
    intervalPairs(s, dir)
      .select(col("user_id"), col("session_seq"), col("event_id"),
        (least(col("end_us"), col("i_end")) -
          greatest(col("start_us"), col("i_start"))).cast(LongType)
          .as("overlap_us"))
      .orderBy("user_id", "session_seq", "event_id")

  /** Overlapping (session, incident) pairs via the bucketed range join,
    * each pair surviving in exactly one bucket. */
  private def intervalPairs(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val winUs = 600L * 1000000L
    val sess = sessionIntervals(s, dir)
    val inc = Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id"), expr("ts div 1000").as("i_start"),
        (expr("ts div 1000") + winUs).as("i_end"))
    val sessB = sess.withColumn("b",
      explode(sequence(expr(s"start_us div $hourUs"), expr(s"end_us div $hourUs"))))
    val incB = inc.withColumn("b",
      explode(sequence(expr(s"i_start div $hourUs"), expr(s"i_end div $hourUs"))))
    sessB.join(incB, "b")
      .filter(col("start_us") <= col("i_end") && col("i_start") <= col("end_us") &&
        col("b") === expr(s"greatest(start_us, i_start) div $hourUs"))
  }

  /** The linear-output form of the interval join — per-session incident
    * exposure (how many incidents a session overlapped and for how
    * long). The pair space still exists transiently inside the
    * bucket join, but it reduces through a combine-friendly aggregation
    * keyed on the session, so the SHUFFLED and MATERIALIZED volume is
    * one row per session — the form a 100 TB exposure report runs. */
  def qJoinIntervalAgg(s: SparkSession, dir: String): DataFrame =
    intervalPairs(s, dir)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_incidents"),
        sum(least(col("end_us"), col("i_end")) -
          greatest(col("start_us"), col("i_start"))).cast(LongType)
          .as("total_overlap_us"))
      .orderBy("user_id", "session_seq")

  private val qJoinIntervalOracle =
    """WITH sess AS (
      |  SELECT user_id, session_seq,
      |    MIN(tus) AS start_us, MAX(tus) AS end_us
      |  FROM (
      |    SELECT user_id, event_id, tus,
      |      SUM(new_session) OVER (PARTITION BY user_id
      |        ORDER BY tus, event_id) AS session_seq
      |    FROM (
      |      SELECT user_id, event_id, epoch_us(ts) AS tus,
      |        CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
      |          OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
      |          THEN 1 ELSE 0 END AS new_session
      |      FROM events
      |      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |    ) flagged
      |  ) numbered
      |  GROUP BY user_id, session_seq),
      |inc AS (
      |  SELECT event_id, epoch_us(ts) AS i_start,
      |    epoch_us(ts) + 600000000 AS i_end
      |  FROM events WHERE event_type = 'error')
      |SELECT s.user_id, CAST(s.session_seq AS BIGINT) AS session_seq,
      |  i.event_id,
      |  CAST(least(s.end_us, i.i_end) - greatest(s.start_us, i.i_start)
      |    AS BIGINT) AS overlap_us
      |FROM sess s JOIN inc i
      |  ON s.start_us <= i.i_end AND i.i_start <= s.end_us
      |ORDER BY user_id, session_seq, event_id""".stripMargin

  private val qJoinIntervalAggOracle =
    qJoinIntervalOracle.replace(
      """SELECT s.user_id, CAST(s.session_seq AS BIGINT) AS session_seq,
        |  i.event_id,
        |  CAST(least(s.end_us, i.i_end) - greatest(s.start_us, i.i_start)
        |    AS BIGINT) AS overlap_us
        |FROM sess s JOIN inc i
        |  ON s.start_us <= i.i_end AND i.i_start <= s.end_us
        |ORDER BY user_id, session_seq, event_id""".stripMargin,
      """SELECT s.user_id, CAST(s.session_seq AS BIGINT) AS session_seq,
        |  COUNT(*) AS n_incidents,
        |  CAST(SUM(least(s.end_us, i.i_end) - greatest(s.start_us, i.i_start))
        |    AS BIGINT) AS total_overlap_us
        |FROM sess s JOIN inc i
        |  ON s.start_us <= i.i_end AND i.i_start <= s.end_us
        |GROUP BY s.user_id, s.session_seq
        |ORDER BY user_id, session_seq""".stripMargin)

  /** Running distinct-so-far per user — "how many distinct event types
    * has this user exercised by each event": the feature-accumulation
    * window shape (breadth of engagement over time). A running
    * COUNT(DISTINCT) has no native frame form in either engine; the
    * scalable identity is first-seen flag (1 on the first (user, type)
    * occurrence) + running sum. Two window passes on user-keyed
    * shuffles; no per-row distinct state anywhere. */
  def qWindowRunningDistinct(s: SparkSession, dir: String): DataFrame = {
    val tus = expr("ts div 1000")
    val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(tus, col("event_id"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(tus, col("event_id"))
    Tables.events(s, dir)
      .withColumn("first_seen",
        when(lag(col("event_id"), 1).over(byUserType).isNull, 1L).otherwise(0L))
      .select(col("event_id"), col("user_id"),
        sum(col("first_seen")).over(byUser.rowsBetween(
          Window.unboundedPreceding, 0)).cast(LongType).as("distinct_types"))
      .orderBy("event_id")
  }

  private val qWindowRunningDistinctOracle =
    """SELECT event_id, user_id,
      |  CAST(SUM(first_seen) OVER (PARTITION BY user_id
      |    ORDER BY tus, event_id) AS BIGINT) AS distinct_types
      |FROM (
      |  SELECT event_id, user_id, epoch_us(ts) AS tus,
      |    CASE WHEN LAG(event_id) OVER (PARTITION BY user_id, event_type
      |      ORDER BY epoch_us(ts), event_id) IS NULL THEN 1 ELSE 0 END
      |      AS first_seen
      |  FROM events)
      |ORDER BY event_id""".stripMargin

  /** Robust anomaly detection — the MAD (median absolute deviation)
    * twin of q_events_anomaly's z-score: median and MAD are unmoved by
    * the outliers being hunted, so a burst hour can't inflate its own
    * threshold the way it inflates a stddev. INTEGER-EXACT end-to-end:
    * "median" is the LOWER median (the rank-⌈n/2⌉ value under a total
    * (value, hour) order), so no interpolation, no floats — a flag is
    * `dev > 3·MAD` in int64.
    *
    * Scale: both median passes are rank windows over the type×hours
    * relation (bounded by the time range, not event volume — the
    * q_events_cusum argument); the per-type medians join back
    * broadcast. */
  def qEventsAnomalyRobust(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hr"))
      .agg(count(lit(1)).as("c"))
    val byType = Window.partitionBy(col("event_type"))
    def lowerMedian(df: DataFrame, value: String): DataFrame = df
      .withColumn("rn", row_number().over(byType.orderBy(col(value), col("hr"))))
      .withColumn("k", (count(lit(1)).over(byType) + 1) / 2)
      .filter(col("rn") === col("k").cast("int"))
      .select(col("event_type"), col(value).as("m"))
    val med = lowerMedian(hourly, "c").withColumnRenamed("m", "med")
    val withDev = hourly.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("c") - col("med")))
    val mad = lowerMedian(withDev.select(col("event_type"), col("hr"),
      col("dev")), "dev").withColumnRenamed("m", "mad")
    withDev.join(broadcast(mad), "event_type")
      .select(col("event_type"), col("hr").cast(LongType).as("hr"),
        col("c"), col("med").cast(LongType).as("med"),
        col("mad").cast(LongType).as("mad"),
        (col("dev") > lit(3) * col("mad")).as("is_anomaly"))
      .orderBy("event_type", "hr")
  }

  private val qEventsAnomalyRobustOracle =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, c AS med FROM (
      |    SELECT event_type, c,
      |      row_number() OVER (PARTITION BY event_type ORDER BY c, hr) AS rn,
      |      (COUNT(*) OVER (PARTITION BY event_type) + 1) // 2 AS k
      |    FROM hourly) x WHERE rn = k),
      |wd AS (
      |  SELECT h.event_type, h.hr, h.c, m.med, abs(h.c - m.med) AS dev
      |  FROM hourly h JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, dev AS mad FROM (
      |    SELECT event_type, dev, hr,
      |      row_number() OVER (PARTITION BY event_type ORDER BY dev, hr) AS rn,
      |      (COUNT(*) OVER (PARTITION BY event_type) + 1) // 2 AS k
      |    FROM wd) x WHERE rn = k)
      |SELECT w.event_type, CAST(w.hr AS BIGINT) AS hr, w.c,
      |  CAST(w.med AS BIGINT) AS med, CAST(d.mad AS BIGINT) AS mad,
      |  w.dev > 3 * d.mad AS is_anomaly
      |FROM wd w JOIN mad d USING (event_type)
      |ORDER BY event_type, hr""".stripMargin

  /** Session path-pattern mining — "which behavioral sequences occur,
    * and how often": each session's ordered event types collapse into
    * one path string, and patterns (adjacent click→purchase, an
    * eventual signup…purchase, error-then-purchase recovery) count
    * over the session relation. The sequence-mining primitive behind
    * funnel discovery, expressed without a per-pattern self-join: ONE
    * shuffle builds the paths (the same user-keyed sort every
    * session operator rides), then pattern counts are a map-side
    * LIKE/regexp projection plus one global aggregate.
    *
    * Path strings order by the (µs, event_id) total order via a
    * sort_array'd struct collect — identical to the oracle's
    * string_agg ORDER BY. Patterns stay in the RE2 ∩ Java dialect
    * intersection (the q_pii_scrub discipline). */
  def qEventsPaths(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000L
    val tus = expr("ts div 1000")
    val w = Window.partitionBy(col("user_id")).orderBy(tus, col("event_id"))
    val prev = lag(tus, 1).over(w)
    val paths = Tables.events(s, dir)
      .withColumn("new_session",
        when(prev.isNull || tus - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(tus.as("t"), col("event_id").as("e"),
          col("event_type").as("y")))),
        e => e.getField("y")), ">").as("path"))
    paths.agg(
      count(lit(1)).as("n_sessions"),
      sum(when(col("path").like("%click>purchase%"), 1L).otherwise(0L))
        .cast(LongType).as("n_click_then_purchase"),
      sum(when(col("path").rlike("signup.*purchase"), 1L).otherwise(0L))
        .cast(LongType).as("n_signup_to_purchase"),
      sum(when(col("path").rlike("error.*purchase"), 1L).otherwise(0L))
        .cast(LongType).as("n_error_recovery"))
  }

  private val qEventsPathsOracle =
    """WITH g AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
      |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
      |      OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |n AS (
      |  SELECT user_id, event_id, event_type, tus,
      |    SUM(new_session) OVER (PARTITION BY user_id
      |      ORDER BY tus, event_id) AS session_seq
      |  FROM g),
      |paths AS (
      |  SELECT user_id, session_seq,
      |    string_agg(event_type, '>' ORDER BY tus, event_id) AS path
      |  FROM n GROUP BY user_id, session_seq)
      |SELECT COUNT(*) AS n_sessions,
      |  CAST(SUM(CASE WHEN path LIKE '%click>purchase%' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_click_then_purchase,
      |  CAST(SUM(CASE WHEN regexp_matches(path, 'signup.*purchase')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_to_purchase,
      |  CAST(SUM(CASE WHEN regexp_matches(path, 'error.*purchase')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_error_recovery
      |FROM paths""".stripMargin

  /** Incremental aggregate maintenance — the materialized-view delta
    * rule: yesterday's stored aggregate merges with the delta's
    * partial aggregate instead of rescanning the corpus. Staged here
    * as a SELF-CHECKING construction: the corpus splits at its time
    * midpoint into "stored" and "delta" halves, each aggregates
    * independently, and the merged result is REQUIRED to hash-equal
    * the oracle's direct full-corpus aggregate — the oracle never
    * sees the split, so the equality IS the re-aggregability proof.
    * Counts add; value sums merge exactly because they are integer
    * cents (the dsum discipline) — the same property that makes the
    * nightly 100 TB maintenance job touch only the delta. The merge
    * is a full-outer join on the group key (either half may lack a
    * group), with the halves' decimal partials summed null-safely. */
  def qAggIncremental(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), expr("ts div 1000").as("tus"), col("value"))
    val mx = ev.agg((min(col("tus")) +
      (max(col("tus")) - min(col("tus"))) / 2).cast(LongType).as("mid"))
    val staged = ev.crossJoin(broadcast(mx))
    def half(cond: org.apache.spark.sql.Column) = staged.filter(cond)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), isumCents(col("value")).as("sc"))
    val stored = half(col("tus") <= col("mid"))
    val delta = half(col("tus") > col("mid"))
    stored.select(col("event_type"), col("n").as("n1"), col("sc").as("sc1"))
      .join(delta.select(col("event_type"), col("n").as("n2"), col("sc").as("sc2")),
        Seq("event_type"), "full_outer")
      .select(col("event_type"),
        (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L)))
          .cast(LongType).as("n_events"),
        ((coalesce(col("sc1"), lit(0).cast(org.apache.spark.sql.types
          .DecimalType(20, 0))) + coalesce(col("sc2"), lit(0).cast(
          org.apache.spark.sql.types.DecimalType(20, 0))))
          .cast(DoubleType) / 100.0).as("sum_value"))
      .orderBy("event_type")
  }

  /** The partial half of dsum: the exact integer-cents decimal sum,
    * mergeable across table versions. */
  private def isumCents(c: org.apache.spark.sql.Column) =
    sum(cents(c).cast(org.apache.spark.sql.types.DecimalType(20, 0)))

  private val qAggIncrementalOracle =
    s"""SELECT event_type, COUNT(*) AS n_events,
       |  ${dsumSql("value")} AS sum_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** TIME-BOUNDED conversion funnel — signup → click → purchase with
    * each step within ONE HOUR of the previous (the unbounded ordering
    * form is q_events_funnel; real funnels expire). No step-to-step
    * self-join: each event carries the latest qualifying prior-step
    * time via `last(…, ignoreNulls)` over the one user-keyed window
    * every per-user operator shares — a click qualifies if a signup
    * landed in its trailing hour, a purchase converts if a QUALIFIED
    * click did. Chained carry-forward is exactly how a funnel runs at
    * 100 TB: one shuffle, integer µs comparisons, one global count. */
  def qEventsFunnelWindowed(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val tus = expr("ts div 1000")
    val w = Window.partitionBy(col("user_id")).orderBy(tus, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = Tables.events(s, dir)
      .withColumn("tus", tus)
      .withColumn("last_signup",
        last(when(col("event_type") === "signup", col("tus")),
          ignoreNulls = true).over(w))
    val qualClick = col("event_type") === "click" &&
      col("last_signup").isNotNull && col("tus") - col("last_signup") <= hourUs
    val staged = ev
      .withColumn("last_qual_click",
        last(when(qualClick, col("tus")), ignoreNulls = true).over(w))
    val converts = col("event_type") === "purchase" &&
      col("last_qual_click").isNotNull &&
      col("tus") - col("last_qual_click") <= hourUs
    staged.agg(
      count_distinct(col("user_id")).as("n_users"),
      sum(when(col("event_type") === "signup", 1L).otherwise(0L))
        .cast(LongType).as("n_signups"),
      sum(when(qualClick, 1L).otherwise(0L)).cast(LongType)
        .as("n_qualified_clicks"),
      sum(when(converts, 1L).otherwise(0L)).cast(LongType)
        .as("n_conversions"))
  }

  private val qEventsFunnelWindowedOracle =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
      |    LAST_VALUE(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END
      |      IGNORE NULLS) OVER w AS last_signup
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |q AS (
      |  SELECT *,
      |    event_type = 'click' AND last_signup IS NOT NULL
      |      AND tus - last_signup <= 3600000000 AS qual_click
      |  FROM e),
      |c AS (
      |  SELECT *,
      |    LAST_VALUE(CASE WHEN qual_click THEN tus END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tus, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS last_qual_click
      |  FROM q)
      |SELECT COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_signups,
      |  CAST(SUM(CASE WHEN qual_click THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_qualified_clicks,
      |  CAST(SUM(CASE WHEN event_type = 'purchase'
      |    AND last_qual_click IS NOT NULL
      |    AND tus - last_qual_click <= 3600000000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_conversions
      |FROM c""".stripMargin

  /** Inter-arrival gap profile per event type — the traffic-shape
    * statistic capacity planning reads (how bursty is each stream):
    * per-user consecutive gaps from one lag window, then per-type
    * count / LOWER-median / max — the q_events_anomaly_robust median
    * discipline (rank-⌈n/2⌉ under a total order), integer µs
    * end-to-end. One user-keyed shuffle for the gaps; the median rank
    * window runs over the gap relation partitioned by type. */
  def qEventsInterarrival(s: SparkSession, dir: String): DataFrame = {
    val tus = expr("ts div 1000")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(tus, col("event_id"))
    val gaps = Tables.events(s, dir)
      .withColumn("gap", tus - lag(tus, 1).over(w))
      .filter(col("gap").isNotNull)
      .select(col("event_type"), col("event_id"), col("gap"))
    val byType = Window.partitionBy(col("event_type"))
    gaps
      .withColumn("rn", row_number().over(
        byType.orderBy(col("gap"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("med", max(when(col("rn") === ((col("n") + 1) / 2)
        .cast("int"), col("gap"))).over(byType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast(LongType).as("n_gaps"),
        max(col("med")).cast(LongType).as("median_gap_us"),
        max(col("gap")).cast(LongType).as("max_gap_us"))
      .orderBy("event_type")
  }

  private val qEventsInterarrivalOracle =
    """WITH g AS (
      |  SELECT event_type, event_id,
      |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (
      |      PARTITION BY user_id, event_type
      |      ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events),
      |gg AS (SELECT * FROM g WHERE gap IS NOT NULL),
      |r AS (
      |  SELECT event_type, gap,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY gap, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM gg)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS BIGINT)
      |    AS median_gap_us,
      |  CAST(MAX(gap) AS BIGINT) AS max_gap_us
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Hourly engagement curve: HAU (distinct users active in the hour)
    * and ROLLING-24H active users, with stickiness = HAU/rolling in
    * integer basis points — the DAU/MAU health metric at this corpus's
    * hourly cadence. Rolling DISTINCT over a trailing window has no
    * combine-friendly window form (count-distinct windows aren't
    * supported, and a 24-wide range self-join squares); the scale
    * rewrite is SUPPORT EXPLOSION: each distinct (user, hour) activity
    * fact supports the 24 hours [h, h+23], so explode it ×24, dedup,
    * and count — a bounded constant-factor blowup feeding two-level
    * distinct aggregation, shuffling on the hour key only. The inner
    * join back to HAU restricts output to hours with real activity. */
  def qEventsEngagement(s: SparkSession, dir: String): DataFrame = {
    val ua = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 3600000000000").as("hr")).distinct()
    val hau = ua.groupBy(col("hr")).agg(count(lit(1)).as("hau"))
    val rolling = ua
      .select(col("user_id"),
        explode(sequence(col("hr"), col("hr") + 23)).as("hr"))
      .distinct()
      .groupBy(col("hr")).agg(count(lit(1)).as("rolling_24h"))
    hau.join(rolling, Seq("hr"))
      .select(col("hr").cast(LongType).as("hr"),
        col("hau").cast(LongType).as("hau"),
        col("rolling_24h").cast(LongType).as("rolling_24h"),
        expr("hau * 10000 div rolling_24h").cast(LongType)
          .as("stickiness_bp"))
      .orderBy("hr")
  }

  private val qEventsEngagementOracle =
    """WITH ua AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 3600000000000 AS hr
      |  FROM events),
      |h AS (SELECT hr, COUNT(*) AS hau FROM ua GROUP BY hr),
      |sup AS (
      |  SELECT DISTINCT user_id, hr FROM (
      |    SELECT user_id,
      |      unnest(generate_series(hr, hr + 23)) AS hr
      |    FROM ua)),
      |r AS (SELECT hr, COUNT(*) AS rolling_24h FROM sup GROUP BY hr)
      |SELECT CAST(h.hr AS BIGINT) AS hr, CAST(hau AS BIGINT) AS hau,
      |  CAST(rolling_24h AS BIGINT) AS rolling_24h,
      |  CAST(hau * 10000 // rolling_24h AS BIGINT) AS stickiness_bp
      |FROM h JOIN r ON h.hr = r.hr ORDER BY hr""".stripMargin

  /** Cohort retention matrix — the classic signup-cohort × day-offset
    * triangle: users grouped by FIRST-ACTIVE day, each later active day
    * recorded at its offset, cells scored n_active / cohort_size in
    * integer basis points. Three combine-friendly aggregations and one
    * user-keyed join (distinct activity → per-user min → activity
    * joined back on user_id, co-partitioned); cohort sizes are a
    * day-domain relation, broadcast back onto the matrix. Nothing in
    * the plan grows faster than the (days × offsets) triangle. */
  def qEventsCohorts(s: SparkSession, dir: String): DataFrame = {
    val ua = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 3600000000000").as("hr")).distinct()
    val first = ua.groupBy(col("user_id"))
      .agg(expr("min(hr) div 24").as("cohort_day"))
    val act = ua.join(first, "user_id")
      .select(col("user_id"), col("cohort_day"),
        (expr("hr div 24") - col("cohort_day")).as("offset_day"))
      .distinct()
    val sizes = first.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    act.groupBy(col("cohort_day"), col("offset_day"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day").cast(LongType).as("cohort_day"),
        col("offset_day").cast(LongType).as("offset_day"),
        col("n_active").cast(LongType).as("n_active"),
        col("cohort_size").cast(LongType).as("cohort_size"),
        expr("n_active * 10000 div cohort_size").cast(LongType)
          .as("retention_bp"))
      .orderBy("cohort_day", "offset_day")
  }

  private val qEventsCohortsOracle =
    """WITH ua AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 3600000000000 AS hr
      |  FROM events),
      |f AS (
      |  SELECT user_id, MIN(hr) // 24 AS cohort_day FROM ua GROUP BY 1),
      |act AS (
      |  SELECT DISTINCT a.user_id, f.cohort_day,
      |    a.hr // 24 - f.cohort_day AS offset_day
      |  FROM ua a JOIN f USING (user_id)),
      |cs AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM f GROUP BY 1),
      |m AS (
      |  SELECT cohort_day, offset_day, COUNT(*) AS n_active
      |  FROM act GROUP BY 1, 2)
      |SELECT CAST(m.cohort_day AS BIGINT) AS cohort_day,
      |  CAST(offset_day AS BIGINT) AS offset_day,
      |  CAST(n_active AS BIGINT) AS n_active,
      |  CAST(cohort_size AS BIGINT) AS cohort_size,
      |  CAST(n_active * 10000 // cohort_size AS BIGINT) AS retention_bp
      |FROM m JOIN cs USING (cohort_day)
      |ORDER BY cohort_day, offset_day""".stripMargin

  /** Hour-of-day × day-of-week seasonality heatmap with per-day-of-week
    * basis-point shares — the load-shape profile capacity planning and
    * anomaly baselines read. Bucketing is PURE INTEGER arithmetic on
    * the epoch-ns contract (hod = hours-since-epoch mod 24, dow 0=Mon
    * via the +3-day Thursday shift) — no calendar/timezone functions,
    * so both engines bucket identically by construction. One
    * combine-friendly aggregation to the fixed 168-cell matrix; the
    * share window runs over that domain relation. */
  def qEventsSeasonality(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .select(expr("(ts div 86400000000000 + 3) % 7").as("dow"),
        expr("(ts div 3600000000000) % 24").as("hod"),
        col("user_id"))
      .groupBy(col("dow"), col("hod"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    cells
      .withColumn("day_total",
        sum(col("n_events")).over(Window.partitionBy(col("dow"))))
      .select(col("dow").cast(LongType).as("dow"),
        col("hod").cast(LongType).as("hod"),
        col("n_events").cast(LongType).as("n_events"),
        col("n_users").cast(LongType).as("n_users"),
        expr("n_events * 10000 div day_total").cast(LongType)
          .as("share_bp"))
      .orderBy("dow", "hod")
  }

  private val qEventsSeasonalityOracle =
    """WITH c AS (
      |  SELECT (epoch_ns(ts) // 86400000000000 + 3) % 7 AS dow,
      |    (epoch_ns(ts) // 3600000000000) % 24 AS hod,
      |    COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
      |  FROM events GROUP BY 1, 2)
      |SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
      |  CAST(n_events AS BIGINT) AS n_events,
      |  CAST(n_users AS BIGINT) AS n_users,
      |  CAST(n_events * 10000 //
      |    (SUM(n_events) OVER (PARTITION BY dow)) AS BIGINT) AS share_bp
      |FROM c ORDER BY dow, hod""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_cohorts" -> (qEventsCohorts _),
    "q_events_seasonality" -> (qEventsSeasonality _),
    "q_events_engagement" -> (qEventsEngagement _),
    "q_events_interarrival" -> (qEventsInterarrival _),
    "q_events_funnel_windowed" -> (qEventsFunnelWindowed _),
    "q_agg_incremental" -> (qAggIncremental _),
    "q_events_paths" -> (qEventsPaths _),
    "q_events_anomaly_robust" -> (qEventsAnomalyRobust _),
    "q_events_concurrency" -> (qEventsConcurrency _),
    "q_join_interval" -> (qJoinInterval _),
    "q_join_interval_agg" -> (qJoinIntervalAgg _),
    "q_window_running_distinct" -> (qWindowRunningDistinct _),
    "q_events_ewma" -> (qEventsEwma _),
    "q_events_attribution" -> (qEventsAttribution _),
    "q_scd2_build" -> (qScd2Build _),
    "q_join_temporal" -> (qJoinTemporal _),
    "q_events_ohlc" -> (qEventsOhlc _),
    "q_events_anomaly" -> (qEventsAnomaly _),
    "q_events_cusum" -> (qEventsCusum _),
    "q_events_session_window" -> (qEventsSessionWindow _),
    "q_events_transitions" -> (qEventsTransitions _),
    "q_events_retention" -> (qEventsRetention _),
    "q_events_funnel" -> (qEventsFunnel _),
    "q_events_densify" -> (qEventsDensify _),
    "q_events_tumble" -> (qEventsTumble _),
    "q_events_sliding" -> (qEventsSliding _),
    "q_events_sessions" -> (qEventsSessions _),
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_nearest" -> (qAsofNearest _),
    "q_events_cooccurrence" -> (qEventsCooccurrence _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_events_cohorts" -> qEventsCohortsOracle,
    "q_events_seasonality" -> qEventsSeasonalityOracle,
    "q_events_engagement" -> qEventsEngagementOracle,
    "q_events_interarrival" -> qEventsInterarrivalOracle,
    "q_events_funnel_windowed" -> qEventsFunnelWindowedOracle,
    "q_agg_incremental" -> qAggIncrementalOracle,
    "q_events_paths" -> qEventsPathsOracle,
    "q_events_anomaly_robust" -> qEventsAnomalyRobustOracle,
    "q_events_concurrency" -> qEventsConcurrencyOracle,
    "q_join_interval" -> qJoinIntervalOracle,
    "q_join_interval_agg" -> qJoinIntervalAggOracle,
    "q_window_running_distinct" -> qWindowRunningDistinctOracle,
    "q_events_ewma" -> qEventsEwmaOracle,
    "q_events_attribution" -> qEventsAttributionOracle,
    "q_scd2_build" -> qScd2BuildOracle,
    "q_join_temporal" -> qJoinTemporalOracle,
    "q_events_ohlc" -> qEventsOhlcOracle,
    "q_events_anomaly" -> qEventsAnomalyOracle,
    "q_events_cusum" -> qEventsCusumOracle,
    "q_events_session_window" -> qEventsSessionWindowOracle,
    "q_events_transitions" -> qEventsTransitionsOracle,
    "q_events_retention" -> qEventsRetentionOracle,
    "q_events_funnel" -> qEventsFunnelOracle,
    "q_events_densify" -> qEventsDensifyOracle,
    "q_events_tumble" -> qEventsTumbleOracle,
    "q_events_sliding" -> qEventsSlidingOracle,
    "q_events_sessions" -> qEventsSessionsOracle,
    "q_asof_join" -> qAsofJoinOracle,
    "q_asof_nearest" -> qAsofNearestOracle,
    "q_events_cooccurrence" -> qEventsCooccurrenceOracle
  )
}
