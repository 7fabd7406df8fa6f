package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_tumble" -> (qEventsTumble _),
    "q_events_sessions" -> (qEventsSessions _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_events_tumble" -> qEventsTumbleOracle,
    "q_events_sessions" -> qEventsSessionsOracle
  )
}
