package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization with custom state (SURVEY.md §2.D q_events_session_state).
  *
  * The session-splitting core is one pure function shared by three
  * surfaces:
  *  - the oracle-checked window-based batch query (Events.qEventsSessions)
  *    is its relational twin;
  *  - `sessionizeBatch` runs it per user via groupByKey.flatMapGroups;
  *  - `sessionizeStream` runs it incrementally via
  *    flatMapGroupsWithState, carrying the open session across
  *    micro-batches and closing it on processing-time timeout.
  *
  * State is one tiny OpenSession per user — at 100 TB/millions of users
  * this is the canonical keyed-state pattern (state store partitioned by
  * the groupBy key, no driver involvement).
  */
object Sessionize {

  case class Ev(user_id: Long, ts_us: Long)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)
  case class OpenSession(start_us: Long, end_us: Long, n_events: Long)

  val DefaultGapUs: Long = 30L * 60 * 1000000L

  /** Split an ascending-ts event sequence into gap-delimited sessions. */
  def split(userId: Long, sorted: Seq[Long], gapUs: Long): Seq[Session] = {
    if (sorted.isEmpty) return Seq.empty
    val out = Seq.newBuilder[Session]
    var start = sorted.head; var last = sorted.head; var n = 1L
    sorted.tail.foreach { t =>
      if (t - last > gapUs) {
        out += Session(userId, start, last, n)
        start = t; n = 0
      }
      last = t; n += 1
    }
    out += Session(userId, start, last, n)
    out.result()
  }

  /** Batch form: deterministic, used by the q_events_session_state query. */
  def sessionizeBatch(events: Dataset[Ev], gapUs: Long = DefaultGapUs): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      split(uid, it.map(_.ts_us).toSeq.sorted, gapUs).iterator
    }
  }

  /** Streaming form: open sessions persist in GroupState between
    * micro-batches; a processing-time timeout (timeoutMs > 0) flushes
    * them, or pass timeoutMs = 0 to keep open sessions in state
    * indefinitely (closed sessions still emit as gaps are observed). */
  def sessionizeStream(events: Dataset[Ev], gapUs: Long = DefaultGapUs,
                       timeoutMs: Long = 1000): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def fn(uid: Long, it: Iterator[Ev], state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val open = state.get
        state.remove()
        return Iterator.single(Session(uid, open.start_us, open.end_us, open.n_events))
      }
      val ts = it.map(_.ts_us).toSeq.sorted
      if (ts.isEmpty) return Iterator.empty
      val closed = Seq.newBuilder[Session]
      // resume the carried-over open session when the gap bridges,
      // otherwise close it now and start fresh
      var (start, last, n) = state.getOption match {
        case Some(o) if ts.head - o.end_us <= gapUs => (o.start_us, o.end_us, o.n_events)
        case Some(o) =>
          closed += Session(uid, o.start_us, o.end_us, o.n_events)
          (ts.head, ts.head, 0L)
        case None => (ts.head, ts.head, 0L)
      }
      ts.foreach { t =>
        if (n > 0 && t - last > gapUs) {
          closed += Session(uid, start, last, n); start = t; n = 0
        }
        last = t; n += 1
      }
      state.update(OpenSession(start, last, n))
      if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
      closed.result().iterator
    }

    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(fn)
  }

  /** Event with the event-time column a watermark can ride on (`ts_ts`,
    * µs TimestampType) alongside the integer µs the session arithmetic
    * uses. */
  case class EvT(user_id: Long, ts_us: Long, ts_ts: java.sql.Timestamp)

  /** BOUNDED-state streaming form: EventTimeTimeout + an upstream
    * watermark on `ts_ts`. Each key's open session carries a timeout at
    * (last event + gap); when the event-time watermark passes it, the
    * open session flushes as closed and the key's state is REMOVED — so
    * state holds only users whose sessions are still inside the gap
    * horizon, never the all-time key set (the production setting; the
    * NoTimeout form above exists for the boundary-invariance oracle).
    *
    * Determinism contract (what lets the driver hash-gate this): the
    * caller feeds time-ordered batches with watermark delay 0. A key
    * that times out between batches can only see later events beyond its
    * gap (they sit past the watermark that fired the timeout), so the
    * timeout-split and the gap-split agree, and the final emitted set is
    * exactly: every gap-closed session, plus each user's last session
    * iff floor(last_us/1000) + gap_ms < floor(max_ts_us/1000) (Spark
    * tracks watermarks in ms and fires on strict <). */
  def sessionizeStreamBounded(events: Dataset[EvT],
                              gapUs: Long = DefaultGapUs): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapUs / 1000

    def fn(uid: Long, it: Iterator[EvT], state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val open = state.get
        state.remove()
        return Iterator.single(Session(uid, open.start_us, open.end_us, open.n_events))
      }
      val ts = it.map(_.ts_us).toSeq.sorted
      if (ts.isEmpty) return Iterator.empty
      val closed = Seq.newBuilder[Session]
      var (start, last, n) = state.getOption match {
        case Some(o) if ts.head - o.end_us <= gapUs => (o.start_us, o.end_us, o.n_events)
        case Some(o) =>
          closed += Session(uid, o.start_us, o.end_us, o.n_events)
          (ts.head, ts.head, 0L)
        case None => (ts.head, ts.head, 0L)
      }
      ts.foreach { t =>
        if (n > 0 && t - last > gapUs) {
          closed += Session(uid, start, last, n); start = t; n = 0
        }
        last = t; n += 1
      }
      // ms (Spark's watermark clock). On a time-ordered feed this is
      // always ahead of the current watermark (the batch's own data is
      // beyond it); if a racy/late delivery lands AFTER the watermark
      // passed this key's gap horizon, the open tail is already closed
      // by definition — emit it now (exactly what the timeout would
      // have done) instead of setting an illegal past timestamp.
      val timeoutAt = last / 1000 + gapMs
      if (timeoutAt >= state.getCurrentWatermarkMs()) {
        state.update(OpenSession(start, last, n))
        state.setTimeoutTimestamp(timeoutAt)
      } else {
        state.remove()
        closed += Session(uid, start, last, n)
      }
      closed.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
