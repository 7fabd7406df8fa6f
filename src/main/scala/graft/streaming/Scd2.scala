package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD Type-2 interval build — the keyed-state twin of the
  * oracle-checked window-form batch query (Events.qScd2Build), the same
  * three-surface architecture as Sessionize:
  *  - one pure fold shared by every surface turns an ascending event
  *    sequence (+ an optionally carried open version) into closed
  *    [valid_from, valid_to) versions and the still-open tail;
  *  - `scd2Batch` runs it per user via groupByKey.flatMapGroups;
  *  - `scd2Stream` runs it incrementally via flatMapGroupsWithState:
  *    the OPEN version (the dimension's current row) lives in GroupState
  *    across micro-batches, closed versions emit as the attribute
  *    changes, and a processing-time timeout can flush the open tail.
  *
  * State is one OpenVer per user — constant per key, the same 100 TB
  * argument as sessionization (state store partitioned by user, no
  * driver involvement). A CDC consumer applies closed versions as
  * UPDATE+INSERT pairs; the open row is the SCD's is_current record.
  */
// extends Serializable: the stream's per-group function calls the shared
// `fold`, so the closure captures this (stateless) object — Sessionize's
// function inlines its logic and never hits this, but sharing the fold
// across all three surfaces is worth the one-word cost.
object Scd2 extends Serializable {

  case class Ev(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  case class Version(user_id: Long, version: Long, attr_value: String,
                     valid_from: Long, valid_to: Long, n_events: Long)
  case class OpenVer(version: Long, attr_value: String, valid_from: Long,
                     n_events: Long)

  /** Fold an ascending (ts_us, event_id)-ordered event sequence into
    * closed versions + the open tail. `carried` resumes a prior open
    * version (same attribute extends it; a different one closes it at
    * the first new event's timestamp). */
  def fold(uid: Long, sorted: Seq[Ev], carried: Option[OpenVer])
      : (Seq[Version], Option[OpenVer]) = {
    if (sorted.isEmpty) return (Seq.empty, carried)
    val closed = Seq.newBuilder[Version]
    var open = carried match {
      case Some(o) if o.attr_value == sorted.head.event_type => o
      case Some(o) =>
        closed += Version(uid, o.version, o.attr_value, o.valid_from,
          sorted.head.ts_us, o.n_events)
        OpenVer(o.version + 1, sorted.head.event_type, sorted.head.ts_us, 0L)
      case None =>
        OpenVer(0L, sorted.head.event_type, sorted.head.ts_us, 0L)
    }
    sorted.foreach { e =>
      if (e.event_type != open.attr_value) {
        closed += Version(uid, open.version, open.attr_value, open.valid_from,
          e.ts_us, open.n_events)
        open = OpenVer(open.version + 1, e.event_type, e.ts_us, 1L)
      } else {
        open = open.copy(n_events = open.n_events + 1)
      }
    }
    (closed.result(), Some(open))
  }

  /** Batch form: deterministic closed+open versions per user. The open
    * tail emits with valid_to = Long.MaxValue (the is_current marker in
    * this typed surface). */
  def scd2Batch(events: Dataset[Ev]): Dataset[Version] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      val (closed, open) =
        fold(uid, it.toSeq.sortBy(e => (e.ts_us, e.event_id)), None)
      (closed ++ open.map(o =>
        Version(uid, o.version, o.attr_value, o.valid_from,
          Long.MaxValue, o.n_events))).iterator
    }
  }

  /** Streaming form: closed versions emit as attribute changes are
    * observed; the open version persists in GroupState. timeoutMs > 0
    * flushes idle users' open version (valid_to = Long.MaxValue);
    * timeoutMs = 0 keeps them in state indefinitely. */
  def scd2Stream(events: Dataset[Ev], timeoutMs: Long = 0)
      : Dataset[Version] = {
    val spark = events.sparkSession
    import spark.implicits._

    def fn(uid: Long, it: Iterator[Ev], state: GroupState[OpenVer])
        : Iterator[Version] = {
      if (state.hasTimedOut) {
        val o = state.get
        state.remove()
        return Iterator.single(Version(uid, o.version, o.attr_value,
          o.valid_from, Long.MaxValue, o.n_events))
      }
      val batch = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val (closed, open) = fold(uid, batch, state.getOption)
      open match {
        case Some(o) =>
          state.update(o)
          if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
        case None =>
      }
      closed.iterator
    }

    val timeout =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(fn)
  }
}
