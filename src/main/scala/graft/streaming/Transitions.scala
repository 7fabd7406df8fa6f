package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event-transition counting with keyed state — the streaming twin of
  * the oracle-checked batch transition matrix
  * (Events.qEventsTransitions): per user, each event emits one
  * (previous type → this type) step, with the previous type carried
  * across micro-batches in GroupState. The batch query's lead() over
  * the per-user time order becomes a one-value memory per key — the
  * smallest possible state (a single string), so the state store stays
  * O(active users) no matter how long the stream runs.
  *
  * The batch form also emits a final (last type → 'end') absorbing
  * step per user; a stream can only know "last" via timeout/watermark,
  * so the twin emits the OPEN transitions and the spec compares
  * against the batch matrix with the 'end' rows excluded — the same
  * closed-vs-open bookkeeping as Sessionize.
  *
  * Like all event-time state here, correctness relies on per-user
  * ts-ascending arrival, which the spec's ts-ordered file batches
  * provide.
  */
object Transitions {
  case class TEv(user_id: Long, ts: Long, event_id: Long, event_type: String)
  case class Step(from_type: String, to_type: String)

  def transitionStream(events: Dataset[TEv]): Dataset[Step] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[TEv], state: GroupState[String]) =>
          // the batch window orders by (ts µs, event_id) — same tiebreak
          val batch = it.toSeq.sortBy(e => (e.ts, e.event_id))
          var prev = state.getOption.orNull
          val out = batch.flatMap { e =>
            val s = Option(prev).map(p => Step(p, e.event_type))
            prev = e.event_type
            s
          }
          if (prev != null) state.update(prev)
          out.iterator
      }
  }
}
