package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Ordered-funnel tracking with keyed state — the streaming twin of
  * the oracle-checked batch funnel (Events.qEventsFunnel): per user,
  * step i's timestamp is the FIRST step-i event strictly after the
  * recorded step i-1 timestamp, maintained incrementally across
  * micro-batches in GroupState. Each batch emits the user's deepest
  * reached stage (Update mode); step counts are stage ≥ k tallies.
  *
  * State is one tiny step-timestamp vector per user — the same
  * canonical keyed-state shape as Sessionize (state store partitioned
  * by the groupBy key, no driver involvement at any corpus size).
  * Like all event-time state here, correctness relies on per-user
  * ts-ascending arrival (event-time ordering within the key), which
  * the spec's ts-ordered file batches provide.
  */
object Funnel {
  case class FEv(user_id: Long, ts: Long, event_type: String)
  case class Progress(t: Seq[Long])
  case class StageUpdate(user_id: Long, stage: Int)

  val Steps: Seq[String] = Seq("view", "click", "purchase")
  private val Unset = Long.MaxValue

  /** Fold a ts-ascending slice of one user's events into the step-
    * timestamp vector. t(0) is the MIN view ts (it may still improve
    * downward); step i > 0 fills once, with the first qualifying ts
    * after t(i-1) — in ascending order that IS the minimum, matching
    * the batch query's `min(ts) where ts > prev` exactly. */
  def advance(t0: Array[Long], events: Seq[(Long, String)]): Array[Long] = {
    val t = t0.clone()
    events.foreach { case (ts, tp) =>
      val i = Steps.indexOf(tp)
      if (i == 0) { if (ts < t(0)) t(0) = ts }
      else if (i > 0 && t(i) == Unset && t(i - 1) != Unset && ts > t(i - 1))
        t(i) = ts
    }
    t
  }

  def stage(t: Array[Long]): Int = t.takeWhile(_ != Unset).length

  def funnelStream(events: Dataset[FEv]): Dataset[StageUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FEv], state: GroupState[Progress]) =>
          val t0 = state.getOption.map(_.t.toArray)
            .getOrElse(Array.fill(Steps.length)(Unset))
          val t = advance(t0, it.map(e => (e.ts, e.event_type)).toSeq.sortBy(_._1))
          state.update(Progress(t.toSeq))
          StageUpdate(uid, stage(t))
      }
  }
}
