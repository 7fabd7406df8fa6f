package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming last-touch attribution on `transformWithState`: each user
  * key carries its latest non-purchase touch in a `ValueState`, and
  * every purchase emits immediately, credited to that touch (or
  * `direct`). The LIVE form of the batch window
  * (graft.queries.Events.qEventsAttribution's pre-aggregation) — no
  * watermark or timer is needed because attribution looks only
  * BACKWARD: a purchase's credit is fixed the moment it arrives.
  *
  * Within a micro-batch the row iterator carries no order guarantee,
  * so the processor REPLAYS the batch's rows per key in (event-time,
  * event_id) order — the same total order the batch window sorts by;
  * across batches the time-split feed preserves that order globally,
  * which is what makes the streamed changelog hash-equal to the batch
  * query over the whole corpus.
  *
  * Out-of-order guard: a purchase whose (ts_us, event_id) precedes the
  * stored touch's arrived LATE across a micro-batch boundary — its true
  * last-touch is unrecoverable from one-row state, so it is flagged
  * with the distinct `late` channel rather than silently credited to a
  * FUTURE touch. Under the ordered-feed contract the branch never
  * fires (the hash gate is unchanged); under a disordered production
  * feed the degradation is visible in the output instead of silent.
  *
  * 100 TB story: state is ONE tiny row per user (the last touch), not
  * per event; purchases stream through append-only. The per-key
  * in-batch sort is bounded by a user's events within one micro-batch
  * — rate-bounded under a production trigger; note the GATE harness
  * feeds half the corpus per batch, so there the buffer is
  * corpus-bounded by construction of the test feed, not of the
  * operator.
  */
object Attribution {

  case class Touch(user_id: Long, ts_us: Long, event_id: Long,
                   event_type: String)
  case class LastTouch(ts_us: Long, event_id: Long, event_type: String)
  case class Credit(event_id: Long, user_id: Long, channel: String)

  class Processor extends StatefulProcessor[Long, Touch, Credit] {
    @transient private var last: ValueState[LastTouch] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastTouch](
        "last_touch", Encoders.product[LastTouch], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Touch],
                                 tv: TimerValues): Iterator[Credit] = {
      val ordered = rows.toSeq.sortBy(t => (t.ts_us, t.event_id))
      var cur = if (last.exists()) Some(last.get()) else None
      val out = Seq.newBuilder[Credit]
      ordered.foreach { t =>
        if (t.event_type == "purchase") {
          val channel = cur match {
            case None => "direct"
            case Some(l)
              if l.ts_us < t.ts_us ||
                (l.ts_us == t.ts_us && l.event_id < t.event_id) =>
              l.event_type
            case Some(_) => "late" // touch is FUTURE of this purchase
          }
          out += Credit(t.event_id, key, channel)
        } else {
          val later = cur.forall(l =>
            t.ts_us > l.ts_us || (t.ts_us == l.ts_us && t.event_id > l.event_id))
          if (later) cur = Some(LastTouch(t.ts_us, t.event_id, t.event_type))
        }
      }
      cur.foreach(last.update)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Credit] =
      Iterator.empty
  }

  def creditStream(events: Dataset[Touch]): Dataset[Credit] = {
    implicit val outEnc = Encoders.product[Credit]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
