package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming CDC materialization on Spark 4's `transformWithState`
  * (the arbitrary-stateful-processing successor to
  * [[org.apache.spark.sql.streaming.GroupState]]): each key's LATEST
  * change (max by event time, event_id tiebreak) is held in a
  * `ValueState`, and an EVENT-TIME TIMER flushes the materialized row
  * once the watermark proves the key quiescent — the flushed key LEAVES
  * the state store, so state holds only watermark-active keys. This is
  * the feature-store / table-materialization half of CDC; the batch
  * MERGE half is [[graft.queries.Cdc]].
  *
  * Emission contract (what the oracle states in SQL): a key flushes
  * whenever the watermark passes its last-seen event time, emitting the
  * state AS OF that moment and clearing it. Re-arrivals re-open the key
  * and flush again later, so the sink is a CHANGELOG of quiescent-point
  * snapshots; the consumer's read — latest row per key — is part of the
  * operator (q_stream_cdc's trailing argmax). For a time-ordered feed,
  * the latest flush of every flushed key carries the key's GLOBAL
  * latest change (later batches only hold later events), which is what
  * makes the end-to-end result batch-expressible: every key whose last
  * event time (ms-floored, Spark's event-time-stats precision) is
  * strictly below the final watermark materializes its full-corpus
  * latest row; keys still inside the watermark horizon remain in state,
  * unemitted, exactly as on a live stream.
  *
  * One live timer per key: `handleInputRows` deletes the previous
  * flush timer (its expiry is recoverable from the carried state — no
  * timer-listing scan) before registering the new last-event-time
  * timer, so a key that was NOT yet flushed when newer events arrived
  * cannot double-fire a stale timer.
  *
  * 100 TB story: the canonical keyed-state shape — state is one tiny
  * row per ACTIVE key (bounded by key-arrival rate × watermark horizon,
  * not the all-time key set), partitioned by the groupBy key across the
  * store instances; timers are per-key range-scanned by the store, no
  * driver involvement. transformWithState requires the RocksDB provider
  * (multi-column-family state), which is also the at-scale provider —
  * state lives on executor local disk with bounded heap.
  */
object LatestState {

  /** `ts_ts` is the µs TimestampType twin of `ts_us` the upstream
    * watermark rides on (the Sessionize.EvT convention). */
  case class Change(user_id: Long, ts_us: Long, event_id: Long,
                    event_type: String, value: Double,
                    ts_ts: java.sql.Timestamp)
  case class Latest(ts_us: Long, event_id: Long, event_type: String,
                    value: Double)
  case class Snapshot(user_id: Long, as_of_us: Long, last_event_id: Long,
                      last_type: String, last_value: Double)

  /** ms-floored event time — the granularity of watermarks and timers. */
  private def ms(tsUs: Long): Long = Math.floorDiv(tsUs, 1000L)

  class Processor extends StatefulProcessor[Long, Change, Snapshot] {
    @transient private var latest: ValueState[Latest] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[Latest](
        "latest", Encoders.product[Latest], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Change],
                                 tv: TimerValues): Iterator[Snapshot] = {
      val prev = if (latest.exists()) Some(latest.get()) else None
      var cur = prev
      rows.foreach { c =>
        val later = cur.forall(l =>
          c.ts_us > l.ts_us || (c.ts_us == l.ts_us && c.event_id > l.event_id))
        if (later) cur = Some(Latest(c.ts_us, c.event_id, c.event_type, c.value))
      }
      cur.foreach { l =>
        // keep exactly one live timer: the previous one (at the prior
        // last-event time) is superseded by this batch's arrivals
        val newMs = ms(l.ts_us)
        prev match {
          case Some(p) if ms(p.ts_us) == newMs => () // already set here
          case Some(p) =>
            getHandle.deleteTimer(ms(p.ts_us))
            getHandle.registerTimer(newMs)
          case None => getHandle.registerTimer(newMs)
        }
        latest.update(l)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Snapshot] = {
      // a cleared-then-reopened key can still see a stale timer if the
      // re-open landed in the same batch as the expiry; emit only the
      // timer that matches the carried state
      if (latest.exists() && ms(latest.get().ts_us) == info.getExpiryTimeInMs) {
        val l = latest.get()
        latest.clear()
        Iterator.single(Snapshot(key, l.ts_us, l.event_id, l.event_type, l.value))
      } else Iterator.empty
    }
  }

  /** `changes` must carry a watermark on its event-time column before
    * grouping (the caller owns column naming; see q_stream_cdc). */
  def latestStream(changes: Dataset[Change]): Dataset[Snapshot] = {
    implicit val outEnc = Encoders.product[Snapshot]
    changes.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.EventTime(), OutputMode.Append())
  }
}
