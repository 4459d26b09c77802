package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-anchored, per-event-emission feature computation (SURVEY.md W3 —
  * the single biggest semantic decision): the reference's simple processor
  * recomputes features on EVERY event arrival with the window anchored at
  * the current event's timestamp (ref streaming/simple/stream_processor.py
  * :183-256, processors/transaction.py:33-207), which aligned `window()`
  * buckets cannot express. This is the arbitrary-stateful-processing path:
  * `groupByKey(entity).flatMapGroupsWithState` holding a 24 h event-time
  * ring buffer per key and emitting one feature row per input event.
  *
  * State discipline for 100 TB streams: the buffer holds (ems, value)
  * pairs inside the largest horizon only — eviction on every append — and
  * all sub-horizon aggregates are computed from the sorted buffer tail.
  * Decomposable aggregates (count/sum) could be kept as running partials
  * per horizon (strictly smaller state); the buffer form is chosen because
  * it also serves the non-decomposable per-event features (z-score vs the
  * anchored window, A12/A13) and stays bounded by events-per-key-per-24 h.
  */
object StatefulFeatures {

  case class EventIn(event_id: Long, user_id: Long, ems: Long, value: Double)

  case class AnchoredCounts(
      event_id: Long, user_id: Long, ems: Long,
      cnt_5m: Long, cnt_30m: Long, cnt_24h: Long)

  /** Buffer of events within the trailing 24 h, ascending by ems. */
  case class Buf(ems: Seq[Long])

  val H5M = 300000L
  val H30M = 1800000L
  val H24H = 86400000L

  /** Per-event multi-horizon counts, emitted on every arrival. Events are
    * processed in (ems, event_id) order within each group/micro-batch;
    * a window covers (ts - horizon, ts] — identical to the RANGE-frame
    * batch formulation, which is its oracle. */
  def anchoredCounts(ds: Dataset[EventIn]): Dataset[AnchoredCounts] = {
    implicit val outEnc = Encoders.product[AnchoredCounts]
    implicit val stateEnc = Encoders.product[Buf]
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[EventIn], state: GroupState[Buf]) =>
          var buf = state.getOption.map(_.ems.toVector).getOrElse(Vector.empty)
          val out = events.toVector.sortBy(e => (e.ems, e.event_id)).map { e =>
            // insert (keeps order even for cross-batch late arrivals)
            val at = buf.indexWhere(_ > e.ems)
            buf = if (at < 0) buf :+ e.ems
                  else (buf.take(at) :+ e.ems) ++ buf.drop(at)
            buf = buf.dropWhile(_ <= e.ems - H24H) // evict beyond 24 h
            // upper bound <= e.ems matters for late arrivals: the buffer may
            // already hold newer events, which the event-anchored window of
            // a late event must not see (RANGE-frame parity)
            def cnt(h: Long) = buf.count(t => t > e.ems - h && t <= e.ems)
            AnchoredCounts(e.event_id, uid, e.ems,
              cnt_5m = cnt(H5M), cnt_30m = cnt(H30M), cnt_24h = cnt(H24H))
          }
          state.update(Buf(buf))
          out.iterator
      }
  }
}
