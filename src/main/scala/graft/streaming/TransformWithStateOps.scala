package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import StatefulFeatures.{AnchoredCounts, Buf, CountBucket, EventIn, EventInTs}

/** Spark 4 `transformWithState` form of the anchored multi-horizon counts
  * operator (W3 + W4/W11) — the arbitrary-stateful API that supersedes
  * `flatMapGroupsWithState`: named state variables on a
  * StatefulProcessorHandle instead of one opaque GroupState, and explicit
  * per-key event-time TIMERS instead of the single timeout slot.
  *
  * Semantics are IDENTICAL to [[StatefulFeatures.anchoredCountsExpiring]]
  * by construction: both wrappers drive the same
  * [[StatefulFeatures.countsCore]] bucket walk (per-event RANGE-frame
  * counts over the minute-bucketed 24 h buffer), and the idle-eviction
  * timer re-arms at frontier + idleMs clamped above the current watermark
  * — the same arming rule as `armTimeout`. The oracle is therefore the
  * same RANGE-frame SQL, and ParitySpec can diff the two engines row for
  * row.
  *
  * Runtime note: transformWithState requires the RocksDB state store
  * provider (the 100 TB state path this repo already proves
  * backend-invariance on) — the pipeline wrapper pins the provider conf
  * for the query's duration. Ref anchor for the operator semantics:
  * streaming/flink/feature_job.py:282-305 (state expiry) on top of the
  * per-event emission the reference's processors do.
  */
class AnchoredCountsProcessor(idleMs: Long = graft.core.Horizons.H24H)
    extends StatefulProcessor[Long, EventInTs, AnchoredCounts] {

  @transient private var buf: ValueState[Buf] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getValueState[Buf]("buf", Encoders.product[Buf],
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[EventInTs],
      timers: TimerValues): Iterator[AnchoredCounts] = {
    val init =
      if (buf.exists()) buf.get().buckets.toVector else Vector.empty
    val sorted = rows.toVector
      .map(e => EventIn(e.event_id, e.user_id, e.ems, e.value))
      .sortBy(e => (e.ems, e.event_id))
    val (nb, out) = StatefulFeatures.countsCore(key, sorted, init)
    buf.update(Buf(nb))
    // re-arm the single idle-eviction timer: delete the stale one(s),
    // register at the key frontier + idle horizon, clamped above the
    // watermark (same rule as flatMapGroups' armTimeout)
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    nb.lastOption.foreach { b =>
      getHandle.registerTimer(
        math.max(b.ems.last + idleMs, timers.getCurrentWatermarkInMs + 1))
    }
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[AnchoredCounts] = {
    // key idle past the horizon: an empty buffer would reproduce every
    // future answer, so dropping state changes nothing but store size
    buf.clear()
    Iterator.empty
  }
}
