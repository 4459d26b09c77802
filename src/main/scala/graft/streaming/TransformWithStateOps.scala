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
object AnchoredCountsMapProcessor {
  /** MapState value: one minute's timestamps (case class because the
    * state handle wants a product encoder). */
  case class MinuteEms(ems: Array[Long])
}

/** The MapState layout of the same operator: minute → timestamps as a
  * per-key MAP instead of one monolithic buffer value. Semantically
  * identical (same countsCore walk, same oracle); the difference is the
  * STATE WRITE GRANULARITY, which is the point of the new API at scale —
  * an in-order arrival touches ONE minute entry (plus head evictions as
  * key removals), so the RocksDB commit writes O(touched minutes)
  * instead of rewriting the whole ≤1441-bucket buffer every batch the
  * key is active. ParitySpec diffs all three runtimes (GroupState,
  * ValueState, MapState) row for row. */
class AnchoredCountsMapProcessor(idleMs: Long = graft.core.Horizons.H24H)
    extends StatefulProcessor[Long, EventInTs, AnchoredCounts] {
  import org.apache.spark.sql.streaming.MapState
  import AnchoredCountsMapProcessor.MinuteEms

  @transient private var minutes: MapState[Long, MinuteEms] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    minutes = getHandle.getMapState[Long, MinuteEms]("minutes",
      Encoders.scalaLong, Encoders.product[MinuteEms], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[EventInTs],
      timers: TimerValues): Iterator[AnchoredCounts] = {
    val init = minutes.iterator()
      .map { case (m, v) => CountBucket(m, v.ems) }
      .toVector.sortBy(_.minute)
    val sorted = rows.toVector
      .map(e => EventIn(e.event_id, e.user_id, e.ems, e.value))
      .sortBy(e => (e.ems, e.event_id))
    val (nb, out) = StatefulFeatures.countsCore(key, sorted, init)
    // granular write-back: only touched minutes write, evicted remove
    val newByMinute = nb.map(b => b.minute -> b.ems).toMap
    init.foreach { b =>
      if (!newByMinute.contains(b.minute)) minutes.removeKey(b.minute)
    }
    val oldByMinute = init.map(b => b.minute -> b.ems).toMap
    nb.foreach { b =>
      val unchanged = oldByMinute.get(b.minute).exists(_.sameElements(b.ems))
      if (!unchanged) minutes.updateValue(b.minute, MinuteEms(b.ems))
    }
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    nb.lastOption.foreach { b =>
      getHandle.registerTimer(
        math.max(b.ems.last + idleMs, timers.getCurrentWatermarkInMs + 1))
    }
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[AnchoredCounts] = {
    minutes.clear()
    Iterator.empty
  }
}

object RecentTypesProcessor {
  /** Event carrying its type string (the anchored-counts inputs don't). */
  case class TypedEventIn(event_id: Long, user_id: Long, ems: Long,
      event_type: String, ts: java.sql.Timestamp)
  case class RecentTypes(event_id: Long, user_id: Long, ems: Long,
      depth: Long, recent_types: String)
}

/** ListState showcase: per-event "recent event types" feature — for every
  * arrival, the window of the user's last ≤5 event types (current
  * included), joined with '|' in event-time order. The state is the
  * trailing ≤4-entry type LOG per key, and the two ListState write paths
  * map onto the log-structured pattern the API is built for:
  *
  *   - a batch that keeps the log within bounds issues PURE APPENDS
  *     (`appendValue` — RocksDB merge-operand writes, never reading or
  *     rewriting the existing list);
  *   - a batch that overflows the bound COMPACTS (`clear` + `put` of the
  *     trailing window) — the log-compaction step, amortized O(1) per
  *     arrival.
  *
  * Unlike the anchored-counts family there is NO idle-eviction timer:
  * the trailing window never expires semantically (an event a year later
  * still lists its predecessors), and the state is already O(1) per key
  * — eviction would CHANGE answers, not just shrink state. Within-batch
  * arrivals sort by (ems, event_id); cross-batch order is the replay's
  * event-time order (same contract as the anchored family). */
class RecentTypesProcessor(n: Int = 5)
    extends StatefulProcessor[Long, RecentTypesProcessor.TypedEventIn,
      RecentTypesProcessor.RecentTypes] {
  import org.apache.spark.sql.streaming.ListState
  import RecentTypesProcessor._

  @transient private var recent: ListState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    recent = getHandle.getListState[String]("recent", Encoders.STRING,
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[TypedEventIn],
      timers: TimerValues): Iterator[RecentTypes] = {
    val prior = recent.get().toVector
    val sorted = rows.toVector.sortBy(e => (e.ems, e.event_id))
    var log = prior
    val out = sorted.map { e =>
      log = log :+ e.event_type
      val win = log.takeRight(n)
      RecentTypes(e.event_id, key, e.ems, win.length.toLong,
        win.mkString("|"))
    }
    if (log.length <= n - 1)
      sorted.foreach(e => recent.appendValue(e.event_type)) // pure append
    else {
      recent.clear() // log compaction: keep the trailing window only
      recent.put(log.takeRight(n - 1).toArray)
    }
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[RecentTypes] = Iterator.empty
}

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
