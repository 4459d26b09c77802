package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sketches as streaming state. A sketch's defining property — bounded,
  * MERGEABLE state — is exactly what a stateful streaming operator wants:
  * the per-batch partial folds into the carried state by the sketch's own
  * merge (max for HLL registers), so the streamed sketch equals the batch
  * sketch over the same data, under any micro-batch split or disorder.
  * That equality is oracle-checked: `stream_hll_distinct` runs against
  * the SAME DuckDB SQL as the batch `sketch_hll_distinct`.
  */
object SketchState {

  case class HllIn(event_type: String, bucket: Int, rho: Int)
  case class HllRegs(regs: Seq[Int], rev: Long)
  case class HllOut(event_type: String, regs: Seq[Int], rev: Long)

  /** Per-key HyperLogLog registers (m ints of state per key — the gauge
    * form of the reference's per-type distinct monitoring). Emits the
    * register vector with a revision only when a batch CHANGES it; an
    * upsert sink keyed on event_type then always holds what a batch
    * computation over the full history would produce. Registers only
    * grow, so emissions are monotone and late data can never require
    * retraction — the sketch is its own retraction story. */
  def hllRegisters(ds: Dataset[HllIn], m: Int): Dataset[HllOut] = {
    implicit val outEnc = Encoders.product[HllOut]
    implicit val stateEnc = Encoders.product[HllRegs]
    ds.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, events: Iterator[HllIn], state: GroupState[HllRegs]) =>
          val regs = state.getOption.map(_.regs.toArray)
            .getOrElse(Array.fill(m)(0))
          var changed = false
          events.foreach { e =>
            if (e.rho > regs(e.bucket)) { regs(e.bucket) = e.rho; changed = true }
          }
          if (changed) {
            val rev = state.getOption.map(_.rev).getOrElse(0L) + 1L
            state.update(HllRegs(regs.toSeq, rev))
            Iterator.single(HllOut(key, regs.toSeq, rev))
          } else Iterator.empty
      }
  }

  case class KmvIn(side: String, h: Long)
  case class KmvState(hs: Seq[Long], rev: Long)
  case class KmvOut(side: String, hs: Seq[Long], rev: Long)

  /** Per-key KMV (bottom-k) distinct sketch as streaming state: a sorted
    * array of the k smallest distinct hashes seen for the key. The KMV
    * merge is "k smallest of the union" — commutative and idempotent, so
    * the streamed sketch equals the batch sketch over the same data
    * under any micro-batch split or replay (duplicates are no-ops by
    * construction). State is one primitive array of ≤ k longs per key
    * (the heap-discipline rule); insertion is binary search + arraycopy.
    * The sketch only ever tightens (values can only get smaller), so
    * emissions are monotone — no retraction story needed, same contract
    * as the HLL registers above. */
  def kmvBottomK(ds: Dataset[KmvIn], k: Int): Dataset[KmvOut] = {
    implicit val outEnc = Encoders.product[KmvOut]
    implicit val stateEnc = Encoders.product[KmvState]
    ds.groupByKey(_.side)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (side: String, events: Iterator[KmvIn], state: GroupState[KmvState]) =>
          var hs = state.getOption.map(_.hs.toArray).getOrElse(Array.empty[Long])
          var changed = false
          events.foreach { e =>
            val pos = java.util.Arrays.binarySearch(hs, e.h)
            if (pos < 0) { // not already in the sketch
              val ins = -pos - 1
              if (hs.length < k) {
                val next = new Array[Long](hs.length + 1)
                System.arraycopy(hs, 0, next, 0, ins)
                next(ins) = e.h
                System.arraycopy(hs, ins, next, ins + 1, hs.length - ins)
                hs = next; changed = true
              } else if (ins < k) { // evict the current max
                System.arraycopy(hs, ins, hs, ins + 1, k - ins - 1)
                hs(ins) = e.h; changed = true
              }
            }
          }
          if (changed) {
            val rev = state.getOption.map(_.rev).getOrElse(0L) + 1L
            state.update(KmvState(hs.toSeq, rev))
            Iterator.single(KmvOut(side, hs.toSeq, rev))
          } else Iterator.empty
      }
  }

  case class CmsIn(r: Int, c: Int)
  case class CmsRow(counts: Seq[Long], rev: Long)
  case class CmsOut(r: Int, counts: Seq[Long], rev: Long)

  /** Count-min grid as streaming state, one key per sketch ROW (d keys,
    * w counters each — the CMS merge is per-cell ADDITION, so the batch
    * partial folds in exactly and the streamed grid equals the batch
    * grid under any micro-batch split). Emits a row vector with a
    * revision only when a batch changes it; counts only grow, so an
    * upsert sink keyed on r converges with no retraction — same contract
    * as the HLL registers above, additive instead of max-mergeable. */
  def cmsGrid(ds: Dataset[CmsIn], w: Int): Dataset[CmsOut] = {
    implicit val outEnc = Encoders.product[CmsOut]
    implicit val stateEnc = Encoders.product[CmsRow]
    ds.groupByKey(_.r)(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (r: Int, events: Iterator[CmsIn], state: GroupState[CmsRow]) =>
          val counts = state.getOption.map(_.counts.toArray)
            .getOrElse(Array.fill(w)(0L))
          var changed = false
          events.foreach { e =>
            counts(e.c) += 1L; changed = true
          }
          if (changed) {
            val rev = state.getOption.map(_.rev).getOrElse(0L) + 1L
            state.update(CmsRow(counts.toSeq, rev))
            Iterator.single(CmsOut(r, counts.toSeq, rev))
          } else Iterator.empty
      }
  }
}
