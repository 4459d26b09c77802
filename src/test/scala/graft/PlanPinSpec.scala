package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingPipelines

/** Plan-regression pins for the stream-static joins (round-11, verdict
  * r10 #8, extending LayoutSpec's zero-Exchange pin): the static side of
  * every stream-static enrichment join is declared `broadcast(...)` — a
  * Spark upgrade dropping the hint (or a planner change overriding it)
  * would silently turn the per-micro-batch join into a shuffle on BOTH
  * sides, which the bench would only surface as a timing blip. These
  * specs run the real streaming query and inspect the last micro-batch's
  * executed physical plan (StreamingPipelines.lastExecutedPlan).
  *
  * The results themselves are oracle-checked (`stream_seasonality`,
  * `stream_scd_lookup`); these pin the PLAN.
  */
class PlanPinSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(run: => Unit): String = {
    run
    StreamingPipelines.lastExecutedPlan.getOrElse(
      fail("no executed plan captured"))
  }

  test("seasonality monitor: stream-static baseline join broadcasts") {
    val plan = planOf(StreamingPipelines.seasonalityStream(spark, sf0001)
      .collect())
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"stream-static join shuffled:\n$plan")
  }

  test("SCD lookup: packed-version-array join broadcasts, no state op") {
    val plan = planOf(StreamingPipelines.scdLookupStream(spark, sf0001)
      .collect())
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"stream-static join shuffled:\n$plan")
    // the design claim: a broadcast probe, not a stateful stream join
    assert(!plan.contains("StateStore"),
      s"SCD lookup grew streaming state:\n$plan")
  }

  test("streaming kNN gate: pure map — no Exchange, no state store") {
    val plan = planOf(StreamingPipelines.knnClassifyStream(spark, sf0001)
      .collect())
    // the broadcast-index contract: per-event probe/scan/vote only —
    // any Exchange or StateStore here means the stateless design broke
    assert(!plan.contains("Exchange"), s"kNN gate shuffled:\n$plan")
    assert(!plan.contains("StateStore"), s"kNN gate grew state:\n$plan")
  }

  test("winsorization monitor: broadcast cuts, no shuffle on the stream") {
    val plan = planOf(StreamingPipelines.winsorizeStream(spark, sf0001)
      .collect())
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"stream-static join shuffled:\n$plan")
  }
}
