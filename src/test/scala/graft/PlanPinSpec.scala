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

  test("nearestAsOf: both directional carries share ONE Exchange (round 11)") {
    // the operator's design claim: union once, hash-partition once, two
    // consecutive Sorts — a second Exchange means the windows stopped
    // sharing the partitioning and the one-shuffle contract broke
    import org.apache.spark.sql.functions._
    import graft.core.Tables
    val e = Tables.events(spark, sf0001)
      .withColumn("ems", unix_millis(col("ts").cast("timestamp")))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ems"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ems").as("c_ems"))
    val df = graft.operators.AsOfJoin.nearestAsOf(
      purchases, clicks, Seq("user_id"), "ems", "c_ems",
      rightCols = Seq("c_ems"), tieBreak = "c_ems")
    df.collect()
    // AQE's toString repeats the plan under "== Initial Plan ==" — count
    // operators in the FINAL plan section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 Exchange, found $exchanges:\n$plan")
    val sorts = "\\bSort\\b".r.findAllIn(plan).length
    assert(sorts >= 2, s"expected both directional Sorts:\n$plan")
  }

  test("ROLLUP: all grouping levels from ONE Expand + one aggregate " +
      "shuffle (round 12)") {
    // the operator's scale claim: three grouping levels in a single scan
    // — Expand replicates rows per level, one hash aggregate shuffles
    // once; three separate groupBys (3 scans, 3 shuffles) would show up
    // here as extra Exchanges
    val df = graft.SparkEntry.queries("rel_rollup_pricing")(
      spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val expands = "Expand".r.findAllIn(plan).length
    assert(expands == 1, s"expected 1 Expand, found $expands:\n$plan")
    // one aggregate Exchange + the final ORDER BY's range partitioning
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 Exchanges, found $exchanges:\n$plan")
  }

  test("fuzzySigRows: ONE md5 pass per shingle behind the Generate " +
      "barrier (round 13)") {
    // sj (15-hex) and the bands (8-hex) are prefixes of the SAME digest;
    // the old two-transform form hashed every shingle twice because
    // CollapseProject re-inlines a named hex column into each consumer.
    // The hexes Generate output attribute is the barrier — a future
    // refactor that reads md5 from two expressions again shows up here
    // as a second md5 in the physical plan.
    import org.apache.spark.sql.functions.col
    val df = graft.queries.TextAnalysis.fuzzySigRows(
      graft.core.Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("text")))
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val md5s = "md5".r.findAllIn(plan).length
    assert(md5s == 1, s"expected exactly 1 md5 in the plan, found $md5s:\n$plan")
  }
}
