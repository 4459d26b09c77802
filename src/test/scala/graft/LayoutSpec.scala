package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.LayoutOps

/** Physical-layout assertions: the bucketed join must be Exchange-free
  * (the bucket layout replaces the shuffle) and the partitioned read must
  * prune to the one matching directory. Results themselves are
  * oracle-checked (`rel_bucketed_join`, `src_partition_pruning`); these
  * specs pin the PLAN the layout exists to buy. */
class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed sort-merge join runs with zero Exchange") {
    val j = LayoutOps.bucketedJoinPair(spark, sf0001)
    j.collect() // finalize the (possibly adaptive) plan before inspecting
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.linesIterator.exists(_.contains("Exchange")),
      s"bucketed join shuffled:\n$plan")
    // the bucket metadata is what elides the shuffle — assert it's used
    assert(plan.contains("Bucketed: true"), plan)
  }

  test("day-partitioned scan prunes to the filtered partition") {
    val (day, d0) = LayoutOps.prunedDayScan(spark, sf0001)
    day.collect()
    val plan = day.queryExecution.executedPlan.toString
    // static (plan-time) pruning: the literal day lands in PartitionFilters
    assert(plan.contains("PartitionFilters:") && plan.contains(s"= $d0"),
      s"no partition filter for d=$d0 in:\n$plan")
    // and the pruned read agrees with the unpruned filter
    val direct = graft.core.Tables.events(spark, sf0001)
      .selectExpr("unix_millis(cast(ts as timestamp)) div 86400000 as d")
      .filter(org.apache.spark.sql.functions.col("d") === d0).count()
    assert(day.count() == direct)
  }
}
