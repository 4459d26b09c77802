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

  test("z-order layout: per-file stats localize BOTH dimensions") {
    import org.apache.spark.sql.functions._
    // candidate files for a predicate = files whose [min,max] on the
    // predicate column(s) admit the value — exactly what the parquet
    // reader's row-group skipping evaluates from the footer stats. A
    // day-sorted layout (one file = a contiguous time slice, every user
    // inside) must scan EVERY file for a user-only predicate; the
    // z-curve bounds both coordinates per file, so most files are
    // skippable on either dimension. Measured at sf0.01: 150 users
    // give the user coordinate 8 varying bits against the 30-day
    // window's 5, so the curve's top split levels land on user bits —
    // at sf0.001's 15 users the curve only gets ONE user split level
    // out of 16 files (measured 9/16 candidates: still skipping where
    // day-sort skips nothing, but the aspect ratio, not the curve, is
    // the limit there).
    val sfZ = "/root/testdata/sf0.01"
    val base = LayoutOps.zorderLayout(spark, sfZ)
    val linBase = java.nio.file.Files
      .createTempDirectory("graft_zorder_lin_").toString
    val ev = graft.core.Tables.events(spark, sfZ)
      .withColumn("d", expr(
        "unix_millis(cast(ts as timestamp)) div 86400000"))
      .select(col("event_id"), col("user_id"), col("d"))
    ev.repartitionByRange(16, col("d"), col("event_id"))
      .sortWithinPartitions(col("d"), col("event_id"))
      .write.mode("overwrite").parquet(linBase)
    def fileStats(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("ul"), max("user_id").as("uh"),
        min("d").as("dl"), max("d").as("dh"))
      .collect()
    val first = ev.orderBy(col("event_id"))
      .select(col("user_id"), col("d")).head()
    val (u0, d0) = (first.getLong(0), first.getLong(1))
    def candidates(path: String, onUser: Boolean) = fileStats(path).count {
      r =>
        val (ul, uh, dl, dh) = (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))
        if (onUser) ul <= u0 && u0 <= uh
        else ul <= u0 && u0 <= uh && dl <= d0 && d0 <= dh
    }
    val nz = fileStats(base).length
    val zUser = candidates(base, onUser = true)
    val linUser = candidates(linBase, onUser = true)
    // day-sorted: every file spans all users -> nothing skippable
    assert(linUser == fileStats(linBase).length,
      s"day-sorted layout unexpectedly skips on user: $linUser")
    // z-order: the user-only predicate must skip at least half the files
    assert(zUser * 2 <= nz, s"z-order user candidates $zUser of $nz files")
    // and the 2-D point predicate narrows at least as far
    assert(candidates(base, onUser = false) <= zUser)
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
