package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic range-bucketing for distributed prefix computations
  * (ECDF prefix sums, arrival-order prefix max, two-phase ranking).
  *
  * The cut points are collected to the driver EAGERLY so every phase of a
  * multi-pass computation sees identical boundaries — re-evaluating an
  * `approx_percentile` in two plan branches could otherwise disagree.
  * Bucket id = |{cuts c : c < e}| is a pure monotone function of the
  * value, so order-peers (equal values) can never straddle buckets, which
  * is what makes per-bucket window functions exactly reconstructible into
  * global ones. Cut accuracy affects only load balance, never results.
  */
object RangeBuckets {

  /** Approximate `nBuckets`-quantile cut points of `e`, collected eagerly.
    * Empty input yields no cuts (single bucket 0). */
  def cuts(df: DataFrame, e: Column, nBuckets: Int = 32): Seq[Double] = {
    val pcts = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val row = df.select(e.cast("double").as("__v"))
      .agg(expr(s"approx_percentile(__v, array(${pcts.mkString(",")}), 10000)"))
      .head()
    if (row.isNullAt(0)) Seq.empty else row.getSeq[Double](0)
  }

  /** Ascending bucket id for `e` given collected cuts: |{c : c < e}|. */
  def ascBucket(cutPoints: Seq[Double], e: Column): Column =
    if (cutPoints.isEmpty) lit(0)
    else size(filter(array(cutPoints.map(lit): _*), c => c < e))

  /** Descending bucket id (bucket 0 = largest values): |{c : c > e}|. */
  def descBucket(cutPoints: Seq[Double], e: Column): Column =
    if (cutPoints.isEmpty) lit(0)
    else size(filter(array(cutPoints.map(lit): _*), c => c > e))

  /** Phase-2 driver-side fold shared by every bucketed-prefix computation:
    * given per-bucket stats SORTED BY BUCKET ID, returns each bucket
    * paired with the fold of all EARLIER buckets' stats (exclusive
    * prefix) — the offsets broadcast back for phase 3. */
  def exclusivePrefix[A, T](stats: Seq[(Int, A)], zero: T)(
      step: (T, A) => T): Seq[(Int, T)] = {
    val cum = stats.map(_._2).scanLeft(zero)(step)
    stats.map(_._1).zipWithIndex.map { case (b, i) => (b, cum(i)) }
  }
}
