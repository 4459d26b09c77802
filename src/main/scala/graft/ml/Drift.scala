package graft.ml

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Drift-detection library (SURVEY.md M9-M12): typed KS aggregator plus
  * DataFrame-level KS/PSI/chi-square helpers matching the oracle-checked
  * query formulations in graft.queries.DriftQuality.
  *
  * Scale note: KsAggregator buffers both samples (fine up to millions of
  * rows per comparison — drift checks run on sampled feature windows, as
  * the reference caps samples at 1000, drift_check.py:223-225). For
  * unbounded cardinality use KsSketchAggregator (KLL sketches, O(k log n)
  * state) or the bucketed-prefix-sum formulation in DriftQuality.ks.
  */
object Drift {

  /** Buffer: reference sample + current sample. */
  case class KsBuf(ref: Vector[Double], cur: Vector[Double])

  /** Two-sample Kolmogorov-Smirnov statistic over (value, isReference)
    * pairs: D = sup |ECDF_ref - ECDF_cur| via sorted two-pointer sweep. */
  class KsAggregator extends Aggregator[(Double, Boolean), KsBuf, Double] {
    override def zero: KsBuf = KsBuf(Vector.empty, Vector.empty)
    override def reduce(b: KsBuf, a: (Double, Boolean)): KsBuf =
      if (a._2) b.copy(ref = b.ref :+ a._1) else b.copy(cur = b.cur :+ a._1)
    override def merge(x: KsBuf, y: KsBuf): KsBuf =
      KsBuf(x.ref ++ y.ref, x.cur ++ y.cur)
    override def finish(b: KsBuf): Double = {
      val r = b.ref.sorted
      val c = b.cur.sorted
      if (r.isEmpty || c.isEmpty) return 0.0
      var (i, j, d) = (0, 0, 0.0)
      while (i < r.size || j < c.size) {
        val x = if (j >= c.size || (i < r.size && r(i) <= c(j))) r(i) else c(j)
        while (i < r.size && r(i) <= x) i += 1
        while (j < c.size && c(j) <= x) j += 1
        d = math.max(d, math.abs(i.toDouble / r.size - j.toDouble / c.size))
      }
      d
    }
    override def bufferEncoder: Encoder[KsBuf] = Encoders.product[KsBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  // ----------------------------------------------- sketch-based KS (M9 at scale)
  /** KLL-style mergeable quantile sketch (Karnin-Lang-Liberty, FOCS'16)
    * with alternating (non-random) compaction: level h holds items of
    * weight 2^h; when a level overflows `k` items it is sorted, an odd
    * leftover stays, and every other item (offset alternating per level)
    * is promoted one level up. Space is O(k log(n/k)) regardless of
    * cardinality — the unbounded-data form of the KS ECDF (the exact
    * KsAggregator buffers both samples; see the scale note above).
    *
    * Determinism scope: reproducible for a FIXED insertion/merge order
    * (no RNG anywhere — same fold, same sketch, which the MlSpec
    * properties rely on). Under distributed aggregation the partial-merge
    * order varies run to run, so the retained items — and the estimate,
    * within the sketch's rank-error bound — can differ across runs; with
    * no compaction (n <= k) the sketch is EXACT regardless of order. */
  case class KllSketch(k: Int, levels: Seq[Seq[Double]], alt: Seq[Boolean],
      n: Long) {

    def add(x: Double): KllSketch =
      compacted(copy(levels = levels.updated(0, levels.head :+ x), n = n + 1))

    def merge(o: KllSketch): KllSketch = {
      val h = math.max(levels.size, o.levels.size)
      val ls = (0 until h).map { i =>
        levels.lift(i).getOrElse(Seq.empty) ++
          o.levels.lift(i).getOrElse(Seq.empty)
      }
      compacted(copy(levels = ls, n = n + o.n))
    }

    /** One upward pass restores every level to <= k items; a compaction's
      * promotions land on the next level, which the pass visits next, so
      * cascades resolve in the same sweep. Weight is conserved: 2m items
      * of weight 2^h become m items of weight 2^(h+1) (+ odd leftover). */
    private def compacted(s: KllSketch): KllSketch = {
      var ls = s.levels.toVector
      var flags = s.alt.toVector
      var h = 0
      while (h < ls.size) {
        if (ls(h).size > k) {
          val sorted = ls(h).sorted
          val (stay, rest) =
            if (sorted.size % 2 == 1) (Vector(sorted.head), sorted.tail)
            else (Vector.empty[Double], sorted)
          while (flags.size <= h) flags = flags :+ false
          val off = if (flags(h)) 1 else 0
          flags = flags.updated(h, !flags(h))
          val promoted = rest.zipWithIndex
            .collect { case (x, i) if i % 2 == off => x }
          ls = ls.updated(h, stay)
          if (h + 1 >= ls.size) ls = ls :+ Vector.empty
          ls = ls.updated(h + 1, ls(h + 1) ++ promoted)
        }
        h += 1
      }
      s.copy(levels = ls, alt = flags)
    }

    /** Retained items with their weights. */
    def weightedItems: Seq[(Double, Long)] = levels.zipWithIndex
      .flatMap { case (v, h) => v.map(x => (x, 1L << h)) }

    /** Estimated count of values <= x (exact if never compacted). */
    def rank(x: Double): Long =
      weightedItems.collect { case (v, w) if v <= x => w }.sum
  }

  object KllSketch {
    def empty(k: Int = 200): KllSketch =
      KllSketch(k, Seq(Seq.empty), Seq.empty, 0L)
  }

  /** sup |ECDF_ref - ECDF_cur| over two sketches, evaluated at every
    * retained point of either (the supremum of a pair of step functions
    * is attained at a step). */
  def ksFromSketches(ref: KllSketch, cur: KllSketch): Double = {
    if (ref.n == 0 || cur.n == 0) return 0.0
    val pts = (ref.weightedItems.map(_._1) ++ cur.weightedItems.map(_._1))
      .distinct
    pts.map { x =>
      math.abs(ref.rank(x).toDouble / ref.n - cur.rank(x).toDouble / cur.n)
    }.max
  }

  case class KsSketchBuf(ref: KllSketch, cur: KllSketch)

  /** KS statistic over (value, isReference) pairs in O(k log n) state —
    * the drop-in unbounded-cardinality replacement for KsAggregator. */
  class KsSketchAggregator(k: Int = 200)
      extends Aggregator[(Double, Boolean), KsSketchBuf, Double] {
    override def zero: KsSketchBuf =
      KsSketchBuf(KllSketch.empty(k), KllSketch.empty(k))
    override def reduce(b: KsSketchBuf, a: (Double, Boolean)): KsSketchBuf =
      if (a._2) b.copy(ref = b.ref.add(a._1))
      else b.copy(cur = b.cur.add(a._1))
    override def merge(x: KsSketchBuf, y: KsSketchBuf): KsSketchBuf =
      KsSketchBuf(x.ref.merge(y.ref), x.cur.merge(y.cur))
    override def finish(b: KsSketchBuf): Double = ksFromSketches(b.ref, b.cur)
    override def bufferEncoder: Encoder[KsSketchBuf] =
      Encoders.product[KsSketchBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** KS statistic between `valueCol` where `isRefCol` and where not. */
  def ksStatistic(df: DataFrame, valueCol: String, isRefCol: String): Double = {
    import df.sparkSession.implicits._
    val agg = new KsAggregator().toColumn
    // null samples carry no distributional information; dropping them also
    // keeps the primitive tuple encoder from throwing on nullable features
    df.select(col(valueCol).cast("double"), col(isRefCol).cast("boolean"))
      .na.drop()
      .as[(Double, Boolean)]
      .select(agg).head()
  }

  /** PSI over quantile buckets of the reference window (M11; thresholds
    * 0.1 moderate / 0.2 major, epsilon 1e-6 — drift_check.py:138-169). */
  def psi(df: DataFrame, valueCol: String, isRefCol: String,
          buckets: Int = 10): Double = {
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val edges = df.filter(col(isRefCol))
      .stat.approxQuantile(valueCol, probs.toArray, 0.0)
    val bucket = edges.zipWithIndex.foldLeft(lit(0)) { case (acc, (e, i)) =>
      when(col(valueCol) > e, lit(i + 1)).otherwise(acc)
    }
    val counts = df.groupBy(col(isRefCol).as("is_ref"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val pivoted = counts.groupBy(col("bucket")).agg(
      sum(when(col("is_ref"), col("n")).otherwise(0L)).as("ref_n"),
      sum(when(!col("is_ref"), col("n")).otherwise(0L)).as("cur_n"))
      .collect()
    val refTot = pivoted.map(_.getAs[Long]("ref_n")).sum.toDouble
    val curTot = pivoted.map(_.getAs[Long]("cur_n")).sum.toDouble
    pivoted.map { r =>
      val e = math.max(r.getAs[Long]("ref_n") / refTot, 1e-6)
      val a = math.max(r.getAs[Long]("cur_n") / curTot, 1e-6)
      (a - e) * math.log(a / e)
    }.sum
  }

  /** Chi-square statistic for a categorical column vs the reference
    * distribution (M10). Returns (statistic, dof). */
  def chiSquare(df: DataFrame, catCol: String, isRefCol: String): (Double, Long) = {
    val counts = df.groupBy(col(catCol)).agg(
      sum(when(col(isRefCol), 1L).otherwise(0L)).as("ref_n"),
      sum(when(!col(isRefCol), 1L).otherwise(0L)).as("cur_n"))
      .collect()
    val refTot = counts.map(_.getAs[Long]("ref_n")).sum.toDouble
    val curTot = counts.map(_.getAs[Long]("cur_n")).sum.toDouble
    val stat = counts.map { r =>
      val exp = r.getAs[Long]("ref_n") / refTot * curTot
      val obs = r.getAs[Long]("cur_n").toDouble
      if (exp > 0) (obs - exp) * (obs - exp) / exp else 0.0
    }.sum
    (stat, counts.length - 1L)
  }
}
