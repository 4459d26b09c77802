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
  * the reference caps samples at 1000, drift_check.py:223-225). The
  * distributed-sort window formulation in DriftQuality.ks is the
  * unbounded-cardinality path.
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
