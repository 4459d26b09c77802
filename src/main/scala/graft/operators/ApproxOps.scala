package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Approximate scale-path variants of the exact operators (SURVEY.md A4 /
  * §4): at 100 TB exact distinct counts and exact quantiles become their
  * sketch forms — HyperLogLog++ (`approx_count_distinct`, mergeable across
  * partitions, fixed memory) and KLL/GK (`approx_percentile`). The
  * oracle-checked queries use the exact forms (DuckDB comparability); the
  * engine exposes both and the tests bound the sketch error against the
  * exact results. */
object ApproxOps {

  /** HLL++ distinct count, default 5% relative error like the reference's
    * tolerance expectations. */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Sketch quantiles (percentage array) with accuracy knob. */
  def approxQuantiles(c: Column, probs: Seq[Double],
                      accuracy: Int = 10000): Column =
    percentile_approx(c, array(probs.map(lit): _*), lit(accuracy))
}
