package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` hook registering the engine's native Catalyst
  * expressions as permanent SQL functions — the library-distribution form
  * of what the query modules do ad hoc via `createOrReplaceTempFunction`:
  *
  * ```
  * spark-submit --conf spark.sql.extensions=graft.core.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * ```
  *
  * Both functions are codegen'd `Expression`s (SURVEY §2.10 preference
  * order: native expression > UDF), so they stay inside whole-stage
  * codegen wherever they appear.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("hamming_distance"),
      new ExpressionInfo(
        classOf[graft.functions.HammingDistance].getName, "hamming_distance"),
      graft.functions.HammingDistance.builder))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(
        classOf[graft.functions.SortedIntersectCount].getName,
        "sorted_intersect_count"),
      graft.functions.SortedIntersectCount.builder))
    ext.injectFunction((
      FunctionIdentifier("fdot"),
      new ExpressionInfo(classOf[graft.functions.FloatDot].getName, "fdot"),
      graft.functions.VectorFold.builder))
    ext.injectFunction((
      FunctionIdentifier("fsq"),
      new ExpressionInfo(classOf[graft.functions.FloatSqDist].getName, "fsq"),
      graft.functions.VectorFold.sqBuilder))
  }
}
