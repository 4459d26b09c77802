package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Point-in-time retrieval and online/offline consistency validation
  * (ref feast/feature_utils.py:151-232, test_feast_integration.py:259-320).
  */
object HistoricalStore {

  /** `get_historical_features`: for each entity row (keys + event-time
    * column, epoch ms), attach the latest feature row with
    * feature_timestamp <= event_timestamp — the as-of join (J5), using the
    * scalable union-sort operator (no row explosion; one shuffle on the
    * entity key). */
  def getHistoricalFeatures(
      entityDf: DataFrame,
      history: DataFrame,
      view: FeatureView,
      eventTsCol: String,
      featureCols: Seq[String]): DataFrame = {
    val keys = view.entities.map(_.joinKey)
    AsOfJoin.asOf(entityDf, history, keys,
      leftTs = eventTsCol, rightTs = view.timestampField,
      rightCols = featureCols :+ view.timestampField,
      tieBreak = view.createdTimestampColumn)
  }

  /** PIT consistency check: online rows must equal the historical
    * retrieval evaluated at the online rows' own timestamps within
    * `tolerance` (ref tolerance 0.001, feature_utils.py:170-232).
    * Returns rows that violate the bound (empty = consistent). */
  def validateConsistency(
      online: DataFrame,
      history: DataFrame,
      view: FeatureView,
      featureCol: String,
      tolerance: Double = 0.001): DataFrame = {
    val keys = view.entities.map(_.joinKey)
    val entity = online.select(
      (keys.map(col) :+ col(view.timestampField).as("_query_ts")): _*)
    val pit = getHistoricalFeatures(entity, history, view, "_query_ts",
        Seq(featureCol))
      .withColumnRenamed(featureCol, s"${featureCol}_pit")
      .withColumnRenamed(view.timestampField, "_pit_matched_ts")
      .withColumnRenamed("_query_ts", view.timestampField)
    online.join(pit, keys :+ view.timestampField)
      // a missing historical match (null pit value) is itself a violation:
      // abs(x - null) is null and a bare > filter would silently pass it
      .filter(col(s"${featureCol}_pit").isNull ||
        abs(col(featureCol) - col(s"${featureCol}_pit")) > tolerance)
  }
}
