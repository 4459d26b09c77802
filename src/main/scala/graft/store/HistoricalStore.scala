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

  /** Service-level `get_historical_features` (ref feast/feature_utils.py:
    * 151-168): every view of the service joins as-of the SAME event time,
    * each under its OWN TTL — a feature row older than `view.ttlMs` at
    * the event instant is nulled out (Feast's freshness contract: the
    * online store would already have expired it, so the training set must
    * not see it either — offline/online parity for staleness, not just
    * values). Attached columns are prefixed `<view>__` so same-named
    * features across views never collide. One as-of join (= one shuffle
    * on the entity key) per view, each via the union-sort operator —
    * the same per-view cost as single-view PIT, |views| times. */
  def getServiceHistoricalFeatures(
      entityDf: DataFrame,
      service: FeatureService,
      history: FeatureView => DataFrame,
      eventTsCol: String,
      featureCols: FeatureView => Seq[String]): DataFrame = {
    // misconfiguration guards — each would otherwise surface as silently
    // ambiguous or misrenamed columns deep inside the fold:
    //  - duplicate view names collide on their `<view>__` prefix;
    //  - a feature/timestamp column equal to eventTsCol (or any entity
    //    column) would be renamed or TTL-gated in place of the original.
    val names = service.views.map(_.name)
    require(names.distinct == names,
      s"FeatureService has duplicate view names: $names")
    val entityCols = entityDf.columns.toSet
    service.views.foreach { v =>
      val attached = featureCols(v) :+ v.timestampField
      val clash = attached.filter(c => c == eventTsCol || entityCols(c))
      require(clash.isEmpty,
        s"view ${v.name}: columns $clash collide with the entity frame " +
          s"or eventTsCol '$eventTsCol' — rename before retrieval")
    }
    service.views.foldLeft(entityDf) { (df, v) =>
      val fcols = featureCols(v)
      val joined = getHistoricalFeatures(df, history(v), v, eventTsCol, fcols)
      val fts = col(v.timestampField)
      // null fts (no PIT match) fails the >= and stays null
      val inTtl = fts >= col(eventTsCol) - v.ttlMs
      val gated = fcols.foldLeft(joined) { (d, c) =>
          d.withColumn(c, when(inTtl, col(c)))
        }
        .withColumn(v.timestampField, when(inTtl, fts))
      (fcols :+ v.timestampField).foldLeft(gated)((d, c) =>
        d.withColumnRenamed(c, s"${v.name}__$c"))
    }
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
