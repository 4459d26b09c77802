package graft.serving

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ml.TrainingPipeline.vectorElement

/** Serving surface (SURVEY.md §2.9): batch scoring with the reference's
  * rule interpretation. The reference's HTTP endpoints loop requests
  * serially (inference/app.py:491-544); here scoring is set-oriented —
  * the whole batch is one DataFrame pass (lookup join -> assemble ->
  * model.transform -> interpretation expressions), which is the actual
  * speedup over the reference at any scale.
  */
object Scoring {

  val MaxBatch = 1000 // inference/app.py:485-486

  /** Risk interpretation (exact reference thresholds,
    * inference/models.py:493-540). */
  def interpretFraud(score: Column): Seq[(String, Column)] = Seq(
    "risk_level" -> when(score >= 0.7, "critical")
      .when(score >= 0.4, "high")
      .when(score >= 0.15, "medium")
      .otherwise("low"),
    "recommended_action" -> when(score >= 0.7, "block")
      .when(score >= 0.4, "review")
      .otherwise(when(score >= 0.15, "review").otherwise("approve")),
    "explanation" -> when(score >= 0.7,
        "Multiple high-risk patterns detected indicating likely fraud")
      .when(score >= 0.4, "Suspicious patterns warrant manual review")
      .when(score >= 0.15, "Some risk indicators present, recommend verification")
      .otherwise("Transaction appears legitimate with low risk indicators"))

  /** Top risk factors as a filtered array, truncated to 5
    * (models.py:510-523, 537). */
  def riskFactors(velocity: Column, geoDiversity: Column, highRiskMcc: Column,
                  txnCount5m: Column): Column =
    slice(filter(array(
      when(velocity > 0.7, "high_transaction_velocity"),
      when(geoDiversity > 0.6, "unusual_geographic_pattern"),
      when(highRiskMcc, "high_risk_merchant_category"),
      when(velocity > 0.7, "velocity_flag_triggered"),
      when(txnCount5m > 5, "multiple_recent_transactions")),
      x => x.isNotNull), 1, 5)

  /** User segmentation (models.py:546-560). */
  def userSegment(engagement: Column, sessionDurationMin: Column): Column =
    when(engagement > 0.8 && sessionDurationMin > 300, "high_value_engaged")
      .when(engagement > 0.6, "engaged")
      .when(sessionDurationMin > 180, "browser")
      .otherwise("casual")

  /** Batch fraud scoring: requests (entity keys + optional context) are
    * capped at MaxBatch, left-joined to their features, scored, and
    * interpreted. Per-item error isolation (app.py:480-558): requests
    * whose features are missing get ok=false + an error instead of
    * failing the batch. */
  def scoreFraudBatch(requests: DataFrame, features: DataFrame,
                      model: PipelineModel, keys: Seq[String]): DataFrame = {
    // the reference REJECTS oversized batches (app.py:485-486) rather than
    // silently truncating; limit() would also drop a nondeterministic subset
    val nReq = requests.count()
    require(nReq <= MaxBatch, s"batch of $nReq exceeds $MaxBatch requests")
    val featureCols = features.columns.filterNot(keys.contains).toSeq
    // lookup success = a feature ROW exists, independent of legitimately
    // null feature values (e.g. time_since_last on a first transaction)
    val joined = requests
      .join(features.withColumn("_has_features", lit(true)), keys, "left")
      .withColumn("_has_features", coalesce(col("_has_features"), lit(false)))
    val scored = model.transform(joined.na.fill(0.0, featureCols))
      .withColumn("score", vectorElement(col("probability"), 1))
    val interpreted = interpretFraud(col("score"))
      .foldLeft(scored) { case (df, (name, c)) => df.withColumn(name, c) }
    interpreted
      .withColumn("ok", col("_has_features"))
      .withColumn("error",
        when(!col("_has_features"), "features_missing").otherwise(lit(null)))
      .drop("_has_features")
  }
}
