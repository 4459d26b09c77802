package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import graft.serving.Scoring
import Exact._

/** Serving-side interpretation queries (M14/M15): personalization
  * user-segmentation over session features with the reference's exact
  * thresholds (inference/models.py:546-575), as an oracle-checked query.
  * (Fraud interpretation M14 is oracle-checked via evt_fraud_pipeline.)
  */
object ServingQueries extends QueryModule {

  private def personalization(spark: SparkSession, dir: String): DataFrame = {
    val rowW = Window.partitionBy(col("user_id"))
      .orderBy(col("ems"), col("event_id"))
    val cum = rowW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessioned = Tables.events(spark, dir)
      .withColumn("ems", epochMs(col("ts")))
      .withColumn("prev_ems", lag(col("ems"), 1).over(rowW))
      .withColumn("is_new",
        when(col("prev_ems").isNull || col("ems") - col("prev_ems") > 1800000L, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("is_new")).over(cum))
    val agged = sessioned.groupBy(col("user_id"), col("sess_id")).agg(
      min(col("ems")).as("session_start_ms"),
      ((max(col("ems")) - min(col("ems"))) / 60000.0).as("session_duration_min"),
      count(lit(1)).as("n_events"),
      (sum(when(col("event_type") === "purchase", 1).otherwise(0)) /
        greatest(sum(when(col("event_type") === "click", 1).otherwise(0)), lit(1L)))
        .as("conversion"),
      (sum(col("value").cast(DecimalType(25, 6))).cast("double") / count(col("value")))
        .as("avg_value"))
    val engagement =
      lit(0.3) * least(col("avg_value") / 30.0, lit(1.0)) +
      lit(0.3) * least(col("n_events") / 10.0, lit(1.0)) +
      lit(0.2) * col("conversion") +
      lit(0.2) * least(col("session_duration_min") / 30.0, lit(1.0))
    agged
      .withColumn("engagement_score", engagement)
      .withColumn("user_segment",
        Scoring.userSegment(col("engagement_score"), col("session_duration_min")))
      .withColumn("conversion_probability", col("engagement_score") * 0.8)
      .select(col("user_id"), col("session_start_ms"), col("engagement_score"),
        col("user_segment"), col("conversion_probability"))
      .orderBy(col("user_id"), col("session_start_ms"))
  }

  private val personalizationSql =
    """WITH seq AS (
      |  SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ems,
      |    CASE WHEN lag(epoch_ms(ts)) OVER uw IS NULL
      |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER uw > 1800000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW uw AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
      |), sess AS (
      |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ems, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM seq
      |), agged AS (
      |  SELECT user_id,
      |    MIN(ems) AS session_start_ms,
      |    (MAX(ems) - MIN(ems)) / 60000.0 AS session_duration_min,
      |    count(*) AS n_events,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      / GREATEST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 1) AS conversion,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(value) AS avg_value
      |  FROM sess GROUP BY user_id, sess_id
      |), eng AS (
      |  SELECT user_id, session_start_ms, session_duration_min,
      |    0.3 * LEAST(avg_value / 30.0, 1.0) +
      |    0.3 * LEAST(n_events / 10.0, 1.0) +
      |    0.2 * conversion +
      |    0.2 * LEAST(session_duration_min / 30.0, 1.0) AS engagement_score
      |  FROM agged)
      |SELECT user_id, session_start_ms, engagement_score,
      |  CASE WHEN engagement_score > 0.8 AND session_duration_min > 300
      |         THEN 'high_value_engaged'
      |       WHEN engagement_score > 0.6 THEN 'engaged'
      |       WHEN session_duration_min > 180 THEN 'browser'
      |       ELSE 'casual' END AS user_segment,
      |  engagement_score * 0.8 AS conversion_probability
      |FROM eng ORDER BY user_id, session_start_ms""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "score_personalization_segments" -> (personalization _))

  override def oracles: Map[String, String] = Map(
    "score_personalization_segments" -> personalizationSql)
}
