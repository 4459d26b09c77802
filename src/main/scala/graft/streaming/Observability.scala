package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability (SURVEY.md W7/W8 + utils/metrics.py): the
  * reference keeps Prometheus counters for processed/late/dropped events;
  * Spark's `observe()` attaches the same accounting to the pipeline
  * itself — metrics ride the query execution (no second pass) and surface
  * through QueryProgress (streaming) or an Observation handle (batch).
  */
object Observability {

  /** Attach event accounting: total rows, late rows (event time below the
    * given watermark column/bound), and max event-time delay. */
  def withEventMetrics(df: DataFrame, obs: Observation, ems: Column,
                       watermark: Column): DataFrame =
    df.observe(obs,
      count(lit(1)).as("n_events"),
      sum(when(ems < watermark, 1L).otherwise(0L)).as("n_late"),
      max(greatest(watermark - ems, lit(0L))).as("max_delay_ms"))

  /** Rolling fraud-detector gauges (fraud_detector.py:419-443) as
    * pipeline-attached metrics: score distribution + alert rate. */
  def withScoreMetrics(df: DataFrame, obs: Observation, score: Column,
                       threshold: Double): DataFrame =
    df.observe(obs,
      count(lit(1)).as("n_scored"),
      avg(score).as("avg_score"),
      sum(when(score > threshold, 1L).otherwise(0L)).as("n_alerts"))
}
