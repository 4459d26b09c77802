package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import Exact._

/** The windowed feature-aggregation family (SURVEY.md §2.3/§2.4) expressed
  * in batch over the driver `events` table, which stands in for the Kafka
  * streams. Key = user_id (the reference keys by card_id/user_id the same
  * way — generators/txgen.py:329-331).
  *
  * Two window modes, mirroring the reference's two engines:
  *  - event-anchored per-event emission (W3, the simple processor's
  *    semantics: window ends at the current event's ts) — expressed as a
  *    RANGE frame over epoch-ms, which DuckDB shares, so these are fully
  *    oracle-checked;
  *  - aligned sliding windows (W1, the Flink `SlidingEventTimeWindows`
  *    semantics) — expressed with the built-in `window()` function.
  *
  * Scale notes: every query here shuffles once on user_id (plus a window
  * sort within the partition) — the same layout the streaming state store
  * uses, so the batch and streaming paths partition identically. The
  * anchored frames hold running partial aggregates, not buffered rows, in
  * Spark's window exec; at 100 TB the only concern is per-key density
  * (hot keys), handled by AQE skew-split on the sort-shuffle.
  */
object EventFeatures extends QueryModule {

  /** events + epoch-ms column; single definition so every query agrees. */
  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).withColumn("ems", epochMs(col("ts")))

  private def rangeW(sizeMs: Long) =
    Window.partitionBy(col("user_id")).orderBy(col("ems"))
      .rangeBetween(-(sizeMs - 1), 0)

  private val rowW = Window.partitionBy(col("user_id"))
    .orderBy(col("ems"), col("event_id"))

  // ---------------------------------------------------------------- A1/W2/W3
  /** Multi-horizon event-anchored counts (txn_count_5m/30m/24h,
    * ref transaction.py:51,106-109): one output row PER EVENT, window
    * anchored at the event's own timestamp — the reference's per-event
    * emission semantics, not aligned buckets. */
  private def anchoredCounts(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir).select(
      col("event_id"), col("user_id"), col("ems"),
      count(lit(1)).over(rangeW(300000L)).as("cnt_5m"),
      count(lit(1)).over(rangeW(1800000L)).as("cnt_30m"),
      count(lit(1)).over(rangeW(86400000L)).as("cnt_24h"))
      .orderBy(col("event_id"))

  private[queries] val anchoredCountsSql =
    """SELECT event_id, user_id, epoch_ms(ts) AS ems,
      |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |    RANGE BETWEEN 299999 PRECEDING AND CURRENT ROW) AS cnt_5m,
      |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |    RANGE BETWEEN 1799999 PRECEDING AND CURRENT ROW) AS cnt_30m,
      |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |    RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW) AS cnt_24h
      |FROM events ORDER BY event_id""".stripMargin

  // ------------------------------------------------- A2/A3/A6/A7/A12 (stats)
  /** Per-event anchored 24 h stats: sum/avg/min/max/stddev of `value`,
    * time-since-last, avg-time-between, z-score of the current value and
    * outlier flag (ref transaction.py:54-58,66-69,94-98,122-125).
    * stddev is sample (A3b; SURVEY §7 documents choosing stddev_samp over
    * the per-event path's population σ), computed from exact decimal
    * partial sums so both engines share bit-identical doubles. */
  private def anchoredStats(spark: SparkSession, dir: String): DataFrame = {
    val w = rangeW(86400000L)
    val n = count(lit(1)).over(w)
    val sx = sum(col("value").cast(DecimalType(25, 6))).over(w).cast("double")
    val sxx = sum((col("value") * col("value")).cast(DecimalType(25, 6)))
      .over(w).cast("double")
    val mean = sx / n
    // clamp: catastrophic cancellation can push a ~0 variance a few ulps
    // negative; sqrt would be NaN in Spark and an ERROR in DuckDB
    val variance = when(n > 1, greatest((sxx - sx * sx / n) / (n - 1), lit(0.0)))
    val std = sqrt(variance)
    val zscore = when(std > 0, (col("value") - mean) / std).otherwise(lit(0.0))
    ev(spark, dir).select(
      col("event_id"), col("user_id"), col("value"),
      n.as("n_24h"),
      sx.as("sum_24h"),
      mean.as("avg_24h"),
      min(col("value")).over(w).as("min_24h"),
      max(col("value")).over(w).as("max_24h"),
      std.as("std_24h"),
      ((col("ems") - lag(col("ems"), 1).over(rowW)) / 60000.0)
        .as("mins_since_last"),
      when(n > 1, (col("ems") - min(col("ems")).over(w)) / (n - 1) / 60000.0)
        .as("avg_mins_between"),
      zscore.as("zscore"),
      (abs(zscore) > 2.0).as("is_outlier"))
      .orderBy(col("event_id"))
  }

  /** The stats SQL parameterized over its `base` CTE (event_id, user_id,
    * value, ems) — the late-replay oracle feeds it the survivor set. */
  private[queries] def anchoredStatsSqlFrom(baseCtes: String) =
    s"WITH $baseCtes, stats AS (" + statsSqlTail

  private[queries] lazy val anchoredStatsSql = anchoredStatsSqlFrom(
    """base AS (
      |  SELECT event_id, user_id, value, epoch_ms(ts) AS ems FROM events
      |)""".stripMargin)

  private def statsSqlTail =
    """
      |  SELECT event_id, user_id, value, ems,
      |    count(*) OVER w AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(value*value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS sxx,
      |    MIN(value) OVER w AS min_24h,
      |    MAX(value) OVER w AS max_24h,
      |    MIN(ems) OVER w AS min_ems,
      |    LAG(ems) OVER (PARTITION BY user_id ORDER BY ems, event_id) AS prev_ems
      |  FROM base
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ems
      |               RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW)
      |)
      |SELECT event_id, user_id, value, n AS n_24h, sx AS sum_24h,
      |  sx / n AS avg_24h, min_24h, max_24h,
      |  CASE WHEN n > 1 THEN SQRT(GREATEST((sxx - sx*sx/n) / (n-1), 0.0)) END AS std_24h,
      |  (ems - prev_ems) / 60000.0 AS mins_since_last,
      |  CASE WHEN n > 1 THEN (ems - min_ems) / (n-1) / 60000.0 END AS avg_mins_between,
      |  CASE WHEN n > 1 AND SQRT(GREATEST((sxx - sx*sx/n) / (n-1), 0.0)) > 0
      |       THEN (value - sx/n) / SQRT(GREATEST((sxx - sx*sx/n) / (n-1), 0.0)) ELSE 0.0 END AS zscore,
      |  ABS(CASE WHEN n > 1 AND SQRT(GREATEST((sxx - sx*sx/n) / (n-1), 0.0)) > 0
      |       THEN (value - sx/n) / SQRT(GREATEST((sxx - sx*sx/n) / (n-1), 0.0)) ELSE 0.0 END) > 2.0 AS is_outlier
      |FROM stats ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------ W1
  /** Aligned sliding window (Flink SlidingEventTimeWindows semantics,
    * feature_job.py:477) via the built-in window(): 6 h size / 3 h slide,
    * per-user count + exact sum. */
  private def alignedSliding(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(window(col("ts").cast("timestamp"), "6 hours", "3 hours"),
               col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_millis(col("window.start")).as("win_start_ms"),
              col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("win_start_ms"))

  private[queries] val alignedSlidingSql =
    """SELECT user_id,
      |  (epoch_ms(ts) // 10800000 - i) * 10800000 AS win_start_ms,
      |  count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |FROM events CROSS JOIN (VALUES (0),(1)) offs(i)
      |GROUP BY user_id, win_start_ms
      |ORDER BY user_id, win_start_ms""".stripMargin

  // ------------------------------------------------------------ B1-B8 / W5
  /** Session windows (30 min inactivity gap, ref clickstream.py:47-65,
    * base_generator.py:275): sessionize by gap, then per-session duration,
    * page/category analogs, cart-action counts, conversion, abandonment,
    * and the engagement score expression (clickstream.py:96-104). */
  private def sessionFeatures(spark: SparkSession, dir: String): DataFrame = {
    val cum = Window.partitionBy(col("user_id"))
      .orderBy(col("ems"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = count(lit(1))
    val purchases = sum(when(col("event_type") === "purchase", 1).otherwise(0))
    val clicks = sum(when(col("event_type") === "click", 1).otherwise(0))
    val durationMin = (max(col("ems")) - min(col("ems"))) / 60000.0
    val avgValue = sum(col("value").cast(DecimalType(25, 6))).cast("double") / count(col("value"))

    val sessioned = ev(spark, dir)
      .withColumn("prev_ems", lag(col("ems"), 1).over(rowW))
      .withColumn("is_new",
        when(col("prev_ems").isNull || col("ems") - col("prev_ems") > 1800000L, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("is_new")).over(cum))
      .drop("prev_ems", "is_new")
    val agged = sessioned.groupBy(col("user_id"), col("sess_id"))
      .agg(
        min(col("ems")).as("session_start_ms"),
        durationMin.as("session_duration_min"),
        n.as("events_per_session"),
        countDistinct(col("event_type")).as("unique_types_session"),
        avgValue.as("avg_value_session"),
        purchases.as("purchases_session"),
        clicks.as("clicks_session"),
        sum(when(col("event_type") === "view", 1).otherwise(0)).as("views_session"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("errors_session"))
    val conv = col("purchases_session") / greatest(col("clicks_session"), lit(1L))
    val engagement =
      lit(0.3) * least(col("avg_value_session") / 30.0, lit(1.0)) +
      lit(0.3) * least(col("events_per_session") / 10.0, lit(1.0)) +
      lit(0.2) * conv +
      lit(0.2) * least(col("session_duration_min") / 30.0, lit(1.0))
    agged
      .withColumn("conversion_rate_session", conv)
      .withColumn("engagement_score", engagement)
      .withColumn("is_high_engagement", engagement > 0.7)
      .withColumn("is_likely_purchaser", conv > 0.1)
      .drop("sess_id")
      .orderBy(col("user_id"), col("session_start_ms"))
  }

  private val sessionFeaturesSql =
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
      |    count(*) AS events_per_session,
      |    COUNT(DISTINCT event_type) AS unique_types_session,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(value) AS avg_value_session,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases_session,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks_session,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views_session,
      |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors_session
      |  FROM sess GROUP BY user_id, sess_id
      |)
      |SELECT *,
      |  purchases_session / GREATEST(clicks_session, 1) AS conversion_rate_session,
      |  0.3 * LEAST(avg_value_session / 30.0, 1.0) +
      |  0.3 * LEAST(events_per_session / 10.0, 1.0) +
      |  0.2 * (purchases_session / GREATEST(clicks_session, 1)) +
      |  0.2 * LEAST(session_duration_min / 30.0, 1.0) AS engagement_score,
      |  (0.3 * LEAST(avg_value_session / 30.0, 1.0) +
      |   0.3 * LEAST(events_per_session / 10.0, 1.0) +
      |   0.2 * (purchases_session / GREATEST(clicks_session, 1)) +
      |   0.2 * LEAST(session_duration_min / 30.0, 1.0)) > 0.7 AS is_high_engagement,
      |  (purchases_session / GREATEST(clicks_session, 1)) > 0.1 AS is_likely_purchaser
      |FROM agged ORDER BY user_id, session_start_ms""".stripMargin

  // ------------------------------------------------------------- A14/A15
  /** Calendar features per user: weekend ratio and most-active hour
    * (argmax over the hour histogram; deterministic min-hour tie-break;
    * ref transaction.py:100-103, 269-280). Hour/weekday via epoch
    * arithmetic so both engines agree in UTC. */
  private def calendarFeatures(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
      .withColumn("hour_of_day", expr("(ems div 3600000) % 24"))
      .withColumn("dow", expr("((ems div 86400000) + 4) % 7"))
      .withColumn("is_weekend", col("dow").isin(0, 6))
    val perUser = e.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      sum(when(col("is_weekend"), 1).otherwise(0)).as("weekend_events"))
      .withColumn("weekend_ratio", col("weekend_events") / col("n_events"))
    val hourCounts = e.groupBy(col("user_id"), col("hour_of_day"))
      .agg(count(lit(1)).as("cnt"))
    val rankW = Window.partitionBy(col("user_id"))
      .orderBy(col("cnt").desc, col("hour_of_day"))
    val mostActive = hourCounts
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("hour_of_day").as("most_active_hour"))
    perUser.join(mostActive, Seq("user_id")).orderBy(col("user_id"))
  }

  private val calendarFeaturesSql =
    """WITH base AS (
      |  SELECT user_id,
      |    (epoch_ms(ts) // 3600000) % 24 AS hour_of_day,
      |    ((epoch_ms(ts) // 86400000) + 4) % 7 AS dow
      |  FROM events
      |), per_user AS (
      |  SELECT user_id, count(*) AS n_events,
      |    CAST(SUM(CASE WHEN dow IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS weekend_events
      |  FROM base GROUP BY user_id
      |), hour_counts AS (
      |  SELECT user_id, hour_of_day, count(*) AS cnt FROM base
      |  GROUP BY user_id, hour_of_day
      |), most_active AS (
      |  SELECT user_id, hour_of_day AS most_active_hour FROM (
      |    SELECT user_id, hour_of_day,
      |      row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, hour_of_day) AS rn
      |    FROM hour_counts) WHERE rn = 1
      |)
      |SELECT p.user_id, p.n_events, p.weekend_events,
      |  p.weekend_events / p.n_events AS weekend_ratio,
      |  m.most_active_hour
      |FROM per_user p JOIN most_active m ON p.user_id = m.user_id
      |ORDER BY p.user_id""".stripMargin

  // ---------------------------------------------- A9/A10/A11/A16/P3/P5/P7
  /** Risk-style conditional ratios per user: membership predicates,
    * small-amount and round-amount ratios with threshold flags, prefix
    * predicate, per-action-type conditional counts
    * (ref transaction.py:75-120, 174-186; clickstream.py:64-65). */
  private def riskFlags(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = count(lit(1))
    val errors = sum(when($"event_type".isin("error", "signup"), 1).otherwise(0))
    val small = sum(when($"value" < 5.0, 1).otherwise(0))
    val round = sum(when(pmod($"value", lit(50.0)) === 0.0 && $"value" >= 50.0, 1)
      .otherwise(0))
    Tables.events(spark, dir).groupBy($"user_id").agg(
      n.as("n_events"),
      (errors / n).as("risky_type_ratio"),
      (small / n).as("small_value_ratio"),
      (round / n).as("round_value_ratio"),
      sum(when($"event_type" === "click", 1).otherwise(0)).as("n_click"),
      sum(when($"event_type" === "view", 1).otherwise(0)).as("n_view"),
      sum(when($"event_type" === "purchase", 1).otherwise(0)).as("n_purchase"),
      sum(when($"event_type".startsWith("c"), 1).otherwise(0)).as("n_prefix_c"))
      .withColumn("has_risky_types", col("risky_type_ratio") > 0.0)
      .withColumn("has_small_values", col("small_value_ratio") > 0.2)
      .withColumn("has_round_values", col("round_value_ratio") > 0.3)
      .orderBy(col("user_id"))
  }

  private val riskFlagsSql =
    """WITH agged AS (
      |  SELECT user_id, count(*) AS n_events,
      |    SUM(CASE WHEN event_type IN ('error','signup') THEN 1 ELSE 0 END) / count(*) AS risky_type_ratio,
      |    SUM(CASE WHEN value < 5.0 THEN 1 ELSE 0 END) / count(*) AS small_value_ratio,
      |    SUM(CASE WHEN value % 50.0 = 0.0 AND value >= 50.0 THEN 1 ELSE 0 END) / count(*) AS round_value_ratio,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |    CAST(SUM(CASE WHEN event_type LIKE 'c%' THEN 1 ELSE 0 END) AS BIGINT) AS n_prefix_c
      |  FROM events GROUP BY user_id
      |)
      |SELECT *, risky_type_ratio > 0.0 AS has_risky_types,
      |  small_value_ratio > 0.2 AS has_small_values,
      |  round_value_ratio > 0.3 AS has_round_values
      |FROM agged ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------ A5/A8/A8b
  /** Velocity features per user per day: events/minute, value velocity,
    * clamped velocity score (ref transaction.py:86-91, 265-267). */
  private def velocity(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir).withColumn("day", expr("ems div 86400000"))
    val n = count(lit(1))
    val spanHours = (max(col("ems")) - min(col("ems"))) / 3600000.0
    e.groupBy(col("user_id"), col("day")).agg(
      n.as("n_events"),
      spanHours.as("span_hours"),
      (n / lit(1440.0)).as("velocity_per_minute"),
      (sum(col("value").cast(DecimalType(25, 6))).cast("double") / 1440.0)
        .as("value_velocity"),
      when(spanHours > 0, least((n / spanHours) / 10.0, lit(1.0)))
        .otherwise(0.0).as("velocity_score"))
      .orderBy(col("user_id"), col("day"))
  }

  private val velocitySql =
    """SELECT user_id, epoch_ms(ts) // 86400000 AS day,
      |  count(*) AS n_events,
      |  (MAX(epoch_ms(ts)) - MIN(epoch_ms(ts))) / 3600000.0 AS span_hours,
      |  count(*) / 1440.0 AS velocity_per_minute,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / 1440.0 AS value_velocity,
      |  CASE WHEN (MAX(epoch_ms(ts)) - MIN(epoch_ms(ts))) / 3600000.0 > 0
      |       THEN LEAST((count(*) / ((MAX(epoch_ms(ts)) - MIN(epoch_ms(ts))) / 3600000.0)) / 10.0, 1.0)
      |       ELSE 0.0 END AS velocity_score
      |FROM events GROUP BY user_id, day
      |ORDER BY user_id, day""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_anchored_counts_multi_horizon" -> (anchoredCounts _),
    "evt_anchored_stats_24h" -> (anchoredStats _),
    "evt_aligned_sliding_window" -> (alignedSliding _),
    "evt_session_features" -> (sessionFeatures _),
    "evt_calendar_features" -> (calendarFeatures _),
    "evt_risk_flags" -> (riskFlags _),
    "evt_velocity" -> (velocity _))

  override def oracles: Map[String, String] = Map(
    "evt_anchored_counts_multi_horizon" -> anchoredCountsSql,
    "evt_anchored_stats_24h" -> anchoredStatsSql,
    "evt_aligned_sliding_window" -> alignedSlidingSql,
    "evt_session_features" -> sessionFeaturesSql,
    "evt_calendar_features" -> calendarFeaturesSql,
    "evt_risk_flags" -> riskFlagsSql,
    "evt_velocity" -> velocitySql)
}
