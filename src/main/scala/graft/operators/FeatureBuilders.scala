package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.{ClickEvent, TransactionEvent}

/** Complete wide-feature-row builders: the reference's per-event feature
  * computation (processors/transaction.py:33-207, clickstream.py:33-153)
  * over typed event Datasets, producing every field of the
  * TransactionFeatures / ClickstreamFeatures contracts. Event-anchored
  * RANGE frames in batch; the streaming path reuses
  * graft.streaming.StatefulFeatures for the stateful equivalents.
  *
  * All window frames partition by the entity key — one shuffle, shared
  * with every other operator in the engine.
  */
object FeatureBuilders {

  import graft.core.Horizons.{H5M, H30M, H24H}

  /** Per-event TransactionFeatures (A1-A17). One output row per event,
    * windows anchored at the event's timestamp. */
  def transactionFeatures(events: Dataset[TransactionEvent]): DataFrame = {
    val e = events.toDF().withColumn("ems", col("timestamp"))
    def rangeW(size: Long) = Window.partitionBy(col("card_id"))
      .orderBy(col("ems")).rangeBetween(-(size - 1), 0)
    val w5 = rangeW(H5M)
    val w30 = rangeW(H30M)
    val w24 = rangeW(H24H)
    val rowW = Window.partitionBy(col("card_id"))
      .orderBy(col("ems"), col("txn_id"))

    val n5 = count(lit(1)).over(w5)
    val sum5 = sum(col("amount")).over(w5)
    val avg5 = avg(col("amount")).over(w5)
    val std5 = stddev_samp(col("amount")).over(w5) // A3b: sample (documented)
    val uniqueCountries = size(collect_set(col("geo_country")).over(w5))
    val spanH24 = (col("ems") - min(col("ems")).over(w24)) / 3600000.0
    val velocity = when(spanH24 > 0,
      least((count(lit(1)).over(w24) / spanH24) / 10.0, lit(1.0))).otherwise(0.0)
    val highRisk = sum(when(col("mcc").isin(
      TransactionEvent.highRiskMcc.toSeq: _*), 1).otherwise(0)).over(w5)
    val mediumRisk = sum(when(col("mcc").isin(
      TransactionEvent.mediumRiskMcc.toSeq: _*), 1).otherwise(0)).over(w5)
    val small5 = sum(when(col("amount") < 5.0, 1).otherwise(0)).over(w5)
    val round5 = sum(when(pmod(col("amount"), lit(50.0)) === 0.0 &&
      col("amount") >= 50.0, 1).otherwise(0)).over(w5)
    // reference emits ABSOLUTE deviation (transaction.py:122-125)
    val zscore = when(std5 > 0, abs(col("amount") - avg5) / std5).otherwise(0.0)
    val sameDevice = sum(lit(1)).over(
      Window.partitionBy(col("card_id"), col("device_id")).orderBy(col("ems"))
        .rangeBetween(-(H5M - 1), 0))
    val dow = expr("((ems div 86400000) + 4) % 7")
    val hour = expr("(ems div 3600000) % 24")

    e.select(
      col("card_id").as("entity_id"),
      lit("card").as("entity_type"),
      lit("transaction").as("feature_type"),
      n5.cast("int").as("txn_count_5m"),
      count(lit(1)).over(w30).cast("int").as("txn_count_30m"),
      count(lit(1)).over(w24).cast("int").as("txn_count_24h"),
      sum5.as("amount_sum_5m"),
      avg5.as("amount_avg_5m"),
      max(col("amount")).over(w5).as("amount_max_5m"),
      min(col("amount")).over(w5).as("amount_min_5m"),
      coalesce(std5, lit(0.0)).as("amount_std_5m"),
      uniqueCountries.cast("int").as("unique_countries_5m"),
      least(uniqueCountries / 3.0, lit(1.0)).as("geo_diversity_score"),
      ((col("ems") - lag(col("ems"), 1).over(rowW)) / 60000.0)
        .as("time_since_last_txn_min"),
      when(n5 > 1, (col("ems") - min(col("ems")).over(w5)) / (n5 - 1) / 60000.0)
        .as("avg_time_between_txns_min"),
      velocity.as("velocity_score"),
      dow.isin(0, 6).as("is_weekend"),
      hour.cast("int").as("hour_of_day"),
      (highRisk / n5).as("high_risk_txn_ratio"),
      (mediumRisk / n5).as("medium_risk_txn_ratio"),
      (highRisk > 0).as("has_high_risk_mcc"),
      (velocity > 0.7).as("is_high_velocity"),
      (uniqueCountries > 2).as("is_geo_diverse"),
      (small5 / n5).as("small_amount_ratio"),
      (round5 / n5).as("round_amount_ratio"),
      zscore.as("amount_zscore"),
      coalesce(col("geo_country").isin(
        TransactionEvent.highRiskCountries.toSeq: _*), lit(false))
        .as("is_high_risk_country"),
      col("ip_address").rlike("^(tor_exit_|proxy_|vpn_)").as("is_suspicious_ip"),
      // reference: 0 (not 1.0) for a single-event window (transaction.py:136-139)
      when(n5 > 1, sameDevice / n5).otherwise(0.0).as("device_reuse_ratio"),
      (zscore > 2.0).as("is_amount_outlier"),
      ((small5 / n5) > 0.2).as("has_small_amounts"),
      ((round5 / n5) > 0.3).as("has_round_amounts"),
      col("is_fraud").as("actual_fraud"),
      lit(5).as("window_size_minutes"),
      col("ems").as("feature_timestamp"),
      unix_millis(current_timestamp()).as("computation_timestamp"),
      n5.cast("int").as("window_event_count"))
  }

  /** Per-event ClickstreamFeatures (B1-B8). Sessions keyed by the event's
    * own session_id (the reference trusts the client session id;
    * gap-based sessionization is the session_window / sessionSteps path). */
  def clickstreamFeatures(events: Dataset[ClickEvent]): DataFrame = {
    val e = events.toDF().withColumn("ems", col("timestamp"))
    val sess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ems"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w5 = Window.partitionBy(col("user_id")).orderBy(col("ems"))
      .rangeBetween(-(H5M - 1), 0)

    val pages = count(lit(1)).over(sess)
    val cartAdds = sum(when(col("action_type") === "ADD_TO_CART", 1)
      .otherwise(0)).over(sess)
    val cartRemoves = sum(when(col("action_type") === "REMOVE_FROM_CART", 1)
      .otherwise(0)).over(sess)
    val purchases = sum(when(col("action_type") === "PURCHASE", 1)
      .otherwise(0)).over(sess)
    val conversion = purchases / greatest(cartAdds, lit(1L))
    val abandonment = cartRemoves / greatest(cartAdds, lit(1L))
    val durationMin = (col("ems") - min(col("ems")).over(sess)) / 60000.0
    // reference computes dwell/scroll means over the trailing 5m window,
    // not the whole session (clickstream.py:79-83)
    val dwellAvgSec = (avg(col("dwell_time_ms")).over(w5) / 1000.0)
    val scrollAvg = avg(col("scroll_depth")).over(w5)
    val clicks5 = sum(when(col("action_type") === "CLICK", 1).otherwise(0))
      .over(w5)
    val n5 = count(lit(1)).over(w5)
    val engagement =
      lit(0.3) * least(coalesce(dwellAvgSec, lit(0.0)) / 30.0, lit(1.0)) +
      lit(0.2) * coalesce(scrollAvg, lit(0.0)) +
      lit(0.3) * least(pages / 10.0, lit(1.0)) +
      lit(0.2) * conversion

    e.select(
      col("user_id").as("entity_id"),
      lit("user").as("entity_type"),
      lit("clickstream").as("feature_type"),
      col("session_id"),
      durationMin.as("session_duration_min"),
      pages.cast("int").as("pages_per_session"),
      size(collect_set(col("category_id")).over(sess)).cast("int")
        .as("unique_categories_session"),
      dwellAvgSec.as("avg_dwell_time_sec"),
      scrollAvg.as("avg_scroll_depth"),
      n5.cast("int").as("page_views_5m"),
      size(collect_set(col("page_type")).over(w5)).cast("int")
        .as("unique_pages_5m"),
      (clicks5 / n5).as("click_rate_5m"),
      cartAdds.cast("int").as("cart_adds_session"),
      cartRemoves.cast("int").as("cart_removes_session"),
      purchases.cast("int").as("purchases_session"),
      conversion.as("conversion_rate_session"),
      abandonment.as("cart_abandonment_rate"),
      engagement.as("engagement_score"),
      (engagement > 0.7).as("is_high_engagement"),
      (conversion > 0.1).as("is_likely_purchaser"),
      col("ems").as("feature_timestamp"),
      unix_millis(current_timestamp()).as("computation_timestamp"))
  }
}
