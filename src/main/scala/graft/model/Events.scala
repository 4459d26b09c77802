package graft.model

/** Typed event and feature-row contracts (SURVEY.md §1.2, FIXTURES.md),
  * mirroring the reference's Avro schemas and Pydantic models
  * (ref schemas/transactions.v1.avsc + v2, clicks.v1.avsc, devices.v1.avsc;
  * streaming/core/models/events.py:12-57, features.py:12-104).
  * Timestamps are epoch millis (the Avro timestamp-millis logical type);
  * v2-only transaction fields are Options with None defaults so v1
  * records decode into the same class (schema evolution).
  */
final case class TransactionEvent(
    txn_id: String,
    card_id: String,
    user_id: String,
    amount: Double,
    currency: String,
    mcc: String,
    device_id: String,
    ip_address: String,
    geo_country: Option[String],
    geo_city: Option[String],
    geo_lat: Option[Double],
    geo_lon: Option[Double],
    timestamp: Long,
    processing_time: Option[Long],
    is_fraud: Boolean = false,
    metadata: Map[String, String] = Map.empty,
    // v2 additions (schemas/transactions.v2.avsc, all backward compatible)
    merchant_id: Option[String] = None,
    merchant_name: Option[String] = None,
    merchant_category: Option[String] = None,
    risk_score: Double = 0.0,
    payment_method: Option[String] = None)

object TransactionEvent {
  val currencies = Set("USD", "EUR", "GBP", "CAD", "AUD", "JPY", "CHF")
  val paymentMethods = Set("CARD_PRESENT", "CARD_NOT_PRESENT", "CONTACTLESS",
    "MOBILE_WALLET", "BANK_TRANSFER")
  val highRiskMcc = Set("6011", "5967", "7011", "7995") // transaction.py:75
  val mediumRiskMcc = Set("5311", "4511")               // transaction.py:76
  val highRiskCountries =                               // transaction.py:128
    Set("CN", "RU", "NG", "BR", "MX", "IN", "ID", "VN")
}

final case class ClickEvent(
    event_id: String,
    user_id: String,
    session_id: String,
    page_url: String,
    page_type: String,
    item_id: Option[String],
    category_id: Option[String],
    action_type: String,
    referrer_url: Option[String],
    device_id: String,
    user_agent: Option[String],
    ip_address: String,
    dwell_time_ms: Option[Long],
    scroll_depth: Option[Double],
    timestamp: Long,
    processing_time: Option[Long],
    experiment_ids: Seq[String] = Seq.empty,
    metadata: Map[String, String] = Map.empty)

object ClickEvent {
  val pageTypes = Set("HOME", "PRODUCT", "CATEGORY", "CART", "CHECKOUT",
    "PROFILE", "OTHER")
  val actionTypes = Set("VIEW", "CLICK", "ADD_TO_CART", "REMOVE_FROM_CART",
    "PURCHASE", "SEARCH")
}

final case class DeviceEvent(
    device_id: String,
    fingerprint_hash: String,
    user_agent: String,
    browser: Option[String],
    os: Option[String],
    device_type: String,
    plugins: Seq[String],
    ip_address: String,
    is_proxy: Boolean = false,
    is_tor: Boolean = false,
    risk_score: Double = 0.0,
    first_seen: Long,
    last_seen: Long,
    timestamp: Long,
    total_events: Long = 1L,
    metadata: Map[String, String] = Map.empty)

/** Wide feature row for the card entity (features.py:12-62). */
final case class TransactionFeatures(
    entity_id: String,
    entity_type: String = "card",
    feature_type: String = "transaction",
    txn_count_5m: Int = 0,
    txn_count_30m: Int = 0,
    txn_count_24h: Int = 0,
    amount_sum_5m: Double = 0.0,
    amount_avg_5m: Double = 0.0,
    amount_max_5m: Double = 0.0,
    amount_min_5m: Double = 0.0,
    amount_std_5m: Double = 0.0,
    unique_countries_5m: Int = 0,
    geo_diversity_score: Double = 0.0,
    time_since_last_txn_min: Option[Double] = None,
    avg_time_between_txns_min: Option[Double] = None,
    velocity_score: Double = 0.0,
    is_weekend: Boolean = false,
    hour_of_day: Int = 0,
    high_risk_txn_ratio: Double = 0.0,
    medium_risk_txn_ratio: Double = 0.0,
    has_high_risk_mcc: Boolean = false,
    is_high_velocity: Boolean = false,
    is_geo_diverse: Boolean = false,
    small_amount_ratio: Double = 0.0,
    round_amount_ratio: Double = 0.0,
    amount_zscore: Double = 0.0,
    is_high_risk_country: Boolean = false,
    is_suspicious_ip: Boolean = false,
    device_reuse_ratio: Double = 0.0,
    is_amount_outlier: Boolean = false,
    has_small_amounts: Boolean = false,
    has_round_amounts: Boolean = false,
    actual_fraud: Option[Boolean] = None,
    window_size_minutes: Int = 5,
    feature_timestamp: Long,
    computation_timestamp: Long,
    window_event_count: Int = 0)

/** Wide feature row for the user/session entity (features.py:65-104). */
final case class ClickstreamFeatures(
    entity_id: String,
    entity_type: String = "user",
    feature_type: String = "clickstream",
    session_id: String,
    session_duration_min: Double = 0.0,
    pages_per_session: Int = 0,
    unique_categories_session: Int = 0,
    avg_dwell_time_sec: Option[Double] = None,
    avg_scroll_depth: Option[Double] = None,
    page_views_5m: Int = 0,
    unique_pages_5m: Int = 0,
    click_rate_5m: Double = 0.0,
    cart_adds_session: Int = 0,
    cart_removes_session: Int = 0,
    purchases_session: Int = 0,
    conversion_rate_session: Double = 0.0,
    cart_abandonment_rate: Double = 0.0,
    engagement_score: Double = 0.0,
    is_high_engagement: Boolean = false,
    is_likely_purchaser: Boolean = false,
    feature_timestamp: Long,
    computation_timestamp: Long)
