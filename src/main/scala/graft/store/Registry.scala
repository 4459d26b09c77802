package graft.store

import org.apache.spark.sql.types.StructType

/** Feature registry: plain Scala mirrors of the reference's Feast
  * definitions (ref /root/reference/feast/entities.py:14-71,
  * feature_views.py:32-253) — entities with join keys, feature views with
  * schema/TTL/entities, and feature services bundling views.
  *
  * The registry is metadata only; storage/retrieval live in
  * [[OnlineStore]] / [[HistoricalStore]]. At scale the registry would be
  * serialized alongside the tables; here it is compiled code, which is
  * also how the reference ships it (Python definitions, not a DB).
  */
final case class Entity(name: String, joinKey: String, description: String = "")

final case class FeatureView(
    name: String,
    entities: Seq[Entity],
    ttlMs: Long,
    schema: StructType,
    timestampField: String = "feature_timestamp",
    createdTimestampColumn: String = "computation_timestamp")

final case class FeatureService(name: String, views: Seq[FeatureView],
    tags: Map[String, String] = Map.empty)

object Registry {
  import org.apache.spark.sql.types._

  // ref feast/entities.py:14-63
  val card: Entity = Entity("card", "card_id", "payment card")
  val user: Entity = Entity("user", "user_id", "user")
  val device: Entity = Entity("device", "device_id", "device")
  val session: Entity = Entity("session", "session_id", "browsing session")
  val entities: Seq[Entity] = Seq(card, user, device, session)

  private def fields(fs: (String, DataType)*): StructType =
    StructType(fs.map { case (n, t) => StructField(n, t, nullable = true) })

  // ref feast/feature_views.py:32-93 (txn stats, ttl 24h)
  val transactionFeatures: FeatureView = FeatureView(
    "transaction_features", Seq(card), ttlMs = 24L * 3600 * 1000,
    schema = fields(
      "txn_count_5m" -> IntegerType, "txn_count_30m" -> IntegerType,
      "txn_count_24h" -> IntegerType,
      "amount_sum_5m" -> DoubleType, "amount_avg_5m" -> DoubleType,
      "amount_max_5m" -> DoubleType, "amount_min_5m" -> DoubleType,
      "amount_std_5m" -> DoubleType,
      "unique_countries_5m" -> IntegerType,
      "geo_diversity_score" -> DoubleType,
      "time_since_last_txn_min" -> DoubleType,
      "velocity_score" -> DoubleType,
      "high_risk_txn_ratio" -> DoubleType,
      "is_high_velocity" -> BooleanType,
      "amount_zscore" -> DoubleType,
      "actual_fraud" -> BooleanType))

  // ref feast/feature_views.py:96-117 (device risk, ttl 7d)
  val deviceRiskFeatures: FeatureView = FeatureView(
    "device_risk_features", Seq(device), ttlMs = 7L * 24 * 3600 * 1000,
    schema = fields(
      "is_proxy" -> BooleanType, "is_tor" -> BooleanType,
      "risk_score" -> DoubleType, "total_events" -> LongType))

  // ref feast/feature_views.py:120-164 (user engagement, ttl 12h)
  val userEngagementFeatures: FeatureView = FeatureView(
    "user_engagement_features", Seq(user), ttlMs = 12L * 3600 * 1000,
    schema = fields(
      "session_duration_min" -> DoubleType, "pages_per_session" -> IntegerType,
      "unique_categories_session" -> IntegerType,
      "avg_dwell_time_sec" -> DoubleType, "click_rate_5m" -> DoubleType,
      "cart_adds_session" -> IntegerType, "purchases_session" -> IntegerType,
      "conversion_rate_session" -> DoubleType,
      "engagement_score" -> DoubleType, "is_high_engagement" -> BooleanType))

  // ref feast/feature_views.py:187-205 (cross-entity user x device, ttl 7d)
  val userDeviceFeatures: FeatureView = FeatureView(
    "user_device_features", Seq(user, device), ttlMs = 7L * 24 * 3600 * 1000,
    schema = fields(
      "device_count_24h" -> IntegerType, "primary_device_ratio" -> DoubleType))

  val views: Seq[FeatureView] = Seq(
    transactionFeatures, deviceRiskFeatures, userEngagementFeatures,
    userDeviceFeatures)

  // ref feast/feature_views.py:216-253
  val fraudDetectionService: FeatureService = FeatureService(
    "fraud_detection",
    Seq(transactionFeatures, deviceRiskFeatures),
    Map("sla_p95_ms" -> "50"))
  val personalizationService: FeatureService = FeatureService(
    "personalization",
    Seq(userEngagementFeatures, userDeviceFeatures),
    Map("sla_p95_ms" -> "100"))
}
