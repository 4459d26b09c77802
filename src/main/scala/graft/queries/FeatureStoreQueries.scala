package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.store._
import Exact._

/** End-to-end feature-store queries: these drive the actual OnlineStore /
  * HistoricalStore machinery (upsert-merge, idempotent batches, TTL,
  * point-in-time retrieval) against a per-invocation temp store, and the
  * final read-back is oracle-checked — so the store's MERGE/PIT semantics
  * themselves are under the correctness gate, not just the expressions.
  */
object FeatureStoreQueries extends QueryModule {

  /** Daily per-user feature rows (feature_timestamp = end of day,
    * the materialization granularity of the offline store). */
  private def dailyFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("ems", epochMs(col("ts")))
      .withColumn("day", expr("ems div 86400000"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .withColumn("feature_timestamp", (col("day") + 1) * 86400000L - 1)
      .withColumn("computation_timestamp", col("feature_timestamp"))

  private val userDailyView = FeatureView(
    "user_daily", Seq(Registry.user), ttlMs = 24L * 3600 * 1000,
    schema = StructType(Seq(
      StructField("n_events", LongType), StructField("sum_value", DoubleType))))

  /** nBuckets sized to the verify/bench corpus (~40 k daily rows → ~5 k
    * rows per bucket ≈ one task's worth, per the store's own guidance);
    * the 32-bucket default is a 100×-store layout. AsOfProbe measured
    * 8 buckets fastest at this scale (ARCHITECTURE.md, round 7). */
  private def tempStore(spark: SparkSession): OnlineStore =
    // scratch store on the tmpfs ephemeral root (round 14): each fs_*
    // query builds and reads a throwaway store per invocation — on the
    // disk-backed tmpdir those rewrite-commit renames queued behind the
    // driver sequence's writeback (the checkpoint-fsync mechanism,
    // store edition)
    new OnlineStore(spark,
      graft.core.EphemeralDirs.tempDir("graft_store_").toString,
      nBuckets = 8)

  private val dailySqlCte =
    """daily AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day, count(*) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
      |    (epoch_ms(ts) // 86400000 + 1) * 86400000 - 1 AS feature_timestamp
      |  FROM events GROUP BY user_id, day
      |)""".stripMargin

  // ------------------------------------------------------- S7/S9 roundtrip
  /** Online-store roundtrip: materialize daily features in two upsert
    * batches (split mid-range, second batch replayed to prove
    * idempotence), then read the online snapshot — latest day per user
    * must match the oracle's row_number view of the same aggregation. */
  private def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val store = tempStore(spark)
    val feats = dailyFeatures(spark, dir)
    val b1 = feats.filter(col("day") < 19746L) // 2024-01-16 cutoff
    val b2 = feats.filter(col("day") >= 19746L)
    store.upsert(userDailyView, b1, batchId = 0L)
    store.upsert(userDailyView, b2, batchId = 1L)
    store.upsert(userDailyView, b2, batchId = 1L) // replay: must be a no-op
    store.getOnlineFeatures(userDailyView,
        feats.select(col("user_id")).distinct())
      .select(col("user_id"), col("feature_timestamp"), col("n_events"),
        col("sum_value"))
      .orderBy(col("user_id"))
  }

  private val roundtripSql =
    s"""WITH $dailySqlCte,
       | latest AS (
       |  SELECT user_id, feature_timestamp, n_events, sum_value,
       |    row_number() OVER (PARTITION BY user_id ORDER BY day DESC) AS rn
       |  FROM daily)
       |SELECT user_id, feature_timestamp, n_events, sum_value
       |FROM latest WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------------- J5
  /** get_historical_features through the store's history table: each
    * purchase gets the latest daily feature row at-or-before its
    * timestamp (training-set construction with no label leakage). */
  private def pit(spark: SparkSession, dir: String): DataFrame = {
    val store = tempStore(spark)
    store.upsert(userDailyView, dailyFeatures(spark, dir), batchId = 0L)
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        epochMs(col("ts")).as("purchase_ts_ms"))
    HistoricalStore.getHistoricalFeatures(
        purchases, store.history(userDailyView), userDailyView,
        eventTsCol = "purchase_ts_ms",
        featureCols = Seq("n_events", "sum_value"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts_ms"),
        col("feature_timestamp"), col("n_events"), col("sum_value"))
      .orderBy(col("purchase_id"))
  }

  private val pitSql =
    s"""WITH $dailySqlCte,
       | l AS (
       |  SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS purchase_ts_ms
       |  FROM events WHERE event_type = 'purchase'
       |), j AS (
       |  SELECT l.purchase_id, l.user_id, l.purchase_ts_ms,
       |    d.feature_timestamp, d.n_events, d.sum_value,
       |    row_number() OVER (PARTITION BY l.purchase_id
       |      ORDER BY d.feature_timestamp DESC) AS rn
       |  FROM l LEFT JOIN daily d
       |    ON l.user_id = d.user_id AND d.feature_timestamp <= l.purchase_ts_ms)
       |SELECT purchase_id, user_id, purchase_ts_ms, feature_timestamp,
       |  n_events, sum_value
       |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin

  // -------------------------------------------------------- service PIT
  /** Second view for the service: per-user daily value extremes, TTL 72 h
    * (vs user_daily's 24 h) — the differentiated-staleness case the
    * service join must honor per view. */
  private val userValueView = FeatureView(
    "user_value", Seq(Registry.user), ttlMs = 72L * 3600 * 1000,
    schema = StructType(Seq(
      StructField("vmax", DoubleType), StructField("vmin", DoubleType))))

  private def valueFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("ems", epochMs(col("ts")))
      .withColumn("day", expr("ems div 86400000"))
      .groupBy(col("user_id"), col("day"))
      .agg(max(col("value")).as("vmax"), min(col("value")).as("vmin"))
      .withColumn("feature_timestamp", (col("day") + 1) * 86400000L - 1)
      .withColumn("computation_timestamp", col("feature_timestamp"))

  /** Multi-view FeatureService PIT retrieval (ref feast/feature_utils.py:
    * 151-168): both views join as-of each purchase's timestamp, each
    * under its own TTL. A user whose last daily row is 2 days old gets
    * NULL daily features (24 h TTL) but still gets value extremes
    * (72 h TTL) — the per-view freshness split the oracle checks
    * row-for-row. */
  private def servicePit(spark: SparkSession, dir: String): DataFrame = {
    val store = tempStore(spark)
    store.upsert(userDailyView, dailyFeatures(spark, dir), batchId = 0L)
    store.upsert(userValueView, valueFeatures(spark, dir), batchId = 0L)
    val service = FeatureService("fraud_service",
      Seq(userDailyView, userValueView))
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        epochMs(col("ts")).as("purchase_ts_ms"))
    HistoricalStore.getServiceHistoricalFeatures(
        purchases, service, v => store.history(v),
        eventTsCol = "purchase_ts_ms",
        featureCols = v =>
          if (v.name == "user_daily") Seq("n_events", "sum_value")
          else Seq("vmax", "vmin"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts_ms"),
        col("user_daily__feature_timestamp"), col("user_daily__n_events"),
        col("user_daily__sum_value"),
        col("user_value__feature_timestamp"), col("user_value__vmax"),
        col("user_value__vmin"))
      .orderBy(col("purchase_id"))
  }

  private val servicePitSql =
    s"""WITH $dailySqlCte,
       | vdaily AS (
       |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
       |    MAX(value) AS vmax, MIN(value) AS vmin,
       |    (epoch_ms(ts) // 86400000 + 1) * 86400000 - 1 AS feature_timestamp
       |  FROM events GROUP BY user_id, day
       |), l AS (
       |  SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS purchase_ts_ms
       |  FROM events WHERE event_type = 'purchase'
       |), jd AS (
       |  SELECT purchase_id, feature_timestamp, n_events, sum_value FROM (
       |    SELECT l.purchase_id, d.feature_timestamp, d.n_events, d.sum_value,
       |      row_number() OVER (PARTITION BY l.purchase_id
       |        ORDER BY d.feature_timestamp DESC) AS rn
       |    FROM l LEFT JOIN daily d
       |      ON l.user_id = d.user_id AND d.feature_timestamp <= l.purchase_ts_ms)
       |  WHERE rn = 1
       |), jv AS (
       |  SELECT purchase_id, feature_timestamp, vmax, vmin FROM (
       |    SELECT l.purchase_id, v.feature_timestamp, v.vmax, v.vmin,
       |      row_number() OVER (PARTITION BY l.purchase_id
       |        ORDER BY v.feature_timestamp DESC) AS rn
       |    FROM l LEFT JOIN vdaily v
       |      ON l.user_id = v.user_id AND v.feature_timestamp <= l.purchase_ts_ms)
       |  WHERE rn = 1
       |)
       |SELECT l.purchase_id, l.user_id, l.purchase_ts_ms,
       |  CASE WHEN jd.feature_timestamp >= l.purchase_ts_ms - 86400000
       |       THEN jd.feature_timestamp END AS user_daily__feature_timestamp,
       |  CASE WHEN jd.feature_timestamp >= l.purchase_ts_ms - 86400000
       |       THEN jd.n_events END AS user_daily__n_events,
       |  CASE WHEN jd.feature_timestamp >= l.purchase_ts_ms - 86400000
       |       THEN jd.sum_value END AS user_daily__sum_value,
       |  CASE WHEN jv.feature_timestamp >= l.purchase_ts_ms - 259200000
       |       THEN jv.feature_timestamp END AS user_value__feature_timestamp,
       |  CASE WHEN jv.feature_timestamp >= l.purchase_ts_ms - 259200000
       |       THEN jv.vmax END AS user_value__vmax,
       |  CASE WHEN jv.feature_timestamp >= l.purchase_ts_ms - 259200000
       |       THEN jv.vmin END AS user_value__vmin
       |FROM l LEFT JOIN jd ON l.purchase_id = jd.purchase_id
       |LEFT JOIN jv ON l.purchase_id = jv.purchase_id
       |ORDER BY l.purchase_id""".stripMargin

  // ------------------------------------------------------------------ TTL
  /** TTL retention on the online table: materialize, expire against the
    * global max event time, read back the surviving rows. */
  private def ttl(spark: SparkSession, dir: String): DataFrame = {
    val store = tempStore(spark)
    val feats = dailyFeatures(spark, dir)
    store.upsert(userDailyView, feats, batchId = 0L)
    val gmax = Tables.events(spark, dir)
      .agg(max(epochMs(col("ts")))).head().getLong(0)
    store.applyTtl(userDailyView, gmax)
    store.getOnlineFeatures(userDailyView,
        feats.select(col("user_id")).distinct())
      .filter(col("feature_timestamp").isNotNull)
      .select(col("user_id"), col("feature_timestamp"), col("n_events"))
      .orderBy(col("user_id"))
  }

  private val ttlSql =
    s"""WITH $dailySqlCte,
       | latest AS (
       |  SELECT user_id, feature_timestamp, n_events,
       |    row_number() OVER (PARTITION BY user_id ORDER BY day DESC) AS rn
       |  FROM daily),
       | gmax AS (SELECT MAX(epoch_ms(ts)) AS g FROM events)
       |SELECT user_id, feature_timestamp, n_events
       |FROM latest, gmax
       |WHERE rn = 1 AND feature_timestamp >= g - 86400000
       |ORDER BY user_id""".stripMargin

  // ------------------------------------------------- PIT consistency (M16)
  /** The reference's online/offline consistency contract as a graded
    * query (feature_utils.py:170-232, tolerance 0.001): materialize the
    * store, then validate that every online row equals the historical
    * (PIT) retrieval evaluated at the row's own timestamp. Returns the
    * audit summary (rows checked, rows violating) — the oracle RECOMPUTES
    * the same check in SQL, so `n_violations = 0` is verified
    * independently on both engines, not asserted. */
  private def pitConsistency(spark: SparkSession, dir: String): DataFrame = {
    val store = tempStore(spark)
    val feats = dailyFeatures(spark, dir)
    store.upsert(userDailyView, feats.filter(col("day") < 19746L), 0L)
    store.upsert(userDailyView, feats.filter(col("day") >= 19746L), 1L)
    val online = store.online(userDailyView)
    val violations = HistoricalStore.validateConsistency(
      online, store.history(userDailyView), userDailyView, "sum_value")
    online.agg(count(lit(1)).cast("long").as("n_checked")).crossJoin(
      violations.agg(count(lit(1)).cast("long").as("n_violations")))
  }

  private val pitConsistencySql =
    s"""WITH $dailySqlCte,
       | latest AS (
       |  SELECT user_id, feature_timestamp, sum_value,
       |    row_number() OVER (PARTITION BY user_id ORDER BY day DESC) AS rn
       |  FROM daily),
       | online AS (
       |  SELECT user_id, feature_timestamp, sum_value FROM latest WHERE rn = 1
       |), pit AS (
       |  SELECT o.user_id, o.sum_value, d.sum_value AS pit_value,
       |    row_number() OVER (PARTITION BY o.user_id, o.feature_timestamp
       |      ORDER BY d.feature_timestamp DESC) AS rn
       |  FROM online o LEFT JOIN daily d
       |    ON o.user_id = d.user_id
       |   AND d.feature_timestamp <= o.feature_timestamp)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_checked,
       |  CAST(SUM(CASE WHEN pit_value IS NULL
       |                  OR ABS(sum_value - pit_value) > 0.001
       |            THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
       |FROM pit WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------- time travel
  /** AS-OF read (training reproducibility): three upsert batches by day
    * range, then read the snapshot as of batch 1 — the state BEFORE batch
    * 2 existed, reconstructed from the append-only history even though
    * batch 2 has already superseded (and GC'd) the older snapshot
    * versions. Oracle: latest daily row per user over days < the batch-2
    * cutoff. */
  private def asOf(spark: SparkSession, dir: String): DataFrame = {
    val store = tempStore(spark)
    val feats = dailyFeatures(spark, dir)
    store.upsert(userDailyView, feats.filter(col("day") < 19745L), 0L)
    store.upsert(userDailyView,
      feats.filter(col("day") >= 19745L && col("day") < 19747L), 1L)
    store.upsert(userDailyView, feats.filter(col("day") >= 19747L), 2L)
    store.onlineAsOf(userDailyView, maxBatchId = 1L)
      .select(col("user_id"), col("feature_timestamp"), col("n_events"),
        col("sum_value"))
      .orderBy(col("user_id"))
  }

  private val asOfSql =
    s"""WITH $dailySqlCte,
       | latest AS (
       |  SELECT user_id, feature_timestamp, n_events, sum_value,
       |    row_number() OVER (PARTITION BY user_id ORDER BY day DESC) AS rn
       |  FROM daily WHERE day < 19747)
       |SELECT user_id, feature_timestamp, n_events, sum_value
       |FROM latest WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ------------------------------------------------- bonus: version diff
  /** Time-travel DIFF between two store versions (the Delta CDF /
    * table_changes shape on the hand-rolled store): materialize two
    * upsert batches, read the as-of snapshot at each, and classify every
    * key added / updated / unchanged. Append-only upserts mean no
    * removals — the diff is a left join from the newer snapshot, both
    * sides bucket-pruned store reads. The day-19724 cut puts 16 users in
    * only the second batch, so all three statuses are exercised. */
  private def versionDiff(spark: SparkSession, dir: String): DataFrame = {
    val store = tempStore(spark)
    val feats = dailyFeatures(spark, dir)
    store.upsert(userDailyView, feats.filter(col("day") < 19724L), 0L)
    store.upsert(userDailyView, feats.filter(col("day") >= 19724L), 1L)
    val v0 = store.onlineAsOf(userDailyView, maxBatchId = 0L)
      .select(col("user_id").as("u0"), col("n_events").as("old_n"),
        col("sum_value").as("old_sum"))
    val v1 = store.onlineAsOf(userDailyView, maxBatchId = 1L)
      .select(col("user_id"), col("n_events").as("new_n"),
        col("sum_value").as("new_sum"))
    v1.join(v0, col("user_id") === col("u0"), "left")
      .select(col("user_id"),
        when(col("u0").isNull, "added")
          .when(col("old_n") =!= col("new_n") ||
            col("old_sum") =!= col("new_sum"), "updated")
          .otherwise("unchanged").as("status"),
        coalesce(col("old_n"), lit(-1L)).as("old_n"), col("new_n"),
        coalesce(col("old_sum"), lit(-1.0)).as("old_sum"), col("new_sum"))
      .orderBy(col("user_id"))
  }

  private val versionDiffSql =
    s"""WITH $dailySqlCte,
       | v0 AS (
       |  SELECT user_id, n_events, sum_value FROM (
       |    SELECT user_id, n_events, sum_value,
       |      row_number() OVER (PARTITION BY user_id ORDER BY day DESC) AS rn
       |    FROM daily WHERE day < 19724) WHERE rn = 1
       |), v1 AS (
       |  SELECT user_id, n_events, sum_value FROM (
       |    SELECT user_id, n_events, sum_value,
       |      row_number() OVER (PARTITION BY user_id ORDER BY day DESC) AS rn
       |    FROM daily) WHERE rn = 1
       |)
       |SELECT v1.user_id,
       |  CASE WHEN v0.user_id IS NULL THEN 'added'
       |       WHEN v0.n_events <> v1.n_events OR v0.sum_value <> v1.sum_value
       |         THEN 'updated'
       |       ELSE 'unchanged' END AS status,
       |  COALESCE(v0.n_events, -1) AS old_n, v1.n_events AS new_n,
       |  COALESCE(v0.sum_value, -1.0) AS old_sum, v1.sum_value AS new_sum
       |FROM v1 LEFT JOIN v0 ON v0.user_id = v1.user_id
       |ORDER BY v1.user_id""".stripMargin

  // ---------------------------------------------------- GDPR erasure
  /** Right-to-be-forgotten: materialize the daily features, erase every
    * 7th user, then read back BOTH the serving snapshot and the
    * time-travel path (onlineAsOf reconstructs from the REWRITTEN
    * history, so an erased subject must be gone there too — the check a
    * snapshot-only delete would fail). Output per surviving user: the
    * served latest row plus the history row count. Erased keys appearing
    * anywhere, or a served row the log can no longer reproduce, breaks
    * the count/hash. */
  private def gdprErase(spark: SparkSession, dir: String): DataFrame = {
    val store = tempStore(spark)
    val feats = dailyFeatures(spark, dir)
    store.upsert(userDailyView, feats, batchId = 0L)
    val erased = feats.select(col("user_id")).distinct()
      .filter(col("user_id") % 7 === 0)
    store.erase(userDailyView, erased, eraseTag = "gdpr1")
    val days = store.history(userDailyView)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_days"))
    val asOf = store.onlineAsOf(userDailyView, maxBatchId = 0L)
      .select(col("user_id"), lit(1L).as("in_log"))
    store.online(userDailyView)
      .select(col("user_id"), col("feature_timestamp"), col("n_events"),
        col("sum_value"))
      .join(days, Seq("user_id"))
      .join(asOf, Seq("user_id"), "left")
      .select(col("user_id"), col("feature_timestamp"), col("n_events"),
        col("sum_value"), col("n_days"), coalesce(col("in_log"), lit(0L))
          .as("in_log"))
      .orderBy(col("user_id"))
  }

  private val gdprEraseSql =
    s"""WITH $dailySqlCte,
       | keep AS (
       |  SELECT * FROM daily WHERE user_id % 7 <> 0
       |), latest AS (
       |  SELECT user_id, feature_timestamp, n_events, sum_value,
       |    row_number() OVER (PARTITION BY user_id ORDER BY day DESC) AS rn
       |  FROM keep
       |), days AS (
       |  SELECT user_id, count(*) AS n_days FROM keep GROUP BY 1)
       |SELECT l.user_id, l.feature_timestamp, l.n_events, l.sum_value,
       |  CAST(d.n_days AS BIGINT) AS n_days, CAST(1 AS BIGINT) AS in_log
       |FROM latest l JOIN days d ON l.user_id = d.user_id
       |WHERE l.rn = 1 ORDER BY l.user_id""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fs_gdpr_erasure" -> (gdprErase _),
    "fs_version_diff" -> (versionDiff _),
    "fs_online_roundtrip" -> (roundtrip _),
    "fs_historical_pit" -> (pit _),
    "fs_service_pit" -> (servicePit _),
    "fs_ttl_retention" -> (ttl _),
    "fs_asof_snapshot" -> (asOf _),
    "fs_pit_consistency" -> (pitConsistency _))

  override def oracles: Map[String, String] = Map(
    "fs_gdpr_erasure" -> gdprEraseSql,
    "fs_version_diff" -> versionDiffSql,
    "fs_online_roundtrip" -> roundtripSql,
    "fs_historical_pit" -> pitSql,
    "fs_service_pit" -> servicePitSql,
    "fs_ttl_retention" -> ttlSql,
    "fs_asof_snapshot" -> asOfSql,
    "fs_pit_consistency" -> pitConsistencySql)
}
