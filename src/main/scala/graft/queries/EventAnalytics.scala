package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.AsOfJoin
import Exact._

/** Lookup/join/serving-side operators over the events stream stand-in:
  * point-in-time (as-of) join (J5), interval (stream-stream) join (J2),
  * online-store latest snapshot + freshness (S9/J4), watermark & late-event
  * accounting (W6-W8), JSON decode (S5), dedup, top-k, confusion-matrix
  * accounting (M16) and the rule-based fraud scoring pipeline (M13-M15).
  */
object EventAnalytics extends QueryModule {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).withColumn("ems", epochMs(col("ts")))

  // ------------------------------------------------------------------- J5
  /** As-of join: each purchase gets the user's latest signup at-or-before
    * its timestamp (Feast get_historical_features semantics,
    * ref feast/feature_utils.py:151-232). Uses the scalable union-sort
    * AsOfJoin operator — no row explosion, one shuffle on the key. */
  private def asOfJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
              col("ems").as("purchase_ts_ms"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"),
              col("ems").as("signup_ts_ms"), col("value").as("signup_value"))
    AsOfJoin.asOf(purchases, signups, Seq("user_id"),
        leftTs = "purchase_ts_ms", rightTs = "signup_ts_ms",
        rightCols = Seq("signup_id", "signup_ts_ms", "signup_value"),
        tieBreak = "signup_id")
      .withColumn("mins_since_signup",
        (col("purchase_ts_ms") - col("signup_ts_ms")) / 60000.0)
      .orderBy(col("purchase_id"))
  }

  private val asOfJoinSql =
    """WITH l AS (
      |  SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS purchase_ts_ms
      |  FROM events WHERE event_type = 'purchase'
      |), r AS (
      |  SELECT user_id, event_id AS signup_id, epoch_ms(ts) AS signup_ts_ms,
      |         value AS signup_value
      |  FROM events WHERE event_type = 'signup'
      |), j AS (
      |  SELECT l.purchase_id, l.user_id, l.purchase_ts_ms,
      |         r.signup_id, r.signup_ts_ms, r.signup_value,
      |         row_number() OVER (PARTITION BY l.purchase_id
      |           ORDER BY r.signup_ts_ms DESC, r.signup_id DESC) AS rn
      |  FROM l LEFT JOIN r
      |    ON l.user_id = r.user_id AND r.signup_ts_ms <= l.purchase_ts_ms
      |)
      |SELECT purchase_id, user_id, purchase_ts_ms, signup_id, signup_ts_ms,
      |  signup_value,
      |  (purchase_ts_ms - signup_ts_ms) / 60000.0 AS mins_since_signup
      |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin

  // ------------------------------------------------------------------- J2
  /** Interval join (stream-stream enrichment shape, DesignDoc.md:81):
    * count each purchase's same-user clicks in the preceding hour. */
  private def intervalJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
              col("ems").as("p_ems"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ems").as("c_ems"))
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
        col("c_ems") >= col("p_ems") - 3600000L && col("c_ems") < col("p_ems"),
        "left")
      .groupBy(col("purchase_id"), col("p_user"), col("p_ems"))
      .agg(count(col("c_ems")).as("clicks_prev_1h"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
              col("p_ems").as("ts_ms"), col("clicks_prev_1h"))
      .orderBy(col("purchase_id"))
  }

  private[queries] val intervalJoinSql =
    """SELECT p.event_id AS purchase_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
      |  (SELECT count(*) FROM events c
      |   WHERE c.user_id = p.user_id AND c.event_type = 'click'
      |     AND epoch_ms(c.ts) >= epoch_ms(p.ts) - 3600000
      |     AND epoch_ms(c.ts) < epoch_ms(p.ts)) AS clicks_prev_1h
      |FROM events p WHERE p.event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

  // -------------------------------------------------------------- S9 / J4
  /** Online-store read path: latest feature row per entity + freshness
    * versus the global max event time (ref inference/features.py:199-221,
    * redis latest-pointer redis_sink.py:145-151). The global max is a
    * broadcast scalar, not a single-partition window. */
  private def latestSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ems").desc, col("event_id").desc)
    val latest = e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val globalMax = e.agg(max(col("ems")).as("gmax"))
    latest.crossJoin(broadcast(globalMax))
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ems").as("last_ts_ms"), col("event_type").as("last_type"),
        col("value").as("last_value"),
        ((col("gmax") - col("ems")) / 60000.0).as("freshness_min"))
      .orderBy(col("user_id"))
  }

  private val latestSnapshotSql =
    """WITH ranked AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ems, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn,
      |    MAX(epoch_ms(ts)) OVER () AS gmax
      |  FROM events)
      |SELECT user_id, event_id AS last_event_id, ems AS last_ts_ms,
      |  event_type AS last_type, value AS last_value,
      |  (gmax - ems) / 60000.0 AS freshness_min
      |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- W6-W8
  /** Watermark generation + late-event accounting in arrival order
    * (event_id = arrival sequence): watermark = max-seen event time minus
    * 5 s out-of-orderness bound; an event is late if it arrives below the
    * watermark (ref utils/watermarks.py:67-105, metrics.py:38-43).
    * Emits per-event-type counters, the observability the reference keeps
    * in Prometheus counters.
    *
    * Watermark accounting is sequential by nature, but the exclusive
    * prefix-max decomposes: bucket the arrival sequence by collected
    * event_id cut points, take the per-bucket running max in parallel,
    * then merge with the (collected, tiny) running max of earlier buckets
    * — no single-partition global sort (the streaming path gets the same
    * number incrementally via `observe()`, Observability.scala). */
  private def watermarkLate(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.RangeBuckets
    // persisted across the three phases — one events scan instead of three
    val base = ev(spark, dir)
      .select(col("event_id"), col("event_type"), col("ems")).persist()
    val cuts = RangeBuckets.cuts(base, col("event_id"))
    val bucketed = base.withColumn("bucket",
      RangeBuckets.ascBucket(cuts, col("event_id")))
    // Per-bucket max event time -> exclusive running max of earlier buckets
    // (None for the first bucket; tiny driver-side fold).
    val bmax = bucketed.groupBy(col("bucket")).agg(max(col("ems")).as("m"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    val offsets = RangeBuckets.exclusivePrefix(bmax, Option.empty[Long]) {
      (acc, m) => Some(acc.fold(m)(math.max(_, m)))
    }
    val offsetsDf = {
      import spark.implicits._
      offsets.toDF("bucket", "omax")
    }
    val local = Window.partitionBy(col("bucket")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = bucketed
      .withColumn("lmax", max(col("ems")).over(local))
      .join(broadcast(offsetsDf), Seq("bucket"))
      // greatest() skips nulls in both engines; null only when both are
      // null, i.e. the very first arrival, which has no watermark yet.
      .withColumn("wm", greatest(col("lmax"), col("omax")) - 5000L)
      .withColumn("is_late", col("wm").isNotNull && col("ems") < col("wm"))
      .withColumn("delay_ms",
        when(col("is_late"), col("wm") - col("ems")).otherwise(lit(0L)))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("is_late"), 1).otherwise(0)).as("n_late"),
        max(col("delay_ms")).as("max_delay_ms"),
        (sum(when(col("is_late"), 1).otherwise(0)) / count(lit(1)))
          .as("late_rate"))
      .orderBy(col("event_type"))
    graft.core.CachePin.sealAndRelease(out, base)
  }

  private val watermarkLateSql =
    """WITH seq AS (
      |  SELECT event_type, epoch_ms(ts) AS ems,
      |    MAX(epoch_ms(ts)) OVER (ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 5000 AS wm
      |  FROM events
      |), flagged AS (
      |  SELECT event_type,
      |    (wm IS NOT NULL AND ems < wm) AS is_late,
      |    CASE WHEN wm IS NOT NULL AND ems < wm THEN wm - ems ELSE 0 END AS delay_ms
      |  FROM seq)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(SUM(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  MAX(delay_ms) AS max_delay_ms,
      |  SUM(CASE WHEN is_late THEN 1 ELSE 0 END) / count(*) AS late_rate
      |FROM flagged GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------- S5
  /** JSON decode + aggregation (ref feature_job.py:72-105 deserialization;
    * metadata map access): parse props, aggregate the extracted key. */
  private def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(spark, dir)
      .withColumn("k", k)
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_parsed"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")) / count(col("k"))).as("avg_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  private val jsonExtractSql =
    """SELECT event_type,
      |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_parsed,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
      |    / COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------- dedup/O1
  /** Keep-first dedup per (user, event_type) — watermark-scoped
    * dropDuplicates in the streaming path; row_number form in batch. */
  private def dedupFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ems"), col("event_id"))
    ev(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ems"))
      .orderBy(col("event_id"))
  }

  private[queries] val dedupFirstSql =
    """SELECT event_id, user_id, event_type, ems FROM (
      |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ems,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY epoch_ms(ts), event_id) AS rn
      |  FROM events)
      |WHERE rn = 1 ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------- O2-O4
  /** Top-5 users by activity (top-k + tie-break; ref inference/models.py:537
    * top-5 truncation, app.py:485 batch limit). */
  private def topUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           max(col("value")).as("max_value"),
           sum(when(col("event_type") === "purchase", 1).otherwise(0))
             .as("n_purchases"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(5)

  private val topUsersSql =
    """SELECT user_id, count(*) AS n_events, MAX(value) AS max_value,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
      |FROM events GROUP BY user_id
      |ORDER BY n_events DESC, user_id LIMIT 5""".stripMargin

  /** topUsers through the salted two-phase aggregation (SkewedAggregate):
    * the hot-key-safe execution of the same query — the generator
    * concentrates activity on top entities (txgen.py:117-123), the shape
    * that makes one reducer own a hot key at 100 TB. Same oracle as
    * evt_top_users: salting is an execution strategy, results identical. */
  private def topUsersSalted(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.SkewedAggregate
    import graft.operators.SkewedAggregate.Agg
    val pre = Tables.events(spark, dir)
      .select(col("user_id"), col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("is_purchase"))
    SkewedAggregate.saltedAgg(pre, Seq("user_id"), salts = 8,
        Seq(Agg("count", ""), Agg("max", "value"), Agg("sum", "is_purchase")))
      .select(col("user_id"), col("count").as("n_events"),
        col("max_value"), col("sum_is_purchase").as("n_purchases"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(5)
  }

  // ------------------------------------------------------------------ M16
  /** Confusion-matrix accounting against ground truth (threshold 0.3 on a
    * normalized score; ref fraud_detector.py:184-205, inference/config.py:51).
    * "Fraud" proxy label = error events; score = value / 200 clamped. */
  private def confusion(spark: SparkSession, dir: String): DataFrame = {
    val score = least(col("value") / 200.0, lit(1.0))
    val pred = score > 0.3
    val label = col("event_type") === "error"
    val tp = sum(when(pred && label, 1).otherwise(0))
    val fp = sum(when(pred && !label, 1).otherwise(0))
    val tn = sum(when(!pred && !label, 1).otherwise(0))
    val fn = sum(when(!pred && label, 1).otherwise(0))
    Tables.events(spark, dir).agg(
      tp.as("tp"), fp.as("fp"), tn.as("tn"), fn.as("fn"),
      when(tp + fp > 0, tp / (tp + fp)).otherwise(0.0).as("precision"),
      when(tp + fn > 0, tp / (tp + fn)).otherwise(0.0).as("recall"),
      ((tp + tn) / count(lit(1))).as("accuracy"))
  }

  private val confusionSql =
    """WITH f AS (
      |  SELECT LEAST(value / 200.0, 1.0) > 0.3 AS pred,
      |         event_type = 'error' AS label
      |  FROM events)
      |SELECT
      |  CAST(SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |  CAST(SUM(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |  CAST(SUM(CASE WHEN NOT pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS tn,
      |  CAST(SUM(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |  CASE WHEN SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END)
      |          + SUM(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) > 0
      |    THEN SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END)
      |       / (SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END)
      |          + SUM(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END))
      |    ELSE 0.0 END AS precision,
      |  CASE WHEN SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END)
      |          + SUM(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) > 0
      |    THEN SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END)
      |       / (SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END)
      |          + SUM(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END))
      |    ELSE 0.0 END AS recall,
      |  (SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END)
      |   + SUM(CASE WHEN NOT pred AND NOT label THEN 1 ELSE 0 END)) / count(*) AS accuracy
      |FROM f""".stripMargin

  // ------------------------------------------------------------ M13-M15
  /** Rule-based fraud scoring pipeline, per event: anchored features ->
    * weighted score -> risk bands/action (exact reference thresholds,
    * inference/models.py:493-508: >=0.7 critical/block, >=0.4 high/review,
    * >=0.15 medium/review, else low/approve) + risk factors. */
  private def fraudPipeline(spark: SparkSession, dir: String): DataFrame = {
    val w5m = Window.partitionBy(col("user_id")).orderBy(col("ems"))
      .rangeBetween(-299999L, 0)
    val w24 = Window.partitionBy(col("user_id")).orderBy(col("ems"))
      .rangeBetween(-86399999L, 0)
    val cnt5m = count(lit(1)).over(w5m)
    val cnt24 = count(lit(1)).over(w24)
    val spanH = (col("ems") - min(col("ems")).over(w24)) / 3600000.0
    val velocity = when(spanH > 0, least((cnt24 / spanH) / 10.0, lit(1.0)))
      .otherwise(0.0)
    val score =
      lit(0.3) * least(cnt5m / 5.0, lit(1.0)) +
      lit(0.3) * velocity +
      lit(0.2) * when(col("event_type") === "error", 1.0).otherwise(0.0) +
      lit(0.2) * when(col("value") < 5.0, 1.0).otherwise(0.0)
    ev(spark, dir)
      .withColumn("score", score)
      .withColumn("velocity_score", velocity)
      .withColumn("risk_level",
        when(col("score") >= 0.7, "critical")
          .when(col("score") >= 0.4, "high")
          .when(col("score") >= 0.15, "medium")
          .otherwise("low"))
      .withColumn("recommended_action",
        when(col("score") >= 0.7, "block")
          .when(col("score") >= 0.4, "review")
          .when(col("score") >= 0.15, "review")
          .otherwise("approve"))
      .withColumn("n_risk_factors",
        when(col("velocity_score") > 0.7, 1).otherwise(0) +
        when(col("score") >= 0.4, 1).otherwise(0) +
        when(col("value") < 5.0, 1).otherwise(0))
      .select(col("event_id"), col("user_id"), col("score"),
        col("velocity_score"), col("risk_level"), col("recommended_action"),
        col("n_risk_factors"))
      .orderBy(col("event_id"))
  }

  private val fraudPipelineSql =
    """WITH base AS (
      |  SELECT event_id, user_id, event_type, value, epoch_ms(ts) AS ems
      |  FROM events
      |), feats AS (
      |  SELECT event_id, user_id, event_type, value,
      |    count(*) OVER w5 AS cnt5m,
      |    count(*) OVER w24 AS cnt24,
      |    (ems - MIN(ems) OVER w24) / 3600000.0 AS span_h
      |  FROM base
      |  WINDOW w5 AS (PARTITION BY user_id ORDER BY ems
      |                RANGE BETWEEN 299999 PRECEDING AND CURRENT ROW),
      |         w24 AS (PARTITION BY user_id ORDER BY ems
      |                RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW)
      |), scored AS (
      |  SELECT event_id, user_id,
      |    CASE WHEN span_h > 0 THEN LEAST((cnt24 / span_h) / 10.0, 1.0)
      |         ELSE 0.0 END AS velocity_score,
      |    0.3 * LEAST(cnt5m / 5.0, 1.0) +
      |    0.3 * (CASE WHEN span_h > 0 THEN LEAST((cnt24 / span_h) / 10.0, 1.0)
      |                ELSE 0.0 END) +
      |    0.2 * (CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END) +
      |    0.2 * (CASE WHEN value < 5.0 THEN 1.0 ELSE 0.0 END) AS score,
      |    value
      |  FROM feats)
      |SELECT event_id, user_id, score, velocity_score,
      |  CASE WHEN score >= 0.7 THEN 'critical' WHEN score >= 0.4 THEN 'high'
      |       WHEN score >= 0.15 THEN 'medium' ELSE 'low' END AS risk_level,
      |  CASE WHEN score >= 0.7 THEN 'block' WHEN score >= 0.4 THEN 'review'
      |       WHEN score >= 0.15 THEN 'review' ELSE 'approve' END AS recommended_action,
      |  (CASE WHEN velocity_score > 0.7 THEN 1 ELSE 0 END +
      |   CASE WHEN score >= 0.4 THEN 1 ELSE 0 END +
      |   CASE WHEN value < 5.0 THEN 1 ELSE 0 END) AS n_risk_factors
      |FROM scored ORDER BY event_id""".stripMargin

  // --------------------------------------------------- conversion funnel
  /** Ordered conversion funnel over event time: signup → view → click →
    * purchase, each stage's timestamp the user's FIRST occurrence AT OR
    * AFTER the previous stage's (the product-analytics funnel semantics —
    * out-of-order occurrences don't count). Each stage is a conditional
    * min + rejoin; stage frames shrink monotonically, so at scale each
    * pass joins the full event scan against an ever-smaller
    * user-timestamp table (broadcast once under ~100 M users). One
    * survivor-count row. */
  private def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
      .select(col("user_id"), col("event_type"), col("ems"))
    def stage(prev: DataFrame, evType: String, tPrev: String,
        tCur: String): DataFrame =
      e.filter(col("event_type") === evType)
        .join(prev, Seq("user_id"))
        .filter(col("ems") >= col(tPrev))
        .groupBy(col("user_id")).agg(min(col("ems")).as(tCur))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ems")).as("t1"))
    val s2 = stage(s1, "view", "t1", "t2")
    val s3 = stage(s2, "click", "t2", "t3")
    val s4 = stage(s3, "purchase", "t3", "t4")
    e.agg(countDistinct(col("user_id")).cast("long").as("n_users"))
      .crossJoin(broadcast(s1.agg(count(lit(1)).as("n_signup"))))
      .crossJoin(broadcast(s2.agg(count(lit(1)).as("n_view_after"))))
      .crossJoin(broadcast(s3.agg(count(lit(1)).as("n_click_after"))))
      .crossJoin(broadcast(s4.agg(count(lit(1)).as("n_purchase_after"))))
  }

  private val funnelSql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ems FROM events
      |), s1 AS (
      |  SELECT user_id, MIN(ems) AS t1 FROM e
      |  WHERE event_type = 'signup' GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, MIN(ems) AS t2 FROM e JOIN s1 USING (user_id)
      |  WHERE event_type = 'view' AND ems >= t1 GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, MIN(ems) AS t3 FROM e JOIN s2 USING (user_id)
      |  WHERE event_type = 'click' AND ems >= t2 GROUP BY e.user_id
      |), s4 AS (
      |  SELECT e.user_id, MIN(ems) AS t4 FROM e JOIN s3 USING (user_id)
      |  WHERE event_type = 'purchase' AND ems >= t3 GROUP BY e.user_id
      |)
      |SELECT
      |  (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM e) AS n_users,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_signup,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_view_after,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_click_after,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s4) AS n_purchase_after""".stripMargin

  // --------------------------------------------------- retention cohorts
  /** Weekly retention cohorts: cohort = week index of the user's first
    * event, activity = week index of each event; n_users per
    * (cohort_week, activity_week) cell — the product-analytics retention
    * triangle. Week indexing is pure BIGINT `div` arithmetic from the
    * 2024-01-01 epoch, so both engines bucket identically. Scale: one
    * group-by for first events (user-keyed), one distinct on
    * (user, cohort, activity) — both shuffles on bounded keys. */
  private def cohorts(spark: SparkSession, dir: String): DataFrame = {
    val t0 = 1704067200000L // 2024-01-01T00:00:00Z
    val week = 7L * 24 * 3600 * 1000
    val e = ev(spark, dir).select(col("user_id"), col("ems"))
    val first = e.groupBy(col("user_id")).agg(min(col("ems")).as("fe"))
    e.join(first, Seq("user_id"))
      .select(col("user_id"),
        expr(s"(fe - ${t0}L) div ${week}L").as("cohort_week"),
        expr(s"(ems - ${t0}L) div ${week}L").as("activity_week"))
      .distinct()
      .groupBy(col("cohort_week"), col("activity_week"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("activity_week"))
  }

  private val cohortsSql =
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) AS ems FROM events
      |), f AS (
      |  SELECT user_id, MIN(ems) AS fe FROM e GROUP BY user_id
      |), c AS (
      |  SELECT DISTINCT e.user_id,
      |    (fe - 1704067200000) // 604800000 AS cohort_week,
      |    (ems - 1704067200000) // 604800000 AS activity_week
      |  FROM e JOIN f USING (user_id)
      |)
      |SELECT cohort_week, activity_week, CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------ B9
  /** First-order Markov transition matrix over per-user event sequences:
    * lead(event_type) over (user, time) gives consecutive pairs, counted
    * into (from, to) cells; row-stochastic probabilities are BIGINT-count
    * ratios (exact double division, no float accumulation). The per-user
    * window shuffles once on user_id; the 5x5 cell table is tiny
    * regardless of corpus size — the canonical next-event-prediction /
    * clickstream-modeling rollup. Ties within a timestamp break on
    * event_id so both engines walk the same sequence. */
  private def markov(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ems", $"event_id")
    val t = ev(spark, dir)
      .select($"user_id", $"event_type", $"ems", $"event_id")
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
    t.groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", $"n".cast("double") /
        sum($"n").over(Window.partitionBy($"from_type")).cast("double"))
      .select($"from_type", $"to_type", $"n", $"p")
      .orderBy($"from_type", $"to_type")
  }

  private[queries] val markovSql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ems, event_id FROM events
      |), t AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ems, event_id)
      |      AS to_type
      |  FROM e
      |), c AS (
      |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      |FROM c ORDER BY from_type, to_type""".stripMargin

  // ------------------------------------------ Markov stationary distribution
  /** Stationary distribution of the [[markov]] transition chain by
    * 4 rounds of integer power iteration — which event type the
    * clickstream settles into, the PageRank-of-types companion to the
    * transition matrix. The iteration follows the repo's
    * exact-integer template (TextRank/HITS/PCA): v starts at 10⁶ per
    * type; each round u_j = Σ_i (v_i·n_ij) div rowsum_i (every term an
    * exact floor division, summed as integers) then max-normalizes back
    * to the 10⁶ fixed point, so both engines walk the identical
    * trajectory — a float iteration would drift in the last bits.
    *
    * Scale: the transition matrix is |event types|² — BOUNDED METADATA,
    * not data — so it driver-collects (like KMeans centroids) and the
    * iteration is driver arithmetic; the data-sized work is the one
    * lead() window + groupBy that builds the cells. The oracle unrolls
    * all 4 rounds in CTEs. */
  private def markovStationary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ems", $"event_id")
    val cells = ev(spark, dir)
      .select($"user_id", $"event_type", $"ems", $"event_id")
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rs = cells.groupBy(_._1).map { case (f, xs) => f -> xs.map(_._3).sum }
    val types = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted
    var v: Map[String, Long] = types.map(_ -> 1000000L).toMap
    for (_ <- 1 to 4) {
      val u = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      cells.foreach { case (f, to, n) => u(to) += v.getOrElse(f, 0L) * n / rs(f) }
      val mx = u.values.max
      v = types.map(ty => ty -> u(ty) * 1000000L / mx).toMap
    }
    v.toSeq.toDF("event_type", "stationary_fp")
      .withColumn("rank", row_number().over(
        Window.orderBy(col("stationary_fp").desc, col("event_type")))
        .cast("long"))
      .orderBy(col("rank"))
  }

  private val markovStationarySql = {
    val base =
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ems, event_id FROM events
        |), t AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ems, event_id)
        |      AS to_type
        |  FROM e
        |), c AS (
        |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2
        |), r AS (
        |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS rs FROM c GROUP BY 1
        |), v0 AS (
        |  -- the type UNIVERSE is from ∪ to (r11 advice): a type that only
        |  -- ever appears as a source (no predecessor) must still carry a
        |  -- zero-mass row through every round, mirroring the Spark side's
        |  -- withDefaultValue(0) over (from ∪ to) — on skewed corpora the
        |  -- old DISTINCT from_type seed dropped such rows entirely
        |  SELECT ty, CAST(1000000 AS BIGINT) AS v FROM
        |  (SELECT from_type AS ty FROM c UNION SELECT to_type FROM c)
        |)""".stripMargin
    val rounds = (1 to 4).map { k =>
      val prev = if (k == 1) "v0" else s"v${k - 1}"
      s"""u${k}raw AS (
         |  SELECT c.to_type AS ty, CAST(SUM((v.v * c.n) // r.rs) AS BIGINT) AS u
         |  FROM c JOIN $prev v ON v.ty = c.from_type
         |  JOIN r ON r.from_type = c.from_type
         |  GROUP BY c.to_type
         |), u$k AS (
         |  SELECT v0.ty, COALESCE(u.u, CAST(0 AS BIGINT)) AS u
         |  FROM v0 LEFT JOIN u${k}raw u ON u.ty = v0.ty
         |), m$k AS (SELECT MAX(u) AS mx FROM u$k),
         |v$k AS (SELECT ty, CAST((u * 1000000) // mx AS BIGINT) AS v
         |        FROM u$k, m$k)""".stripMargin
    }.mkString(", ")
    s"""$base, $rounds
       |SELECT ty AS event_type, v AS stationary_fp,
       |  CAST(row_number() OVER (ORDER BY v DESC, ty) AS BIGINT) AS rank
       |FROM v4 ORDER BY rank""".stripMargin
  }

  // ----------------------------------------------------------------- B10
  /** Sequence-pattern matching (the MATCH_RECOGNIZE shape at DataFrame
    * level): each user's time-ordered event-type initials collapse into
    * one string, and the view->click->purchase funnel pattern is counted
    * by regex over it. The per-user sequence is bounded by user activity
    * (collect_list is per-key, sorted deterministically via array_sort
    * over (ems, id) structs — NOT relying on collect_list order, which
    * is partition-dependent); a 100 TB clickstream would sessionize
    * first so each collected sequence stays small. */
  private def sequencePattern(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seqs = ev(spark, dir)
      .select($"user_id", substring($"event_type", 1, 1).as("c"),
        $"ems", $"event_id")
      .groupBy($"user_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct($"ems", $"event_id", $"c"))),
          x => x.getField("c")),
        "").as("seq"))
    seqs.filter($"seq".rlike("vcp"))
      .select($"user_id",
        length($"seq").cast("long").as("n_events"),
        regexp_count($"seq", lit("vcp")).cast("long").as("n_funnels"))
      .orderBy($"user_id")
  }

  private val sequencePatternSql =
    """WITH e AS (
      |  SELECT user_id, substr(event_type, 1, 1) AS c,
      |    epoch_ms(ts) AS ems, event_id
      |  FROM events
      |), s AS (
      |  SELECT user_id, string_agg(c, '' ORDER BY ems, event_id) AS seq
      |  FROM e GROUP BY 1)
      |SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
      |  CAST(len(regexp_extract_all(seq, 'vcp')) AS BIGINT) AS n_funnels
      |FROM s WHERE regexp_matches(seq, 'vcp')
      |ORDER BY user_id""".stripMargin

  // ----------------------------------------------------------------- B11
  /** SCD Type-2 dimension build from the change log (the CDC-to-warehouse
    * shape): consecutive runs of the same per-user event_type collapse
    * into validity intervals via gaps-and-islands — change flag by lag(),
    * island id by running sum, interval close by lead() of the next
    * island's start (half-open; -1 = current version). One shuffle on
    * user_id; every window shares that partitioning. */
  private def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scd2Build(spark, ev(spark, dir).filter($"user_id" < 40))
      .orderBy($"user_id", $"version")
  }

  /** The gaps-and-islands SCD2 build over any (user_id, event_type, ems,
    * event_id) change log — shared by the interval query and the
    * point-in-interval lookup below. */
  private def scd2Build(spark: SparkSession, src: DataFrame): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ems", $"event_id")
    val f = src
      .select($"user_id", $"event_type", $"ems", $"event_id")
      .withColumn("chg",
        when(lag($"event_type", 1).over(w).isNull ||
          lag($"event_type", 1).over(w) =!= $"event_type", 1).otherwise(0))
      .withColumn("island", sum($"chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    f.groupBy($"user_id", $"island", $"event_type")
      .agg(min($"ems").as("valid_from_ms"), count(lit(1)).as("n_rows"))
      .withColumn("valid_to_ms", coalesce(
        lead($"valid_from_ms", 1).over(
          Window.partitionBy($"user_id").orderBy($"island")),
        lit(-1L)))
      .select($"user_id", $"island".cast("long").as("version"),
        $"event_type", $"valid_from_ms", $"valid_to_ms", $"n_rows")
  }

  private def scd2SqlFor(where: String): String =
    s"""WITH e AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ems, event_id
      |  FROM events WHERE $where
      |), f AS (
      |  SELECT user_id, event_type, ems, event_id,
      |    CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
      |      THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ems, event_id)
      |), isl AS (
      |  SELECT user_id, event_type, ems,
      |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ems, event_id
      |      ROWS UNBOUNDED PRECEDING) AS island
      |  FROM f
      |), g AS (
      |  SELECT user_id, island, event_type,
      |    MIN(ems) AS valid_from_ms, CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM isl GROUP BY 1, 2, 3)
      |SELECT user_id, CAST(island AS BIGINT) AS version, event_type,
      |  valid_from_ms,
      |  COALESCE(LEAD(valid_from_ms) OVER (PARTITION BY user_id
      |    ORDER BY island), -1) AS valid_to_ms,
      |  n_rows
      |FROM g""".stripMargin

  private val scd2BaseSql = scd2SqlFor("user_id < 40")

  private val scd2IntervalsSql =
    scd2BaseSql + "\nORDER BY user_id, version"

  // --------------------------------------------------------------- B11b
  /** SCD2 POINT-IN-INTERVAL LOOKUP (round 10) — the warehouse PIT
    * dimension enrichment: each purchase is joined to the dimension
    * version VALID at its timestamp, where the dimension is the SCD2
    * build over the user's non-purchase activity. The naive plan is an
    * interval theta-join (`from <= ts AND ts < to`) — a non-equi join
    * Spark executes as broadcast-nested-loop, O(|probes|·|versions|)
    * per user. Because gaps-and-islands intervals ABUT (each close IS
    * the next open, half-open), interval containment is equivalent to
    * "latest version with valid_from <= ts" — a backward as-of join, so
    * the same union-sort [[graft.operators.AsOfJoin]] shape answers it
    * in one shuffle with |probes| + |versions| rows and no per-probe
    * explosion. tieBreak = version: a zero-width version (two islands
    * opening on one tied ms) loses to its successor, exactly as the
    * oracle's half-open containment excludes empty intervals. Probes
    * before a user's first version surface NULLs (left semantics). */
  /** The non-purchase SCD2 dimension the lookup queries probe (batch and
    * streaming twins share it; the streaming side broadcasts it packed
    * per user). */
  private[graft] def scdDim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scd2Build(spark,
        ev(spark, dir).filter($"user_id" < 40 &&
          $"event_type" =!= "purchase"))
      .select($"user_id", $"version", $"event_type".as("dim_type"),
        $"valid_from_ms", $"valid_to_ms")
  }

  private def scdLookup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = scdDim(spark, dir)
      .select($"user_id", $"version", $"dim_type", $"valid_from_ms")
    val probes = ev(spark, dir)
      .filter($"user_id" < 40 && $"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ems")
    graft.operators.AsOfJoin.asOf(
        probes, dim, Seq("user_id"), "ems", "valid_from_ms",
        rightCols = Seq("version", "dim_type", "valid_from_ms"),
        tieBreak = "version")
      .select($"user_id", $"event_id", $"ems", $"version", $"dim_type",
        $"valid_from_ms")
      .orderBy($"event_id")
  }

  private[queries] val scdLookupSql =
    s"""WITH dim AS (
       |${scd2SqlFor("user_id < 40 AND event_type <> 'purchase'")}
       |), p AS (
       |  SELECT user_id, event_id, epoch_ms(ts) AS ems FROM events
       |  WHERE user_id < 40 AND event_type = 'purchase'
       |)
       |SELECT p.user_id, p.event_id, p.ems, d.version,
       |  d.event_type AS dim_type, d.valid_from_ms
       |FROM p LEFT JOIN dim d ON d.user_id = p.user_id
       |  AND d.valid_from_ms <= p.ems
       |  AND (d.valid_to_ms = -1 OR p.ems < d.valid_to_ms)
       |ORDER BY p.event_id""".stripMargin

  /** The streaming twin can only emit CLOSED versions (an open interval
    * may still extend) — the oracle is the batch build minus the open
    * tail rows. */
  private[queries] val scd2ClosedSql =
    s"""SELECT * FROM (
       |$scd2BaseSql
       |) t WHERE valid_to_ms <> -1 ORDER BY user_id, version""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_markov_transitions" -> (markov _),
    "graph_markov_stationary" -> (markovStationary _),
    "evt_sequence_pattern" -> (sequencePattern _),
    "evt_scd2_intervals" -> (scd2Intervals _),
    "evt_scd_lookup" -> (scdLookup _),
    "evt_conversion_funnel" -> (funnel _),
    "evt_retention_cohorts" -> (cohorts _),
    "evt_asof_join" -> (asOfJoinQ _),
    "evt_interval_join" -> (intervalJoinQ _),
    "evt_latest_snapshot" -> (latestSnapshot _),
    "evt_watermark_late" -> (watermarkLate _),
    "evt_json_extract" -> (jsonExtract _),
    "evt_dedup_first" -> (dedupFirst _),
    "evt_top_users" -> (topUsers _),
    "evt_top_users_salted" -> (topUsersSalted _),
    "evt_confusion_matrix" -> (confusion _),
    "evt_fraud_pipeline" -> (fraudPipeline _))

  override def oracles: Map[String, String] = Map(
    "evt_markov_transitions" -> markovSql,
    "graph_markov_stationary" -> markovStationarySql,
    "evt_sequence_pattern" -> sequencePatternSql,
    "evt_scd2_intervals" -> scd2IntervalsSql,
    "evt_scd_lookup" -> scdLookupSql,
    "evt_conversion_funnel" -> funnelSql,
    "evt_retention_cohorts" -> cohortsSql,
    "evt_asof_join" -> asOfJoinSql,
    "evt_interval_join" -> intervalJoinSql,
    "evt_latest_snapshot" -> latestSnapshotSql,
    "evt_watermark_late" -> watermarkLateSql,
    "evt_json_extract" -> jsonExtractSql,
    "evt_dedup_first" -> dedupFirstSql,
    "evt_top_users" -> topUsersSql,
    "evt_top_users_salted" -> topUsersSql,
    "evt_confusion_matrix" -> confusionSql,
    "evt_fraud_pipeline" -> fraudPipelineSql)
}
