package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.StreamingPipelines

/** SparkEntry exposure of the Structured-Streaming pipelines: each query
  * runs a REAL streaming query (file source -> memory sink, synchronously
  * to completion) and is checked against the same DuckDB oracle as its
  * batch twin — the offline/online parity gate.
  *
  * Also hosts the deterministic synthetic generator (S12): the reference
  * seeds Faker(42) for reproducible event synthesis (generators/txgen.py:
  * 47); our generator derives every field from md5(id) arithmetic so the
  * oracle can reproduce it engine-independently.
  */
object StreamingQueries extends QueryModule {

  /** W5+W6 oracle: sessionize in MICROsecond precision (session_window's
    * internal unit after parquet-nanos truncation), emit only sessions
    * sealed by the final watermark (last + 30 min gap <= max - 1 h). New
    * session when gap >= 30 min exactly: session_window's end bound is
    * exclusive, so an event exactly at prev + gap starts a new session. */
  private val sessionStreamSql =
    """WITH seq AS (
      |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS eus,
      |    CASE WHEN lag(epoch_us(ts)) OVER uw IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER uw >= 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW uw AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |), sess AS (
      |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY eus, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM seq
      |), agged AS (
      |  SELECT user_id,
      |    MIN(eus) AS start_us, MAX(eus) AS end_us,
      |    count(*) AS n_events,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
      |    MAX(MAX(eus)) OVER () AS gmax_us
      |  FROM sess GROUP BY user_id, sess_id)
      |SELECT user_id, start_us // 1000 AS session_start_ms, n_events,
      |  purchases, sum_value
      |FROM agged
      |WHERE end_us + 1800000000 <= gmax_us - 3600000000
      |ORDER BY user_id, session_start_ms""".stripMargin

  /** Per-event session-step oracle: running counters within the
    * sessionized partition (> 30 min gap starts a session, matching the
    * stateful op's strict-> reset). Parameterized over the event-source
    * CTE (event_id, user_id, event_type, ems) — the late-replay oracle
    * feeds it the survivor set. */
  private def sessionStepsSqlFrom(srcCtes: String) =
    s"""WITH $srcCtes, seq AS (
      |  SELECT event_id, user_id, event_type, ems,
      |    CASE WHEN lag(ems) OVER uw IS NULL
      |           OR ems - lag(ems) OVER uw > 1800000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM evsrc
      |  WINDOW uw AS (PARTITION BY user_id ORDER BY ems, event_id)
      |), sess AS (
      |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ems, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM seq
      |), steps AS (
      |  SELECT event_id, user_id, ems,
      |    count(*) OVER w AS session_events,
      |    (ems - MIN(ems) OVER w) / 60000.0 AS session_duration_min,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER w AS BIGINT) AS purchases_so_far,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w AS BIGINT) AS clicks_so_far
      |  FROM sess
      |  WINDOW w AS (PARTITION BY user_id, sess_id ORDER BY ems, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, ems, session_events, session_duration_min,
      |  purchases_so_far, clicks_so_far,
      |  purchases_so_far / GREATEST(clicks_so_far, 1) AS conversion_so_far
      |FROM steps ORDER BY event_id""".stripMargin

  private lazy val sessionStepsSql = sessionStepsSqlFrom(
    """evsrc AS (
      |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ems FROM events
      |)""".stripMargin)

  // ------------------------------------------------------------------ S12
  /** Deterministic synthetic transaction generator: every field is md5(id)
    * arithmetic, so replays are exact (the rate-source streaming variant
    * shares this row function). */
  private def syntheticTxns(spark: SparkSession, dir: String): DataFrame = {
    val n = 10000L
    spark.range(0, n)
      .withColumn("h",
        conv(substring(md5(col("id").cast("string").cast("binary")), 1, 8),
             16, 10).cast("long"))
      .withColumn("h2",
        conv(substring(md5(col("id").cast("string").cast("binary")), 9, 8),
             16, 10).cast("long"))
      .select(
        concat(lit("txn_"), col("id")).as("txn_id"),
        concat(lit("card_"), pmod(col("h"), lit(50L))).as("card_id"),
        (pmod(col("h2"), lit(1000000L)) / 100.0).as("amount"),
        (lit(1704067200000L) + col("id") * 60000L).as("ems"),
        (pmod(col("h") + col("h2"), lit(100L)) < 5).as("is_fraud"))
      .orderBy(col("txn_id"))
  }

  private val syntheticTxnsSql =
    """SELECT 'txn_' || i AS txn_id,
      |  'card_' || (CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 50) AS card_id,
      |  (CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 9, 8)) AS BIGINT) % 1000000) / 100.0 AS amount,
      |  1704067200000 + i * 60000 AS ems,
      |  (CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8)) AS BIGINT)
      |   + CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 9, 8)) AS BIGINT)) % 100 < 5 AS is_fraud
      |FROM range(10000) t(i)
      |ORDER BY txn_id""".stripMargin

  /** W7 allowed-lateness survivor set, as a CTE chain shared by all three
    * family members (counts / stats / session): reproduce the disordered
    * replay's batch boundaries (arrival = ems + md5-derived delay; chunk =
    * arrival-rank * LateReplayChunks / total), compute the watermark each chunk's
    * LATE-ROW FILTER ran under, and drop rows strictly below it. The
    * filter watermark is the PREVIOUS batch's (Spark's late-events/
    * eviction split since 3.4) — max event time of chunks <= c-2, minus
    * the 15 min budget; pinned empirically and by StreamingSpec. Checks
    * both halves of the reference's LateEventHandler contract
    * (watermarks.py:151-208): admissible late rows are fully reprocessed
    * (their corrections must land bit-exact), beyond-budget rows are
    * dropped (their absence must be exact too). `extraCols` carries the
    * family member's payload columns (value / event_type) through to
    * `surv`. */
  private def lateSurvivorCtes(extraCols: Seq[String]): String = {
    val sel = extraCols.map(c => s", $c").mkString
    val selC = extraCols.map(c => s", c.$c").mkString
    // the chunk rule mirrors the REPLAY cadence — the constant must
    // stay in lockstep with the Spark side (see LateReplayChunks doc)
    val nc = graft.streaming.StreamingPipelines.LateReplayChunks
    s"""arr AS (
      |  SELECT event_id, user_id$sel, epoch_ms(ts) AS ems,
      |    epoch_ms(ts) + CASE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10
      |      WHEN 7 THEN 600000 WHEN 3 THEN 691200000 ELSE 0 END AS arrival
      |  FROM events
      |), ranked AS (
      |  SELECT *, row_number() OVER (ORDER BY arrival, event_id) - 1 AS rn,
      |    COUNT(*) OVER () AS total
      |  FROM arr
      |), chunked AS (
      |  SELECT *, rn * $nc // total AS chunk FROM ranked
      |), cmax AS (
      |  SELECT chunk, MAX(ems) AS cm FROM chunked GROUP BY chunk
      |), wm AS (
      |  SELECT chunk, MAX(cm) OVER (ORDER BY chunk
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) - 900000 AS wm_ms
      |  FROM cmax
      |), surv AS (
      |  SELECT c.event_id, c.user_id$selC, c.ems
      |  FROM chunked c JOIN wm w ON c.chunk = w.chunk
      |  WHERE w.wm_ms IS NULL OR c.ems >= w.wm_ms
      |)""".stripMargin
  }

  /** Counts member: anchored RANGE-frame counts over the survivors. */
  private lazy val anchoredLateSql =
    s"""WITH ${lateSurvivorCtes(Nil)}
      |SELECT event_id, user_id, ems,
      |  count(*) OVER (PARTITION BY user_id ORDER BY ems
      |    RANGE BETWEEN 299999 PRECEDING AND CURRENT ROW) AS cnt_5m,
      |  count(*) OVER (PARTITION BY user_id ORDER BY ems
      |    RANGE BETWEEN 1799999 PRECEDING AND CURRENT ROW) AS cnt_30m,
      |  count(*) OVER (PARTITION BY user_id ORDER BY ems
      |    RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW) AS cnt_24h
      |FROM surv ORDER BY event_id""".stripMargin

  /** Stats member: the full anchored 24 h stat SQL over the same survivor
    * set — the survivor chain feeds anchoredStatsSqlFrom's `base` CTE. */
  private lazy val anchoredStatsLateSql = EventFeatures.anchoredStatsSqlFrom(
    lateSurvivorCtes(Seq("value")) +
      ", base AS (SELECT event_id, user_id, value, ems FROM surv)")

  /** Session member: per-event session steps over the survivors — a
    * beyond-budget drop can SPLIT a session the full corpus would merge,
    * so the oracle re-sessionizes the survivor set from scratch. */
  private lazy val sessionLateSql = sessionStepsSqlFrom(
    lateSurvivorCtes(Seq("event_type")) +
      ", evsrc AS (SELECT event_id, user_id, event_type, ems FROM surv)")

  /** Append-mode aligned windows: only windows sealed by the final
    * watermark (max event time - 1 h) are in the sink. */
  private val alignedAppendSql =
    """SELECT user_id,
      |  (epoch_ms(ts) // 10800000 - i) * 10800000 AS win_start_ms,
      |  count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |FROM events CROSS JOIN (VALUES (0),(1)) offs(i)
      |GROUP BY user_id, win_start_ms
      |HAVING win_start_ms + 21600000 <= (SELECT MAX(epoch_ms(ts)) FROM events) - 3600000
      |ORDER BY user_id, win_start_ms""".stripMargin

  /** Oracle for the TRUE left-outer stream-stream interval join: the
    * batch left-outer count, restricted to the engine-emittable frontier.
    * Matched purchases emit eagerly (always present); an UNMATCHED
    * purchase's null row emits only once the GLOBAL watermark proves no
    * click with c_ts < p_ts can still arrive. The global watermark is the
    * MIN across the query's watermark nodes — each side's node sees only
    * its own filtered stream, so W = least(max purchase ts, max click ts)
    * − 1 h (measured: frontier rows between max−1h and W stay pending in
    * join state at shutdown). Unmatched purchases with p_ts ≥ W are
    * correctly absent. */
  private val intervalLeftJoinSql =
    """WITH wm AS (
      |  SELECT least(
      |      max(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END),
      |      max(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END))
      |    - 3600000 AS w
      |  FROM events),
      |p AS (SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS ts_ms
      |      FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_ms(ts) AS c_ms
      |      FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.purchase_id, p.user_id, p.ts_ms,
      |        count(c.c_ms) AS clicks_prev_1h
      |      FROM p LEFT JOIN c ON p.user_id = c.user_id
      |        AND c.c_ms >= p.ts_ms - 3600000 AND c.c_ms < p.ts_ms
      |      GROUP BY 1, 2, 3)
      |SELECT purchase_id, user_id, ts_ms, clicks_prev_1h
      |FROM j CROSS JOIN wm
      |WHERE clicks_prev_1h > 0 OR ts_ms < w
      |ORDER BY purchase_id""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_aligned_window" ->
      ((s: SparkSession, d: String) => StreamingPipelines.alignedWindowAgg(s, d)),
    "stream_aligned_append" ->
      ((s: SparkSession, d: String) => StreamingPipelines.alignedWindowAppend(s, d)),
    "stream_interval_join" ->
      ((s: SparkSession, d: String) => StreamingPipelines.intervalJoinStream(s, d)),
    "stream_interval_left_join" ->
      ((s: SparkSession, d: String) => StreamingPipelines.intervalLeftJoinStream(s, d)),
    "stream_session_window" ->
      ((s: SparkSession, d: String) => StreamingPipelines.sessionWindowAgg(s, d)),
    "stream_session_dynamic" ->
      ((s: SparkSession, d: String) => StreamingPipelines.sessionDynamicStream(s, d)),
    "stream_anchored_stateful" ->
      ((s: SparkSession, d: String) => StreamingPipelines.anchoredStateful(s, d)),
    "stream_anchored_tws" ->
      ((s: SparkSession, d: String) => StreamingPipelines.anchoredTws(s, d)),
    "stream_anchored_tws_map" ->
      ((s: SparkSession, d: String) => StreamingPipelines.anchoredTwsMap(s, d)),
    "stream_recent_types" ->
      ((s: SparkSession, d: String) => StreamingPipelines.recentTypes(s, d)),
    "stream_acf" ->
      ((s: SparkSession, d: String) => StreamingPipelines.acfStream(s, d)),
    "stream_mann_kendall" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.mannKendallStream(s, d)),
    "stream_holt" ->
      ((s: SparkSession, d: String) => StreamingPipelines.holtStream(s, d)),
    "stream_holt_winters" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.holtWintersStream(s, d)),
    "stream_changepoint" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.changepointStream(s, d)),
    "stream_cumulative_users_wm" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.cumulativeUsersWmStream(s, d)),
    "stream_burstiness" ->
      ((s: SparkSession, d: String) => StreamingPipelines.burstinessStream(s, d)),
    "stream_anchored_update" ->
      ((s: SparkSession, d: String) => StreamingPipelines.anchoredUpdateStateful(s, d)),
    "stream_anchored_stats_update" ->
      ((s: SparkSession, d: String) => StreamingPipelines.anchoredStatsUpdateStateful(s, d)),
    "stream_session_update" ->
      ((s: SparkSession, d: String) => StreamingPipelines.sessionStepsUpdateStateful(s, d)),
    "stream_anchored_stats" ->
      ((s: SparkSession, d: String) => StreamingPipelines.anchoredStatsStateful(s, d)),
    "stream_session_steps" ->
      ((s: SparkSession, d: String) => StreamingPipelines.sessionStepsStateful(s, d)),
    "stream_anchored_late_update" ->
      ((s: SparkSession, d: String) => StreamingPipelines.anchoredLateUpdate(s, d)),
    "stream_anchored_stats_late_update" ->
      ((s: SparkSession, d: String) => StreamingPipelines.anchoredStatsLateUpdate(s, d)),
    "stream_session_late_update" ->
      ((s: SparkSession, d: String) => StreamingPipelines.sessionStepsLateUpdate(s, d)),
    "stream_markov_transitions" ->
      ((s: SparkSession, d: String) => StreamingPipelines.markovStream(s, d)),
    "stream_ewma" ->
      ((s: SparkSession, d: String) => StreamingPipelines.ewmaStream(s, d)),
    "stream_throttle" ->
      ((s: SparkSession, d: String) => StreamingPipelines.throttleStream(s, d)),
    "stream_token_bucket" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.tokenBucketStream(s, d)),
    "stream_cusum" ->
      ((s: SparkSession, d: String) => StreamingPipelines.cusumStream(s, d)),
    "stream_trend_slope" ->
      ((s: SparkSession, d: String) => StreamingPipelines.trendSlopeStream(s, d)),
    "stream_brown" ->
      ((s: SparkSession, d: String) => StreamingPipelines.brownStream(s, d)),
    "stream_ab_test" ->
      ((s: SparkSession, d: String) => StreamingPipelines.abTestStream(s, d)),
    "stream_seasonality" ->
      ((s: SparkSession, d: String) => StreamingPipelines.seasonalityStream(s, d)),
    "stream_winsorize" ->
      ((s: SparkSession, d: String) => StreamingPipelines.winsorizeStream(s, d)),
    "stream_drift_psi" ->
      ((s: SparkSession, d: String) => StreamingPipelines.psiStream(s, d)),
    "stream_drift_mmd" ->
      ((s: SparkSession, d: String) => StreamingPipelines.mmdStream(s, d)),
    "stream_diff_in_diff" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.diffInDiffStream(s, d)),
    "stream_brier" ->
      ((s: SparkSession, d: String) => StreamingPipelines.brierStream(s, d)),
    "stream_ece" ->
      ((s: SparkSession, d: String) => StreamingPipelines.eceStream(s, d)),
    "stream_feature_scaling" ->
      ((s: SparkSession, d: String) => StreamingPipelines.featureScalingStream(s, d)),
    "stream_scd2_intervals" ->
      ((s: SparkSession, d: String) => StreamingPipelines.scd2Stream(s, d)),
    "stream_dedup_first" ->
      ((s: SparkSession, d: String) => StreamingPipelines.dedupFirstStateful(s, d)),
    "stream_dedup_minhash" ->
      ((s: SparkSession, d: String) => StreamingPipelines.dedupMinhashStream(s, d)),
    "stream_dedup_minhash_update" ->
      ((s: SparkSession, d: String) => StreamingPipelines.dedupMinhashUpdateStream(s, d)),
    "stream_dedup_incremental" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.dedupIncrementalStream(s, d)),
    "stream_decontaminate" ->
      ((s: SparkSession, d: String) => StreamingPipelines.decontaminateStream(s, d)),
    "stream_decontaminate_fuzzy" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.decontaminateFuzzyStream(s, d)),
    "stream_lm_score" ->
      ((s: SparkSession, d: String) => StreamingPipelines.lmScoreStream(s, d)),
    "stream_ccnet_gate" ->
      ((s: SparkSession, d: String) => StreamingPipelines.ccnetGateStream(s, d)),
    "stream_attribution_position" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.positionAttributionStream(s, d)),
    "stream_survival_km" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.survivalKmStream(s, d)),
    "stream_colbert_gate" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.colbertGateStream(s, d)),
    "stream_bootstrap_ci" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.bootstrapCiStream(s, d)),
    "stream_corpus_funnel" ->
      ((s: SparkSession, d: String) => StreamingPipelines.curationFunnelStream(s, d)),
    "stream_kmv_overlap" ->
      ((s: SparkSession, d: String) => StreamingPipelines.kmvStream(s, d)),
    "stream_hll_distinct" ->
      ((s: SparkSession, d: String) => StreamingPipelines.hllDistinctStream(s, d)),
    "stream_bitmap_distinct" ->
      ((s: SparkSession, d: String) => StreamingPipelines.bitmapDistinctStream(s, d)),
    "stream_cumulative_users" ->
      ((s: SparkSession, d: String) => StreamingPipelines.cumulativeUsersStream(s, d)),
    "stream_freshness" ->
      ((s: SparkSession, d: String) => StreamingPipelines.freshnessStream(s, d)),
    "stream_cms_topk" ->
      ((s: SparkSession, d: String) => StreamingPipelines.cmsTopkStream(s, d)),
    "stream_bloom_gate" ->
      ((s: SparkSession, d: String) => StreamingPipelines.bloomGateStream(s, d)),
    "stream_priority_sample" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.prioritySampleStream(s, d)),
    "stream_weighted_sample" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.weightedSampleStream(s, d)),
    "stream_scd_lookup" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.scdLookupStream(s, d)),
    "stream_warm_start" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.warmStartStream(s, d)),
    "stream_dsir_gate" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.dsirGateStream(s, d)),
    "stream_phash_dedup" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.phashDedupStream(s, d)),
    "stream_knn_classify" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.knnClassifyStream(s, d)),
    "stream_budget_gate" ->
      ((s: SparkSession, d: String) =>
        StreamingPipelines.budgetGateStream(s, d)),
    "gen_synthetic_txns" -> (syntheticTxns _))

  /** Oracle for stream_warm_start: the batch query over the FULL history
    * — the stream only replayed the second half; the first half entered
    * through flatMapGroupsWithState initialState, and matching this SQL
    * is the proof the handoff lost nothing. */
  private val warmStartSql =
    """WITH e AS (
      |  SELECT user_id, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS micro
      |  FROM events
      |)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(micro) AS BIGINT) AS sum_micro
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Oracle for stream_bloom_gate: rebuilds the 4096-bit bloom filter from
    * the md5 bit positions IN SQL (32-bit words — DuckDB's checked shift
    * rejects bit 63), probes every event with the same 3 word-lookup +
    * shift-and-mask tests, and rolls up candidates / exact members / false
    * positives per event type — so the filter's BIT MATH is graded, not
    * just the downstream semi-join result. */
  private val bloomGateSql =
    """WITH ev AS (
      |  SELECT event_id, event_type,
      |    user_id || ':' || json_extract_string(props, 'k') AS k
      |  FROM events
      |), dim AS (
      |  SELECT DISTINCT user_id || ':' || json_extract_string(props, 'k') AS k
      |  FROM events WHERE event_type = 'purchase' AND value > 97
      |), bpos AS (
      |  SELECT CAST(('0x' || substr(md5(i || ':' || k), 1, 8)) AS BIGINT)
      |    % 4096 AS pos
      |  FROM dim, (SELECT unnest(range(3)) AS i)
      |), words AS (
      |  SELECT pos // 32 AS wi,
      |    bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
      |  FROM bpos GROUP BY 1
      |), pr AS (
      |  SELECT event_id,
      |    CAST(('0x' || substr(md5(i || ':' || k), 1, 8)) AS BIGINT)
      |      % 4096 AS pos
      |  FROM ev, (SELECT unnest(range(3)) AS i)
      |), hit AS (
      |  SELECT pr.event_id,
      |    SUM(CASE WHEN w.bits IS NOT NULL
      |             AND ((w.bits >> CAST(pr.pos % 32 AS INT)) & 1) = 1
      |        THEN 1 ELSE 0 END) AS nhit
      |  FROM pr LEFT JOIN words w ON w.wi = pr.pos // 32
      |  GROUP BY pr.event_id
      |), cand AS (
      |  SELECT e.event_type, e.k
      |  FROM ev e JOIN hit ON hit.event_id = e.event_id
      |  WHERE hit.nhit = 3
      |)
      |SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_candidates,
      |  CAST(SUM(CASE WHEN k IN (SELECT k FROM dim) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_true,
      |  CAST(COUNT(*) - SUM(CASE WHEN k IN (SELECT k FROM dim)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
      |FROM cand GROUP BY event_type ORDER BY event_type""".stripMargin

  override def oracles: Map[String, String] = Map(
    "stream_aligned_window" -> EventFeatures.alignedSlidingSql,
    "stream_aligned_append" -> alignedAppendSql,
    "stream_interval_join" -> EventAnalytics.intervalJoinSql,
    "stream_interval_left_join" -> intervalLeftJoinSql,
    "stream_session_window" -> sessionStreamSql,
    "stream_session_dynamic" -> FeatureOps.sessionDynamicSqlFor(frontier = true),
    "stream_anchored_stateful" -> EventFeatures.anchoredCountsSql,
    "stream_anchored_tws" -> EventFeatures.anchoredCountsSql,
    "stream_anchored_tws_map" -> EventFeatures.anchoredCountsSql,
    "stream_recent_types" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ems,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS depth,
        |  string_agg(event_type, '|') OVER w AS recent_types
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "stream_acf" -> MetricOps.acfSql,
    "stream_mann_kendall" -> AdvancedOps.mannKendallSql,
    "stream_holt" -> AdvancedOps.holtForecastSql,
    "stream_holt_winters" -> AdvancedOps.holtWintersSql,
    "stream_changepoint" -> FeatureOps.changepointSql,
    "stream_cumulative_users_wm" -> AnalyticsOps.cumulativeUsersSql,
    "stream_burstiness" -> MetricOps.burstinessSql,
    "stream_anchored_update" -> EventFeatures.anchoredCountsSql,
    "stream_anchored_stats_update" -> EventFeatures.anchoredStatsSql,
    "stream_session_update" -> sessionStepsSql,
    "stream_anchored_stats" -> EventFeatures.anchoredStatsSql,
    "stream_session_steps" -> sessionStepsSql,
    "stream_anchored_late_update" -> anchoredLateSql,
    "stream_anchored_stats_late_update" -> anchoredStatsLateSql,
    "stream_session_late_update" -> sessionLateSql,
    "stream_markov_transitions" -> EventAnalytics.markovSql,
    "stream_ewma" -> AnalyticsOps.ewmaSql,
    "stream_throttle" -> AnalyticsOps.throttleSql,
    "stream_token_bucket" -> AnalyticsOps.tokenBucketSql,
    "stream_cusum" -> AnalyticsOps.cusumSql,
    "stream_trend_slope" -> FeatureOps.trendSlopeSql,
    "stream_brown" -> AdvancedOps.brownSql,
    "stream_ab_test" -> AdvancedOps.abTestSql,
    "stream_seasonality" -> FeatureOps.seasonalitySql,
    "stream_winsorize" -> AdvancedOps.winsorizeSql,
    "stream_drift_psi" -> DriftQuality.psiSql,
    "stream_drift_mmd" -> DriftQuality.mmdPolySql,
    "stream_diff_in_diff" -> AnalyticsOps.diffInDiffSql,
    "stream_brier" -> AdvancedOps.brierDecompositionSql,
    "stream_ece" -> AdvancedOps.eceSql,
    "stream_feature_scaling" -> DriftQuality.featureScalingSql,
    "stream_scd2_intervals" -> EventAnalytics.scd2ClosedSql,
    "stream_dedup_first" -> EventAnalytics.dedupFirstSql,
    "stream_dedup_minhash" -> TextAnalysis.dedupMinhashStreamSql,
    "stream_dedup_minhash_update" -> TextAnalysis.dedupMinhashStreamSql,
    "stream_dedup_incremental" -> TextAnalysis.dedupIncrementalBandsSql,
    "stream_decontaminate" -> TextAnalysis.decontaminateSql,
    "stream_decontaminate_fuzzy" -> TextAnalysis.decontaminateFuzzySql,
    "stream_lm_score" -> TextAnalysis.lmScoreSql,
    "stream_ccnet_gate" -> TextAnalysis.ccnetGateSql,
    "stream_attribution_position" -> AnalyticsOps.positionAttributionSql,
    "stream_survival_km" -> AnalyticsOps.survivalKmSql,
    "stream_colbert_gate" -> Embeddings.colbertGateSql,
    "stream_bootstrap_ci" -> AnalyticsOps.bootstrapCiSql,
    "stream_corpus_funnel" -> TextAnalysis.curationFunnelOracleSql,
    "stream_hll_distinct" -> Sketches.hllDistinctSql,
    "stream_kmv_overlap" -> Sketches.kmvStreamSql,
    "stream_bitmap_distinct" -> Sketches.bitmapDistinctSql,
    "stream_cumulative_users" -> AnalyticsOps.cumulativeUsersSql,
    "stream_freshness" -> AnalyticsOps.freshnessSql,
    "stream_cms_topk" -> Sketches.cmsTopkSql,
    "stream_bloom_gate" -> bloomGateSql,
    "stream_priority_sample" -> Sketches.prioritySampleSql,
    "stream_weighted_sample" -> Sketches.weightedSampleSql,
    "stream_scd_lookup" -> EventAnalytics.scdLookupSql,
    "stream_warm_start" -> warmStartSql,
    "stream_dsir_gate" -> CorpusPipeline.dsirSampleSql,
    "stream_phash_dedup" -> MultimodalQueries.mmPhashStreamSql,
    "stream_knn_classify" -> Embeddings.streamKnnClassifySql,
    "stream_budget_gate" -> StreamingPipelines.budgetGateSql,
    "gen_synthetic_txns" -> syntheticTxnsSql)
}
