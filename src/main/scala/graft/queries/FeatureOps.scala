package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import Exact._

/** Second wave of feature-platform operators (ref features/ — the reference
  * derives trend/recency features from its event windows, and its data
  * contracts lean on distribution checks):
  *
  *   - per-key OLS trend slope (the classic "is this user's spend
  *     accelerating" feature): every moment (n, Σx, Σy, Σxy, Σx²)
  *     accumulates EXACTLY — x is minutes-since-2024 as BIGINT, y is lifted
  *     to integer micros via DECIMAL(25,6) — and doubles appear only in the
  *     final single division of two exactly-computed integers, written
  *     identically in both engines;
  *   - hourly gap-fill + last-observation-carried-forward resampling (the
  *     time-series regularization every forecasting pipeline needs before
  *     a model sees the data);
  *   - MAD robust outlier gate (median absolute deviation — the
  *     breakdown-point-0.5 alternative to the IQR gate in DriftQuality);
  *   - Benford first-digit conformance (the classic forensic DQ check on
  *     monetary columns) — all-integer arithmetic, expected frequencies as
  *     shared millionths literals so no engine ever computes a log;
  *   - PMI-style bigram collocations (the phrase-mining step of a corpus
  *     pipeline; lift = c(ab)·N / (c(a)·c(b)) as one exact-integer
  *     division).
  *
  * 100 TB notes: trend/gap-fill shuffle once on the entity key; the grid
  * explode fans out O(span-hours) per key, bounded by the retention window,
  * never by corpus size. MAD/Benford are single-pass aggregations (exact
  * `percentile` here for oracle parity; approx_percentile is the 100 TB
  * path, same note as DriftQuality). Collocation counts shuffle on the
  * bigram key with map-side partial aggregation; the unigram table is
  * vocab-bounded and broadcast.
  */
object FeatureOps extends QueryModule {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).withColumn("ems", epochMs(col("ts")))

  /** Minutes since 2024-01-01T00:00Z (19723 days × 1440). Keeps x² small
    * enough that every moment stays far inside DECIMAL(38,0)/HUGEINT. */
  private val MinuteOrigin = 28401120L

  // ------------------------------------------------------ OLS trend slope
  /** Per-user OLS slope of value against event time (value-units per
    * minute) plus the exact mean. All moments are exact integers: x =
    * minutes since 2024-01-01 (BIGINT), y = value in micros (DECIMAL(25,6)
    * × 1e6 — exact, the corpus carries ≤ 6 true decimals). slope =
    * (n·Σxy − Σx·Σy) / ((n·Σx² − (Σx)²)·1e6): numerator and denominator
    * are computed in exact DECIMAL(38,0)/HUGEINT algebra and meet doubles
    * only in the final single division — bit-identical across engines.
    * Degenerate keys (all events in one minute) yield NULL. Shared by the
    * streaming twin (stream_trend_slope), whose per-key state is 5 longs. */
  private def trendSlope(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d38 = DecimalType(38, 0)
    val base = ev(spark, dir).select(
      $"user_id",
      (expr("ems div 60000") - MinuteOrigin).as("x"),
      ($"value".cast(DecimalType(25, 6)) * 1000000).cast(d38).as("ymic"))
    val m = base.groupBy($"user_id").agg(
      count(lit(1)).as("n"),
      sum($"x".cast(d38)).as("sx"),
      sum($"ymic").as("sy"),
      sum(($"x" * $"ymic").cast(d38)).as("sxy"),
      sum(($"x" * $"x").cast(d38)).as("sxx"))
    trendFinalize(m)
  }

  /** Final projection shared verbatim with the streaming twin: exact
    * integer numerator/denominator, one double division. */
  private[graft] def trendFinalize(m: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    val n = col("n").cast(d38)
    val num = n * col("sxy") - col("sx") * col("sy")
    val den = (n * col("sxx") - col("sx") * col("sx")) * lit(1000000L).cast(d38)
    m.select(col("user_id"), col("n").cast("long").as("n_events"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(num.cast("double") / den.cast("double")).as("slope"),
        (col("sy").cast("double") /
          (n * lit(1000000L).cast(d38)).cast("double")).as("mean_value"))
      .orderBy(col("user_id"))
  }

  /** Shared with stream_trend_slope. */
  private[graft] val trendSlopeSql =
    s"""WITH b AS (
       |  SELECT user_id, epoch_ms(ts) // 60000 - $MinuteOrigin AS x,
       |    CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS HUGEINT) AS ymic
       |  FROM events
       |), m AS (
       |  SELECT user_id, count(*) AS n,
       |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(ymic) AS HUGEINT) AS sy,
       |    CAST(SUM(x * ymic) AS HUGEINT) AS sxy,
       |    CAST(SUM(x * x) AS HUGEINT) AS sxx
       |  FROM b GROUP BY 1)
       |SELECT user_id, CAST(n AS BIGINT) AS n_events,
       |  CASE WHEN (n * sxx - sx * sx) * 1000000 = 0 THEN NULL
       |       ELSE CAST(n * sxy - sx * sy AS DOUBLE)
       |          / CAST((n * sxx - sx * sx) * 1000000 AS DOUBLE) END AS slope,
       |  CAST(sy AS DOUBLE) / CAST(n * 1000000 AS DOUBLE) AS mean_value
       |FROM m ORDER BY user_id""".stripMargin

  // ------------------------------------------- hourly gap-fill + LOCF
  /** Per-user hourly resampling with last-observation-carried-forward: the
    * hourly grid spans each user's [first, last] event hour; hours without
    * events inherit the latest prior hour's value (per-hour winner =
    * latest (ems, event_id) — the same argmax both engines express). The
    * grid explode fans out O(span-hours) per key — bounded by the
    * retention window, never the corpus — and the fill is one window pass
    * per key. */
  private def gapfillLocf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir).select($"user_id",
      expr("ems div 3600000").as("h"), $"ems", $"event_id", $"value")
    // latest value within each (user, hour): struct max = (ems, event_id)
    // lexicographic argmax, identical to the oracle's row_number ordering
    val hv = e.groupBy($"user_id", $"h")
      .agg(max(struct($"ems", $"event_id", $"value"))
        .getField("value").as("own"))
    val grid = e.groupBy($"user_id").agg(min($"h").as("mn"), max($"h").as("mx"))
      .select($"user_id", explode(sequence($"mn", $"mx")).as("h"))
    val w = Window.partitionBy($"user_id").orderBy($"h")
    grid.join(hv, Seq("user_id", "h"), "left")
      .withColumn("filled", last($"own", ignoreNulls = true).over(w))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_hours"),
        sum(when($"own".isNull, 1L).otherwise(0L)).as("n_gap_hours"),
        dsum($"filled").as("sum_filled"),
        max(struct($"h", $"filled")).getField("filled").as("last_filled"))
      .orderBy($"user_id")
  }

  private val gapfillLocfSql =
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) // 3600000 AS h, epoch_ms(ts) AS ems,
      |    event_id, value
      |  FROM events
      |), hv AS (
      |  SELECT user_id, h, value AS own FROM (
      |    SELECT user_id, h, value, row_number() OVER (
      |      PARTITION BY user_id, h ORDER BY ems DESC, event_id DESC) AS rn
      |    FROM e) WHERE rn = 1
      |), grid AS (
      |  SELECT user_id, unnest(generate_series(mn, mx)) AS h
      |  FROM (SELECT user_id, min(h) AS mn, max(h) AS mx FROM e GROUP BY 1)
      |), f AS (
      |  SELECT g.user_id, g.h, hv.own,
      |    last_value(hv.own IGNORE NULLS) OVER (
      |      PARTITION BY g.user_id ORDER BY g.h) AS filled
      |  FROM grid g LEFT JOIN hv ON hv.user_id = g.user_id AND hv.h = g.h)
      |SELECT user_id, count(*) AS n_hours,
      |  CAST(SUM(CASE WHEN own IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_gap_hours,
      |  CAST(SUM(CAST(filled AS DECIMAL(25,6))) AS DOUBLE) AS sum_filled,
      |  arg_max(filled, h) AS last_filled
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin

  // --------------------------------------------------- MAD robust outliers
  /** Median-absolute-deviation outlier gate per event_type: med =
    * median(value), MAD = median(|value − med|), outlier ⇔ |value − med| >
    * 3·MAD. The robust (breakdown 0.5) twin of quality_iqr_outliers —
    * exact `percentile` with the suite's round-6 parity discipline
    * (ROUND(...,6) both engines); the medians table is |event_type| rows,
    * broadcast back. */
  private def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val med = e.groupBy($"event_type")
      .agg(expr("round(percentile(value, 0.5), 6)").as("med"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs($"value" - $"med"))
    val mad = dev.groupBy($"event_type")
      .agg(expr("round(percentile(dev, 0.5), 6)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), first($"med").as("med"),
        first($"mad").as("mad"),
        sum(when($"dev" > lit(3.0) * $"mad", 1L).otherwise(0L))
          .as("n_outliers"),
        max($"dev").as("max_dev"))
      .orderBy($"event_type")
  }

  private val madOutliersSql =
    """WITH med AS (
      |  SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
      |  FROM events GROUP BY 1
      |), d AS (
      |  SELECT e.event_type, abs(e.value - med.med) AS dev, med.med
      |  FROM events e JOIN med ON e.event_type = med.event_type
      |), mad AS (
      |  SELECT event_type, ROUND(quantile_cont(dev, 0.5), 6) AS mad
      |  FROM d GROUP BY 1)
      |SELECT d.event_type, count(*) AS n, any_value(d.med) AS med,
      |  any_value(mad.mad) AS mad,
      |  CAST(SUM(CASE WHEN d.dev > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers,
      |  max(d.dev) AS max_dev
      |FROM d JOIN mad ON d.event_type = mad.event_type
      |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin

  // -------------------------------------------------- Benford conformance
  /** Benford's-law first-digit check on l_extendedprice (the forensic DQ
    * gate on monetary columns). The digit comes from the CENTS integer's
    * decimal string — never from log10 (libm-dependent) or from a double's
    * string form (engine-dependent). Expected frequencies are shared
    * millionths literals log10(1+1/d); observed millionths use the same
    * integer division in both engines. */
  private def benford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val expected = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L)
    val expLit = array(expected.map(lit): _*)
    Tables.lineitem(spark, dir)
      .select(substring(floor($"l_extendedprice" * 100.0 + 0.5)
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum($"cnt").over(Window.partitionBy()))
      .select($"digit", $"cnt",
        expr("cnt * 1000000 div total").as("obs_millionths"),
        element_at(expLit, $"digit".cast("int")).as("exp_millionths"))
      .withColumn("abs_dev_millionths",
        abs($"obs_millionths" - $"exp_millionths"))
      .orderBy($"digit")
  }

  private val benfordSql =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(FLOOR(l_extendedprice * 100.0 + 0.5)
      |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM lineitem
      |), c AS (
      |  SELECT digit, count(*) AS cnt FROM d GROUP BY 1
      |), e AS (
      |  SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
      |    (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
      |    (9, 45757)) AS t(digit, exp_millionths))
      |SELECT c.digit, c.cnt,
      |  CAST(c.cnt * 1000000 // (SELECT SUM(cnt) FROM c) AS BIGINT)
      |    AS obs_millionths,
      |  CAST(e.exp_millionths AS BIGINT) AS exp_millionths,
      |  CAST(abs(c.cnt * 1000000 // (SELECT SUM(cnt) FROM c)
      |      - e.exp_millionths) AS BIGINT) AS abs_dev_millionths
      |FROM c JOIN e ON c.digit = e.digit ORDER BY c.digit""".stripMargin

  // ------------------------------------------------- PMI-ish collocations
  /** Bigram collocation mining over the documents corpus: adjacent token
    * pairs ranked by lift = c(ab)·N / (c(a)·c(b)) (the exp-of-PMI — the
    * same ranking, no log). Counts are exact BIGINTs; lift is one double
    * division of two exactly-computed integers. Bigram counts shuffle on
    * the pair key with map-side combine; min-support 3, top 50 with a
    * full tie-break. */
  private def collocations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", split(trim($"text"), "\\s+").as("ts"))
    val uni = toks.select(explode($"ts").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cw"))
    val n = toks.select(size($"ts").cast("long").as("k"))
      .agg(sum($"k").as("n_tokens"))
    val bg = toks.select(explode(arrays_zip(
        slice($"ts", lit(1), size($"ts") - 1),
        slice($"ts", lit(2), size($"ts") - 1))).as("p"))
      .select(col("p").getField("0").as("a"), col("p").getField("1").as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("cab"))
      .filter($"cab" >= 3)
    bg.join(broadcast(uni.withColumnRenamed("w", "a")
        .withColumnRenamed("cw", "ca")), Seq("a"))
      .join(broadcast(uni.withColumnRenamed("w", "b")
        .withColumnRenamed("cw", "cb")), Seq("b"))
      .crossJoin(broadcast(n))
      .select($"a", $"b", $"cab", $"ca", $"cb",
        (($"cab" * $"n_tokens").cast("double") /
          ($"ca" * $"cb").cast("double")).as("lift"))
      .orderBy($"lift".desc, $"a", $"b")
      .limit(50)
  }

  private val collocationsSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents
      |), uni AS (
      |  SELECT unnest(ts) AS w FROM t
      |), uc AS (
      |  SELECT w, count(*) AS cw FROM uni GROUP BY 1
      |), n AS (
      |  SELECT count(*) AS n_tokens FROM uni
      |), bg AS (
      |  SELECT ts[i] AS a, ts[i + 1] AS b, count(*) AS cab
      |  FROM t, unnest(generate_series(1, len(ts) - 1)) AS g(i)
      |  GROUP BY 1, 2 HAVING count(*) >= 3)
      |SELECT b.a, b.b, b.cab, ca.cw AS ca, cb.cw AS cb,
      |  CAST(b.cab * n.n_tokens AS DOUBLE)
      |    / CAST(ca.cw * cb.cw AS DOUBLE) AS lift
      |FROM bg b
      |JOIN uc ca ON ca.w = b.a
      |JOIN uc cb ON cb.w = b.b
      |CROSS JOIN n
      |ORDER BY lift DESC, b.a, b.b
      |LIMIT 50""".stripMargin

  // ------------------------------------------------------- RFM scores
  /** RFM customer segmentation (the marketing-feature classic): per user
    * recency (days since last event vs the corpus max), frequency, exact
    * monetary sum; each metric scored 1-5 by global quintile through the
    * two-phase RankedWindow reconstruction (no single-partition ntile
    * sort — the per-user table is entity-bounded but the discipline
    * holds at any cardinality). Scores follow the 5-is-best convention;
    * segment labels are the standard champion / loyal / at-risk / lost
    * cut. Oracle: plain ntile(5) windows — RankedWindow's bit-identity
    * claim is re-proven on every row. */
  private def rfmScores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val gmax = e.agg(max(expr("ems div 86400000")).as("gday"))
    val base = e.groupBy($"user_id")
      .agg(max(expr("ems div 86400000")).as("last_day"),
        count(lit(1)).as("frequency"), dsum($"value").as("monetary"))
      .crossJoin(broadcast(gmax))
      .select($"user_id", ($"gday" - $"last_day").as("recency_days"),
        $"frequency", $"monetary")
    def score(df: DataFrame, metric: String, out: String) =
      graft.operators.RankedWindow
        .rankDesc(df, col(metric), col("user_id"), tiles = 5,
          sealOutput = false)
        .withColumn(out, col("quartile").cast("long"))
        .drop("rnk", "dense_rnk", "pct_rank", "quartile")
    // DESC quintiles: tile 1 = largest metric. recency: largest = stalest
    // -> r_score = tile inverted twice = tile; freq/monetary: largest =
    // best -> 6 - tile
    val scored = score(score(score(base,
        "recency_days", "r_tile"), "frequency", "f_tile"),
        "monetary", "m_tile")
      .select($"user_id", $"recency_days", $"frequency", $"monetary",
        $"r_tile".as("r_score"),
        (lit(6L) - $"f_tile").as("f_score"),
        (lit(6L) - $"m_tile").as("m_score"))
    scored.withColumn("segment",
        when($"r_score" >= 4 && $"f_score" >= 4 && $"m_score" >= 4,
          "champion")
          .when($"r_score" >= 3 && $"f_score" >= 3, "loyal")
          .when($"r_score" <= 2 && $"f_score" >= 3, "at_risk")
          .when($"r_score" <= 2 && $"f_score" <= 2, "lost")
          .otherwise("other"))
      .orderBy($"user_id")
  }

  private val rfmScoresSql =
    """WITH g AS (
      |  SELECT MAX(epoch_ms(ts) // 86400000) AS gday FROM events
      |), base AS (
      |  SELECT user_id,
      |    g.gday - MAX(epoch_ms(ts) // 86400000) AS recency_days,
      |    count(*) AS frequency,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS monetary
      |  FROM events CROSS JOIN g GROUP BY user_id, g.gday
      |), t AS (
      |  SELECT user_id, recency_days, frequency, monetary,
      |    CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS BIGINT)
      |      AS r_tile,
      |    CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT)
      |      AS f_tile,
      |    CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS BIGINT)
      |      AS m_tile
      |  FROM base
      |), s AS (
      |  SELECT user_id, recency_days, frequency, monetary,
      |    r_tile AS r_score, 6 - f_tile AS f_score, 6 - m_tile AS m_score
      |  FROM t)
      |SELECT user_id, recency_days, frequency, monetary,
      |  r_score, f_score, m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
      |         THEN 'champion'
      |       WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
      |       WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
      |       WHEN r_score <= 2 AND f_score <= 2 THEN 'lost'
      |       ELSE 'other' END AS segment
      |FROM s ORDER BY user_id""".stripMargin

  // ----------------------------------------------------- churn labels
  /** Churn label engineering: cutoff = corpus max − 7 days; per user with
    * pre-cutoff activity, the pre-cutoff features (count, exact sum,
    * days-before-cutoff of the last event) and the label = no events
    * after the cutoff — the leakage-safe label/feature time split
    * (features strictly before the cutoff, label strictly after). */
  private def churnLabels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val cut = e.agg((max($"ems") - lit(7L * 86400000L)).as("cutoff"))
    val ec = e.crossJoin(broadcast(cut))
    val before = ec.filter($"ems" < $"cutoff")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_before"), dsum($"value").as("sum_before"),
        expr("(any_value(cutoff) - max(ems)) div 86400000")
          .as("gap_days"))
    val after = ec.filter($"ems" >= $"cutoff")
      .select($"user_id").distinct().withColumn("active", lit(1L))
    before.join(after, Seq("user_id"), "left")
      .select($"user_id", $"n_before", $"sum_before", $"gap_days",
        coalesce($"active", lit(0L)).as("retained"),
        (coalesce($"active", lit(0L)) === 0L).as("churned"))
      .orderBy($"user_id")
  }

  private val churnLabelsSql =
    """WITH c AS (
      |  SELECT MAX(epoch_ms(ts)) - 7 * 86400000 AS cutoff FROM events
      |), b AS (
      |  SELECT user_id, count(*) AS n_before,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_before,
      |    (any_value(c.cutoff) - max(epoch_ms(ts))) // 86400000 AS gap_days
      |  FROM events CROSS JOIN c
      |  WHERE epoch_ms(ts) < c.cutoff GROUP BY user_id
      |), a AS (
      |  SELECT DISTINCT user_id FROM events CROSS JOIN c
      |  WHERE epoch_ms(ts) >= c.cutoff)
      |SELECT b.user_id, b.n_before, b.sum_before, b.gap_days,
      |  CAST(CASE WHEN a.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
      |    AS retained,
      |  a.user_id IS NULL AS churned
      |FROM b LEFT JOIN a ON b.user_id = a.user_id
      |ORDER BY b.user_id""".stripMargin

  // ----------------------------------------------- seasonality residuals
  /** Hour-of-day seasonal baseline + residual anomalies: per (event_type,
    * hour-of-day) the exact mean (decimal sum / count, one double
    * division) and the count of events deviating > 40 from their cell's
    * baseline — the additive seasonal-naive decomposition a monitoring
    * pipeline runs before alerting on raw values. Two passes over one
    * (type, hod) shuffle; the 120-row baseline broadcasts back. */
  /** The 120-row (type, hour-of-day) baseline — shared with the
    * streaming twin (stream_seasonality), which broadcasts it into the
    * replay stream. */
  private[graft] def seasonalityBase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir)
      .withColumn("hod", expr("(ems div 3600000) % 24"))
      .groupBy($"event_type", $"hod")
      .agg(davg($"value").as("mean_value"))
  }

  private def seasonality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
      .withColumn("hod", expr("(ems div 3600000) % 24"))
    val base = seasonalityBase(spark, dir)
    e.join(broadcast(base), Seq("event_type", "hod"))
      .groupBy($"event_type", $"hod")
      .agg(count(lit(1)).as("n"), first($"mean_value").as("mean_value"),
        sum(when(abs($"value" - $"mean_value") > 40.0, 1L).otherwise(0L))
          .as("n_anomalies"))
      .orderBy($"event_type", $"hod")
  }

  /** Shared with stream_seasonality. */
  private[graft] val seasonalitySql =
    """WITH base AS (
      |  SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS hod,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / count(value)
      |      AS mean_value
      |  FROM events GROUP BY 1, 2)
      |SELECT e.event_type, (epoch_ms(e.ts) // 3600000) % 24 AS hod,
      |  count(*) AS n, any_value(b.mean_value) AS mean_value,
      |  CAST(SUM(CASE WHEN abs(e.value - b.mean_value) > 40.0
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      |FROM events e
      |JOIN base b ON e.event_type = b.event_type
      |  AND (epoch_ms(e.ts) // 3600000) % 24 = b.hod
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------- edit-distance linkage
  /** Record linkage by exact Levenshtein distance — at the VOCABULARY
    * level, the shape that survives scale: row-pair linkage over a
    * low-entropy name column is O(rows²) of redundant DP (the first cut
    * of this query spent 45 s re-scoring millions of identical pairs at
    * sf0.1); canonicalizing the DISTINCT names first makes the pair join
    * name-space-bounded at ANY row count, and the row multiplicities
    * ride along as counts. Candidates blocked on the shared noun (second
    * word — the standard blocking key), linked at distance ≤ 4 ("cold
    * anvil" ↔ "old anvil"), nearest 50 variant pairs. Both engines run
    * the classic unit-cost DP — an integer metric, exact by
    * construction. */
  private def editDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = Tables.part(spark, dir)
      .groupBy($"p_name".as("nm")).agg(count(lit(1)).as("c"))
      .withColumn("noun", split($"nm", " ").getItem(1))
    n.as("a").join(n.as("b"),
        col("a.noun") === col("b.noun") && col("a.nm") < col("b.nm"))
      .select(col("a.nm").as("name_a"), col("b.nm").as("name_b"),
        levenshtein(col("a.nm"), col("b.nm")).cast("long").as("dist"),
        col("a.c").as("n_rows_a"), col("b.c").as("n_rows_b"))
      .filter($"dist" <= 4)
      .orderBy($"dist", $"name_a", $"name_b")
      .limit(50)
  }

  private val editDistanceSql =
    """WITH n AS (
      |  SELECT p_name AS nm, count(*) AS c,
      |    string_split(p_name, ' ')[2] AS noun
      |  FROM part GROUP BY 1, 3)
      |SELECT a.nm AS name_a, b.nm AS name_b,
      |  CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist,
      |  a.c AS n_rows_a, b.c AS n_rows_b
      |FROM n a JOIN n b ON a.noun = b.noun AND a.nm < b.nm
      |WHERE levenshtein(a.nm, b.nm) <= 4
      |ORDER BY dist, name_a, name_b
      |LIMIT 50""".stripMargin

  // ------------------------------------------- source overlap matrix
  /** Cross-source contamination matrix: for every source pair, the count
    * of shared distinct 8-token grams — the corpus-level generalization
    * of train/eval decontamination (which 8-gram does my "independent"
    * sources actually share?). Distinct (source, gram) rows shuffle on
    * the gram; per-gram fan-out is bounded by the SOURCE COUNT, never by
    * corpus size — the same reason the pair join can't blow up at
    * 100 TB. */
  private def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.documents(spark, dir)
      .withColumn("toks", split(trim($"text"), "\\s+"))
      .select($"source", explode(expr(
        """transform(sequence(1, size(toks) - 7),
          |  i -> concat_ws(' ', slice(toks, i, 8)))""".stripMargin))
        .as("gram"))
      .distinct()
    g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .orderBy($"source_a", $"source_b")
  }

  private val sourceOverlapSql =
    """WITH t AS (
      |  SELECT source, string_split_regex(trim(text), '\s+') AS ts
      |  FROM documents
      |), g AS (
      |  SELECT DISTINCT source, array_to_string(ts[i:i+7], ' ') AS gram
      |  FROM t, unnest(generate_series(1, len(ts) - 7)) AS s(i))
      |SELECT a.source AS source_a, b.source AS source_b,
      |  count(*) AS shared_grams
      |FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------- capped sessions
  /** Gap-sessionization with a MAX-DURATION cap (the Flink/Beam
    * bounded-session variant Spark's session_window lacks): 30-min gap
    * starts a session, and a session additionally SPLITS at every 2 h
    * boundary from its own start — runaway sessions can't grow unbounded
    * state. Sub-session id is a closed-form function of (ems − session
    * start), so the split costs nothing beyond the base sessionize. */
  private def sessionCapped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ems", $"event_id")
    val cum = Window.partitionBy($"user_id").orderBy($"ems", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(spark, dir)
      .withColumn("prev", lag($"ems", 1).over(w))
      .withColumn("is_new",
        when($"prev".isNull || $"ems" - $"prev" > 1800000L, 1L).otherwise(0L))
      .withColumn("sess", sum($"is_new").over(cum))
      .withColumn("sess_start",
        min($"ems").over(Window.partitionBy($"user_id", $"sess")))
      .withColumn("sub", expr("(ems - sess_start) div 7200000"))
      .groupBy($"user_id", $"sess", $"sub")
      .agg(count(lit(1)).as("n_events"), min($"ems").as("start_ems"),
        max($"ems").as("end_ems"), dsum($"value").as("sum_value"))
      .orderBy($"user_id", $"sess", $"sub")
  }

  private val sessionCappedSql =
    """WITH seq AS (
      |  SELECT user_id, event_id, value, epoch_ms(ts) AS ems,
      |    CASE WHEN lag(epoch_ms(ts)) OVER uw IS NULL
      |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER uw > 1800000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW uw AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
      |), sess AS (
      |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
      |    ORDER BY ems, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS sess
      |  FROM seq
      |), sub AS (
      |  SELECT *, (ems - MIN(ems) OVER (PARTITION BY user_id, sess))
      |    // 7200000 AS sub
      |  FROM sess)
      |SELECT user_id, sess, sub, count(*) AS n_events,
      |  min(ems) AS start_ems, max(ems) AS end_ems,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |FROM sub GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ------------------------------------------- dynamic-gap sessions
  /** Sessionization with a PER-EVENT gap — Spark's native
    * `session_window(ts, gapExpr)` dynamic-gap form (a click keeps the
    * session alive 30 min, anything else 10 min; the per-event-type
    * engagement timeout every product-analytics stack wants and
    * fixed-gap sessionization can't express). Each event contributes
    * [ts, ts + gap); TOUCHING-or-overlapping windows merge transitively
    * (ts == prev end merges — pinned by OperatorSpec's boundary test,
    * which caught the strict form this oracle first shipped with);
    * session end = max member end. The native operator sessionizes inside one
    * shuffle on user_id (no per-user window chain); the oracle rebuilds
    * the merge with a strict-prefix running max of member ends.
    * MICROSECOND domain throughout: the source carries sub-ms
    * timestamps, and the merge decision happens at full precision, so
    * an epoch-ms oracle would round boundary decisions differently. */
  /** Per-event session gap (30 min for clicks, 10 min otherwise), shared
    * with the streaming twin. session_window's dynamic gap must be
    * CalendarIntervalType — make_interval, not an ANSI interval literal
    * (DayTimeIntervalType). */
  private[graft] def dynamicGapCol: org.apache.spark.sql.Column =
    when(col("event_type") === "click",
      expr("make_interval(0, 0, 0, 0, 0, 30, 0)"))
      .otherwise(expr("make_interval(0, 0, 0, 0, 0, 10, 0)"))

  private def sessionDynamic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(session_window($"ts", dynamicGapCol), $"user_id")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .select($"user_id",
        unix_micros($"session_window.start".cast("timestamp")).as("start_us"),
        unix_micros($"session_window.end".cast("timestamp")).as("end_us"),
        $"n_events", $"sum_value")
      .orderBy($"user_id", $"start_us")
  }

  /** Oracle for the dynamic-gap sessions; with `frontier` the result is
    * restricted to sessions the streaming twin's watermark has SEALED
    * (session end ≤ global max event time − 1 h — same frontier rule as
    * the fixed-gap stream_session_window oracle, in the µs domain). */
  private[graft] def sessionDynamicSqlFor(frontier: Boolean): String = {
    val seal = if (frontier)
      "\nHAVING max(eus) <= (SELECT max(epoch_us(ts)) FROM events) - 3600000000"
    else ""
    sessionDynamicSqlBase.replace("__HAVING__", seal)
  }

  private val sessionDynamicSqlBase =
    """WITH seq AS (
      |  SELECT user_id, event_id, value, epoch_us(ts) AS tus,
      |    epoch_us(ts) + CASE WHEN event_type = 'click'
      |      THEN 1800000000 ELSE 600000000 END AS eus
      |  FROM events
      |), flagged AS (
      |  SELECT *, CASE WHEN max(eus) OVER pw IS NULL
      |      OR tus > max(eus) OVER pw THEN 1 ELSE 0 END AS is_new
      |  FROM seq
      |  WINDOW pw AS (PARTITION BY user_id ORDER BY tus, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |), sess AS (
      |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
      |    ORDER BY tus, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS sess
      |  FROM flagged)
      |SELECT user_id, min(tus) AS start_us, max(eus) AS end_us,
      |  count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, sess__HAVING__
      |ORDER BY user_id, start_us""".stripMargin

  private val sessionDynamicSql = sessionDynamicSqlFor(frontier = false)

  // -------------------------------------------------- peak detection
  /** Local-maxima peak detection on each user's value series (the
    * rate-spike / engagement-burst primitive): a peak is strictly
    * greater than BOTH neighbors in (ems, event_id) order. Per-user
    * summary: series length, peak count, and the peak with the largest
    * value (ties: earliest). Exact double comparisons, integer counts;
    * one partitioned-window pass. */
  private def peaks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ems", $"event_id")
    val p = ev(spark, dir)
      .withColumn("pv", lag($"value", 1).over(w))
      .withColumn("nv", lead($"value", 1).over(w))
      .withColumn("is_peak",
        when($"pv".isNotNull && $"nv".isNotNull &&
          $"value" > $"pv" && $"value" > $"nv", 1L).otherwise(0L))
    p.groupBy($"user_id")
      .agg(count(lit(1)).as("n_points"),
        sum($"is_peak").as("n_peaks"),
        max(when($"is_peak" === 1L,
          struct($"value", (-$"ems").as("nems")))).getField("value")
          .as("top_peak_value"))
      .orderBy($"user_id")
  }

  private val peaksSql =
    """WITH seq AS (
      |  SELECT user_id, event_id, value, epoch_ms(ts) AS ems,
      |    lag(value) OVER uw AS pv, lead(value) OVER uw AS nv
      |  FROM events
      |  WINDOW uw AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
      |), flagged AS (
      |  SELECT *, CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
      |      AND value > pv AND value > nv THEN 1 ELSE 0 END AS is_peak
      |  FROM seq)
      |SELECT user_id, count(*) AS n_points,
      |  CAST(SUM(is_peak) AS BIGINT) AS n_peaks,
      |  max(CASE WHEN is_peak = 1 THEN struct_pack(value := value,
      |    nems := -ems) END).value AS top_peak_value
      |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------- changepoint (binseg)
  /** Single-changepoint detection per event type (the first round of
    * binary segmentation / CUSUM-style level-shift localization): over
    * the gap-filled GLOBAL hourly count series, pick the split s that
    * maximizes the between-segment SSE reduction
    *
    *   gain(s) ∝ (S₁n₂ − S₂n₁)² / (n₁n₂)        (n constant per type)
    *
    * The argmax must be EXACT cross-engine, so the score is quantized to
    * the integer  (S₁n₂ − S₂n₁)²·10⁶ div (n₁n₂)  — integer division is
    * identical in both engines (DuckDB `//` == Spark `div`), and the
    * (score_q DESC, s ASC) row_number tie-break is total. The level-shift
    * magnitude mean₂ − mean₁ = (S₂n₁ − S₁n₂)/(n₁n₂) is the one double
    * division. Numerator bounds: |S·n| ≤ events·8760 ⇒ squared ≈ 10³⁶
    * — DECIMAL(38,0) territory, never BIGINT.
    *
    * Scale: events reduce to the bounded hourly table first (one
    * shuffle); prefix sums + argmax are per-type windows over
    * calendar-hours rows. */
  private def changepoint(spark: SparkSession, dir: String): DataFrame =
    changepointTail(Tables.events(spark, dir)
      .withColumn("ems", epochMs(col("ts")))
      .withColumn("h", expr("ems div 3600000"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")))

  /** The changepoint finale over a per-(type, hour) count table — shared
    * by the batch query and the streaming monitor (complete-mode state IS
    * that table), same oracle. */
  private[graft] def changepointTail(pm: DataFrame): DataFrame = {
    val spark = pm.sparkSession
    import spark.implicits._
    val b = pm.agg(min($"h").as("mn"), max($"h").as("mx"))
    val grid = b.select(explode(sequence($"mn", $"mx")).as("h"))
    val x = pm.select($"event_type".as("event_type")).distinct()
      .crossJoin(broadcast(grid))
      .join(pm, Seq("event_type", "h"), "left")
      .select($"event_type", $"h", coalesce($"c", lit(0L)).as("x"))
    val w = Window.partitionBy($"event_type").orderBy($"h")
    val pre = x
      .withColumn("s", row_number().over(w).cast("long"))
      .withColumn("s1", sum($"x").over(w))
    val tot = x.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("stot"))
    val scored = pre.join(tot, Seq("event_type"))
      .filter($"s" < $"n")
      .withColumn("n2", $"n" - $"s")
      .withColumn("s2", $"stot" - $"s1")
      // operands cast to DECIMAL(38,0) BEFORE the products so the ANSI
      // overflow bound is the decimal's 10³⁸, not the intermediate
      // 64-bit long (r8 advice: events·hours near 9.2e18 would throw)
      .withColumn("d",
        $"s1".cast(DecimalType(38, 0)) * $"n2" -
          $"s2".cast(DecimalType(38, 0)) * $"s")
      // IntegralDivide (div) on decimals returns BIGINT in Spark; the
      // quantized score is ≤ ~(events·hours)²·10⁶/(hours²/4) ≈ 5·10¹⁶ at
      // bench scale — document the bound, emit BIGINT both engines
      .withColumn("score_q", expr("(d * d * 1000000) div (s * n2)"))
    scored
      .withColumn("rnk", row_number().over(Window
        .partitionBy($"event_type").orderBy($"score_q".desc, $"s")))
      .filter($"rnk" === 1)
      .select($"event_type", $"h".as("split_after_hour"),
        $"s".as("n_left"), $"n2".as("n_right"),
        $"s1".cast("long").as("sum_left"), $"s2".cast("long").as("sum_right"),
        $"score_q".cast("long").as("score_q"),
        (($"s2".cast(DecimalType(38, 0)) * $"s" -
            $"s1".cast(DecimalType(38, 0)) * $"n2").cast("double") /
          ($"s" * $"n2").cast("double")).as("level_shift"))
      .orderBy($"event_type")
  }

  private[graft] val changepointSql =
    """WITH pm AS (
      |  SELECT event_type, epoch_ms(ts) // 3600000 AS h,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2
      |), b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM pm),
      |grid AS (SELECT unnest(generate_series(mn, mx)) AS h FROM b),
      |ty AS (SELECT DISTINCT event_type FROM pm),
      |x AS (
      |  SELECT ty.event_type, grid.h, COALESCE(pm.c, 0) AS x
      |  FROM ty CROSS JOIN grid
      |  LEFT JOIN pm ON pm.event_type = ty.event_type AND pm.h = grid.h
      |), pre AS (
      |  SELECT event_type, h,
      |    CAST(row_number() OVER tw AS BIGINT) AS s,
      |    CAST(SUM(x) OVER tw AS BIGINT) AS s1
      |  FROM x WINDOW tw AS (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), tot AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS stot
      |  FROM x GROUP BY event_type
      |), scored AS (
      |  SELECT pre.event_type, h, s, s1, n - s AS n2, stot - s1 AS s2,
      |    (CAST(s1 AS HUGEINT) * (n - s) - CAST(stot - s1 AS HUGEINT) * s)
      |       * (CAST(s1 AS HUGEINT) * (n - s) - CAST(stot - s1 AS HUGEINT) * s)
      |       * 1000000
      |      // CAST(s * (n - s) AS HUGEINT) AS score_q
      |  FROM pre JOIN tot USING (event_type) WHERE s < n
      |), best AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY score_q DESC, s) AS rnk
      |  FROM scored
      |)
      |SELECT event_type, h AS split_after_hour, s AS n_left, n2 AS n_right,
      |  s1 AS sum_left, CAST(s2 AS BIGINT) AS sum_right,
      |  CAST(score_q AS BIGINT) AS score_q,
      |  CAST(CAST(s2 AS HUGEINT) * s - CAST(s1 AS HUGEINT) * n2 AS DOUBLE)
      |    / CAST(s * n2 AS DOUBLE) AS level_shift
      |FROM best WHERE rnk = 1 ORDER BY event_type""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_changepoint" -> (changepoint _),
    "text_source_overlap" -> (sourceOverlap _),
    "evt_session_dynamic" -> (sessionDynamic _),
    "evt_peaks" -> (peaks _),
    "evt_session_capped" -> (sessionCapped _),
    "evt_rfm_scores" -> (rfmScores _),
    "ml_churn_labels" -> (churnLabels _),
    "evt_seasonality" -> (seasonality _),
    "er_edit_distance" -> (editDistance _),
    "evt_trend_slope" -> (trendSlope _),
    "evt_gapfill_locf" -> (gapfillLocf _),
    "quality_mad_outliers" -> (madOutliers _),
    "dq_benford" -> (benford _),
    "text_collocations" -> (collocations _))

  override def oracles: Map[String, String] = Map(
    "evt_changepoint" -> changepointSql,
    "text_source_overlap" -> sourceOverlapSql,
    "evt_session_dynamic" -> sessionDynamicSql,
    "evt_peaks" -> peaksSql,
    "evt_session_capped" -> sessionCappedSql,
    "evt_rfm_scores" -> rfmScoresSql,
    "ml_churn_labels" -> churnLabelsSql,
    "evt_seasonality" -> seasonalitySql,
    "er_edit_distance" -> editDistanceSql,
    "evt_trend_slope" -> trendSlopeSql,
    "evt_gapfill_locf" -> gapfillLocfSql,
    "quality_mad_outliers" -> madOutliersSql,
    "dq_benford" -> benfordSql,
    "text_collocations" -> collocationsSql)
}
