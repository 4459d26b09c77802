package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import Exact._

/** Drift detection and data-quality operators (SURVEY.md §2.8 M2/M3/M4/
  * M9/M10/M11): KS two-sample statistic, PSI with quantile buckets,
  * chi-square categorical drift, exact quantile summaries, IQR outlier
  * accounting, and a deterministic (hash-based) stratified split.
  *
  * Reference window = events before 2024-01-16 UTC; current window = the
  * rest (the reference's drift_check.py compares a reference dataset
  * against current data the same way, drift_check.py:80-99, 138-169).
  *
  * Scale notes: the KS ECDF is a prefix-sum over a global sort — at
  * 100 TB this is a distributed sort (range partitioning) plus per-
  * partition offsets; here it is a window over the value order. PSI/chi2
  * reduce to two grouped counts joined on bucket id — partial-aggregated,
  * shuffle of |buckets| rows only. Quantiles: exact `percentile` here for
  * oracle parity; `approx_percentile` (KLL/GK sketch) is the 100 TB path.
  */
object DriftQuality extends QueryModule {

  /** 2024-01-16T00:00:00Z — midpoint of the 30-day event range. */
  val cutoffMs = 1705363200000L

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("ems", epochMs(col("ts")))
      .withColumn("is_ref", (col("ems") < cutoffMs).cast("int"))

  // ------------------------------------------------------------------- M9
  /** Kolmogorov-Smirnov two-sample statistic on `value` (drift_check.py:
    * 80-83): D = max |ECDF_ref - ECDF_cur|, i.e. a prefix sum over the
    * global value order — but computed WITHOUT a single-partition global
    * sort. Three phases, all parallel over the big table:
    *
    *   1. approximate value cut points (approx_percentile, collected to the
    *      driver eagerly — tiny, and eager so every later phase sees the
    *      SAME boundaries). Accuracy only affects load balance, never the
    *      statistic: bucket = "how many cuts < value" is a pure function of
    *      value, so ECDF peers (equal values) can never split across
    *      buckets.
    *   2. per-bucket (ref, cur) counts — a grouped agg, |buckets| rows —
    *      collected and turned into exclusive prefix offsets on the driver.
    *   3. per-bucket prefix sums (Window.partitionBy(bucket) — each task
    *      sorts only its value range) + broadcast offset join; then a
    *      plain max-agg for D.
    *
    * Prefix counts are integers, so the distributed form is bit-identical
    * to the global-sort form; the same DuckDB oracle (a true global-order
    * window) stays green. */
  private def ks(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.RangeBuckets
    // 2-column projection persisted across the three phases (cuts probe,
    // per-bucket totals, final windowed pass) — one scan instead of three;
    // spills to disk beyond memory, the standard multi-pass tradeoff
    val base = ev(spark, dir).select(col("value"), col("is_ref")).persist()
    val cuts = RangeBuckets.cuts(base, col("value"))
    val bucketed = base.withColumn("bucket",
      RangeBuckets.ascBucket(cuts, col("value")))

    val totals = bucketed.groupBy(col("bucket"))
      .agg(sum(col("is_ref")).as("t1"), sum(lit(1) - col("is_ref")).as("t2"))
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2))))
      .sortBy(_._1).toSeq
    val n1 = totals.map(_._2._1).sum
    val n2 = totals.map(_._2._2).sum
    // Exclusive running offsets per bucket, shipped back as a broadcast join.
    val offsets = RangeBuckets.exclusivePrefix(totals, (0L, 0L)) {
      case ((a1, a2), (b1, b2)) => (a1 + b1, a2 + b2)
    }.map { case (b, (o1, o2)) => (b, o1, o2) }
    val offsetsDf = spark.createDataFrame(offsets).toDF("bucket", "o1", "o2")

    val local = Window.partitionBy(col("bucket")).orderBy(col("value"))
    val d = bucketed
      .withColumn("l1", sum(col("is_ref")).over(local))
      .withColumn("l2", sum(lit(1) - col("is_ref")).over(local))
      .join(broadcast(offsetsDf), Seq("bucket"))
      .select((((col("l1") + col("o1")) / lit(n1.toDouble)) -
               ((col("l2") + col("o2")) / lit(n2.toDouble))).as("diff"))
    val out = d.agg(max(abs(col("diff"))).as("ks_stat"))
      .withColumn("n_ref", lit(n1))
      .withColumn("n_cur", lit(n2))
      .withColumn("ks_critical",
        lit(1.36) * sqrt((col("n_ref") + col("n_cur")) / (col("n_ref") * col("n_cur"))))
      .withColumn("drifted", col("ks_stat") > col("ks_critical"))
    graft.core.CachePin.sealAndRelease(out, base)
  }

  private val ksSql =
    s"""WITH s AS (
       |  SELECT value,
       |    CASE WHEN epoch_ms(ts) < $cutoffMs THEN 1 ELSE 0 END AS is_ref
       |  FROM events
       |), c AS (
       |  SELECT value,
       |    SUM(is_ref) OVER (ORDER BY value) AS c1,
       |    SUM(1 - is_ref) OVER (ORDER BY value) AS c2,
       |    SUM(is_ref) OVER () AS n1,
       |    SUM(1 - is_ref) OVER () AS n2
       |  FROM s
       |), agg AS (
       |  SELECT MAX(ABS(c1/n1 - c2/n2)) AS ks_stat,
       |    CAST(MAX(n1) AS BIGINT) AS n_ref, CAST(MAX(n2) AS BIGINT) AS n_cur
       |  FROM c)
       |SELECT ks_stat, n_ref, n_cur,
       |  1.36 * SQRT((n_ref + n_cur) / (n_ref * n_cur)) AS ks_critical,
       |  ks_stat > 1.36 * SQRT((n_ref + n_cur) / (n_ref * n_cur)) AS drifted
       |FROM agg""".stripMargin

  // ---------------------------------------------------------- M9 (W1 form)
  /** 1-Wasserstein (earth-mover) drift distance between the reference and
    * current value distributions: W1 = ∫|F_ref − F_cur|dx, computed
    * EXACTLY in integer units. `value` carries two decimal digits by
    * construction, so vi = round(100·value) is lossless, and
    * W1·(100·n1·n2) = Σ over sorted distinct vi of
    * (next vi − vi)·|c1·n2 − c2·n1| is pure BIGINT — bounded by
    * value-range·n1·n2 (no overflow below ~10⁶ rows per side; DECIMAL
    * accumulation is the escape hatch past that) — with the single double
    * division last, identical in both engines. Distributed with the same
    * bucketed-prefix machinery as the KS statistic (no single-partition
    * sort): group by distinct value, range-bucket, per-bucket prefix sums
    * + driver offsets; the cross-bucket value gap is the next bucket's
    * min, shipped with the offsets. KS is the max of |F₁−F₂|; W1 is its
    * integral — the pair covers both classic drift magnitudes. */
  private def wasserstein(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.RangeBuckets
    val g = ev(spark, dir)
      .select(expr("cast(round(value * 100) as bigint)").as("vi"),
        col("is_ref"))
      .groupBy(col("vi"))
      .agg(sum(col("is_ref")).as("r"), sum(lit(1) - col("is_ref")).as("c"))
      .persist()
    val cuts = RangeBuckets.cuts(g, col("vi"))
    val bucketed = g.withColumn("bucket",
      RangeBuckets.ascBucket(cuts, col("vi")))
    val stats = bucketed.groupBy(col("bucket"))
      .agg(sum(col("r")).as("t1"), sum(col("c")).as("t2"),
        min(col("vi")).as("mn"))
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .sortBy(_._1).toSeq
    val n1 = stats.map(_._2._1).sum
    val n2 = stats.map(_._2._2).sum
    val offs = RangeBuckets.exclusivePrefix(stats, (0L, 0L)) {
      case ((a1, a2), (b1, b2, _)) => (a1 + b1, a2 + b2)
    }
    // each bucket also ships the NEXT bucket's smallest value — the gap
    // term for its last row (None for the global maximum, which has no gap)
    val rows = offs.zipWithIndex.map { case ((b, (o1, o2)), i) =>
      val nm = if (i + 1 < stats.size) Some(stats(i + 1)._2._3) else None
      (b, o1, o2, nm)
    }
    val offsetsDf = spark.createDataFrame(rows)
      .toDF("bucket", "o1", "o2", "nextmn")
    val local = Window.partitionBy(col("bucket")).orderBy(col("vi"))
    val contrib = bucketed
      .withColumn("l1", sum(col("r")).over(local))
      .withColumn("l2", sum(col("c")).over(local))
      .withColumn("nl", lead(col("vi"), 1).over(local))
      .join(broadcast(offsetsDf), Seq("bucket"))
      .withColumn("nvi", coalesce(col("nl"), col("nextmn")))
      .filter(col("nvi").isNotNull)
      .select(((col("nvi") - col("vi")) *
        abs((col("l1") + col("o1")) * n2 - (col("l2") + col("o2")) * n1))
        .as("contrib"))
    val out = contrib.agg(sum(col("contrib")).as("w1i"))
      .select((col("w1i") / lit(100.0 * n1 * n2)).as("w1"),
        lit(n1).as("n_ref"), lit(n2).as("n_cur"))
    graft.core.CachePin.sealAndRelease(out, g)
  }

  private val wassersteinSql =
    s"""WITH s AS (
       |  SELECT CAST(ROUND(value * 100) AS BIGINT) AS vi,
       |    CASE WHEN epoch_ms(ts) < $cutoffMs THEN 1 ELSE 0 END AS is_ref
       |  FROM events
       |), g AS (
       |  SELECT vi, CAST(SUM(is_ref) AS BIGINT) AS r,
       |    CAST(SUM(1 - is_ref) AS BIGINT) AS c
       |  FROM s GROUP BY vi
       |), p AS (
       |  SELECT vi,
       |    SUM(r) OVER (ORDER BY vi) AS c1,
       |    SUM(c) OVER (ORDER BY vi) AS c2,
       |    LEAD(vi) OVER (ORDER BY vi) AS nvi,
       |    SUM(r) OVER () AS n1, SUM(c) OVER () AS n2
       |  FROM g
       |), agg AS (
       |  SELECT CAST(SUM((nvi - vi) * ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS w1i,
       |    CAST(MAX(n1) AS BIGINT) AS n_ref, CAST(MAX(n2) AS BIGINT) AS n_cur
       |  FROM p WHERE nvi IS NOT NULL)
       |SELECT w1i / (100.0 * n_ref * n_cur) AS w1, n_ref, n_cur FROM agg"""
      .stripMargin

  // ------------------------------------------------------------------ M11
  /** Population Stability Index with 10 quantile buckets from the reference
    * window, epsilon 1e-6 (drift_check.py:138-169, thresholds 0.1/0.2).
    * Edges are rounded to 6 dp so both engines' interpolation agrees
    * bit-for-bit; values equal to an edge fall in the lower bucket. */
  private def psi(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val bucketed = e.crossJoin(broadcast(psiEdges(spark, dir)))
      .withColumn("bucket", expr("size(filter(edges, e -> e < value))"))
    val refC = bucketed.filter(col("is_ref") === 1)
      .groupBy(col("bucket")).agg(count(lit(1)).as("ref_n"))
    val curC = bucketed.filter(col("is_ref") === 0)
      .groupBy(col("bucket")).agg(count(lit(1)).as("cur_n"))
    val joined = refC.join(curC, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    psiRollup(joined)
  }

  /** The reference window's decile edges (rounded to 6 dp — see psi doc),
    * one row, one array column `edges`. Shared with the streaming twin:
    * the reference profile is fixed, so the stream trains it batch-side
    * and broadcasts it, exactly like the LM/decontamination gates. */
  def psiEdges(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir).filter(col("is_ref") === 1).agg(
      expr("transform(percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)), x -> round(x, 6))")
        .as("edges"))

  /** PSI closed form over a (bucket, ref_n, cur_n) count table (≤10 rows):
    * epsilon-clamped shares, sorted-fold contribution sum, thresholds
    * 0.1/0.2. Shared by the batch query and the streaming twin so both
    * produce bit-identical doubles from identical counts. */
  def psiRollup(joined: DataFrame): DataFrame = {
    val tot = Window.partitionBy()
    val withPct = joined
      .withColumn("e_pct", greatest(col("ref_n") / sum(col("ref_n")).over(tot), lit(1e-6)))
      .withColumn("a_pct", greatest(col("cur_n") / sum(col("cur_n")).over(tot), lit(1e-6)))
      .withColumn("contrib", (col("a_pct") - col("e_pct")) * log(col("a_pct") / col("e_pct")))
    withPct.agg(dsumRaw("contrib").as("psi"))
      .withColumn("drift_status",
        when(col("psi") >= 0.2, "major")
          .when(col("psi") >= 0.1, "moderate")
          .otherwise("stable"))
  }

  /** Exact double sum over few rows: plain sum is order-dependent, but with
    * <=10 buckets both engines sum sequentially over the same sorted merge;
    * to stay safe we sort contributions via collect+sort in SQL semantics.
    * Here: sum after sorting by bucket via aggregate over sorted array. */
  private def dsumRaw(colName: String) =
    expr(s"aggregate(array_sort(collect_list($colName)), 0D, (acc, x) -> acc + x)")

  val psiSql =
    s"""WITH s AS (
       |  SELECT value,
       |    CASE WHEN epoch_ms(ts) < $cutoffMs THEN 1 ELSE 0 END AS is_ref
       |  FROM events
       |), edges AS (
       |  SELECT list_transform(quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
       |                        x -> round(x, 6)) AS edges
       |  FROM s WHERE is_ref = 1
       |), bucketed AS (
       |  SELECT s.is_ref, len(list_filter(edges.edges, e -> e < s.value)) AS bucket
       |  FROM s CROSS JOIN edges
       |), counts AS (
       |  SELECT COALESCE(r.bucket, c.bucket) AS bucket,
       |    COALESCE(r.ref_n, 0) AS ref_n, COALESCE(c.cur_n, 0) AS cur_n
       |  FROM (SELECT bucket, count(*) AS ref_n FROM bucketed WHERE is_ref = 1 GROUP BY bucket) r
       |  FULL OUTER JOIN (SELECT bucket, count(*) AS cur_n FROM bucketed WHERE is_ref = 0 GROUP BY bucket) c
       |    ON r.bucket = c.bucket
       |), pct AS (
       |  SELECT bucket,
       |    GREATEST(ref_n / SUM(ref_n) OVER (), 1e-6) AS e_pct,
       |    GREATEST(cur_n / SUM(cur_n) OVER (), 1e-6) AS a_pct
       |  FROM counts
       |), contribs AS (
       |  SELECT (a_pct - e_pct) * LN(a_pct / e_pct) AS contrib FROM pct
       |), summed AS (
       |  SELECT list_reduce(list_prepend(0.0, list_sort(list(contrib))), (acc, x) -> acc + x) AS psi
       |  FROM contribs)
       |SELECT psi,
       |  CASE WHEN psi >= 0.2 THEN 'major' WHEN psi >= 0.1 THEN 'moderate'
       |       ELSE 'stable' END AS drift_status
       |FROM summed""".stripMargin

  // ------------------------------------------------------------------ M10
  /** Chi-square categorical drift on event_type (drift_check.py:84-99):
    * expected = reference distribution scaled to the current sample size. */
  private def chi2(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val counts = e.groupBy(col("event_type")).agg(
      sum(col("is_ref")).as("ref_n"),
      sum(lit(1) - col("is_ref")).as("cur_n"))
    val tot = Window.partitionBy()
    val contrib = counts
      .withColumn("exp_n",
        (col("ref_n") / sum(col("ref_n")).over(tot)) * sum(col("cur_n")).over(tot))
      .withColumn("contrib",
        (col("cur_n") - col("exp_n")) * (col("cur_n") - col("exp_n")) / col("exp_n"))
    contrib.agg(
      dsumRaw("contrib").as("chi2_stat"),
      (count(lit(1)) - 1).as("dof"))
  }

  private val chi2Sql =
    s"""WITH counts AS (
       |  SELECT event_type,
       |    SUM(CASE WHEN epoch_ms(ts) < $cutoffMs THEN 1 ELSE 0 END) AS ref_n,
       |    SUM(CASE WHEN epoch_ms(ts) < $cutoffMs THEN 0 ELSE 1 END) AS cur_n
       |  FROM events GROUP BY event_type
       |), c AS (
       |  SELECT (cur_n - (ref_n / SUM(ref_n) OVER ()) * SUM(cur_n) OVER ())
       |       * (cur_n - (ref_n / SUM(ref_n) OVER ()) * SUM(cur_n) OVER ())
       |       / ((ref_n / SUM(ref_n) OVER ()) * SUM(cur_n) OVER ()) AS contrib
       |  FROM counts
       |), summed AS (
       |  SELECT list_reduce(list_prepend(0.0, list_sort(list(contrib))), (acc, x) -> acc + x) AS chi2_stat,
       |    count(*) - 1 AS dof
       |  FROM c)
       |SELECT chi2_stat, CAST(dof AS BIGINT) AS dof FROM summed""".stripMargin

  // -------------------------------------------------------------- M2 / M3
  /** Exact quantile summary per event_type (the median/mode imputation and
    * IQR machinery of datasets.py:151-214). Rounded to 6 dp for cross-
    * engine interpolation agreement. */
  private def quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr("round(percentile(value, 0.25), 6)").as("q1"),
        expr("round(percentile(value, 0.5), 6)").as("median"),
        expr("round(percentile(value, 0.75), 6)").as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))
      .orderBy(col("event_type"))

  private val quantilesSql =
    """SELECT event_type, count(*) AS n,
      |  ROUND(quantile_cont(value, 0.25), 6) AS q1,
      |  ROUND(quantile_cont(value, 0.5), 6) AS median,
      |  ROUND(quantile_cont(value, 0.75), 6) AS q3,
      |  ROUND(quantile_cont(value, 0.75), 6) - ROUND(quantile_cont(value, 0.25), 6) AS iqr
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** IQR outlier accounting (1.5x fences, datasets.py:171-214): count rows
    * outside the fences per event_type. */
  private def iqrOutliers(spark: SparkSession, dir: String): DataFrame = {
    val q = quantiles(spark, dir)
      .select(col("event_type"), col("q1"), col("q3"), col("iqr"))
    Tables.events(spark, dir).join(broadcast(q), Seq("event_type"))
      .withColumn("is_outlier",
        col("value") < col("q1") - lit(1.5) * col("iqr") ||
        col("value") > col("q3") + lit(1.5) * col("iqr"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("is_outlier"), 1).otherwise(0)).as("n_outliers"),
        (sum(when(col("is_outlier"), 1).otherwise(0)) / count(lit(1)))
          .as("outlier_rate"))
      .orderBy(col("event_type"))
  }

  private val iqrOutliersSql =
    """WITH q AS (
      |  SELECT event_type,
      |    ROUND(quantile_cont(value, 0.25), 6) AS q1,
      |    ROUND(quantile_cont(value, 0.75), 6) AS q3,
      |    ROUND(quantile_cont(value, 0.75), 6) - ROUND(quantile_cont(value, 0.25), 6) AS iqr
      |  FROM events GROUP BY event_type
      |), flagged AS (
      |  SELECT e.event_type,
      |    (e.value < q.q1 - 1.5 * q.iqr OR e.value > q.q3 + 1.5 * q.iqr) AS is_outlier
      |  FROM events e JOIN q ON e.event_type = q.event_type
      |)
      |SELECT event_type, count(*) AS n,
      |  CAST(SUM(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  SUM(CASE WHEN is_outlier THEN 1 ELSE 0 END) / count(*) AS outlier_rate
      |FROM flagged GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------- M4
  /** Deterministic stratified split (datasets.py:220-246 uses seeded
    * sampling; at scale a content-hash split is reproducible across
    * engines and reruns — md5 of the row id, 5 folds). */
  private def stratifiedSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("fold",
        conv(substring(md5(col("event_id").cast("string").cast("binary")), 1, 8),
             16, 10).cast("long") % 5)
      .groupBy(col("event_type"), col("fold"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"), col("fold"))

  private val stratifiedSplitSql =
    """SELECT event_type,
      |  CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS fold,
      |  count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type, fold
      |ORDER BY event_type, fold""".stripMargin

  /** Class rebalancing for training: every event class downsampled to
    * the MINORITY class size, selection deterministic by md5 rank (the
    * same md5-derived pseudo-randomness the stratified split uses, so
    * resampling is a pure function of the data). Output is the per-class
    * audit (selected count == min class size, id checksum). The per-class
    * rank is a window here (|classes| partitions — bounded); at 100 TB
    * with huge classes the same selection runs through the two-phase
    * distributed rank (operators/RankedWindow) per class. */
  private def classRebalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select($"event_type", $"event_id")
    val minN = e.groupBy($"event_type").count()
      .agg(min($"count").as("min_n"))
    val ranked = e
      .withColumn("hk",
        conv(substring(md5($"event_id".cast("string").cast("binary")), 1, 8),
          16, 10).cast("long"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"event_type").orderBy($"hk", $"event_id")))
    ranked.crossJoin(broadcast(minN))
      .filter($"rk" <= $"min_n")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_selected"), sum($"event_id").as("id_sum"))
      .orderBy($"event_type")
  }

  private val classRebalanceSql =
    """WITH ranked AS (
      |  SELECT event_type, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT),
      |        event_id) AS rk
      |  FROM events),
      |mn AS (SELECT MIN(n) AS min_n FROM
      |  (SELECT COUNT(*) AS n FROM events GROUP BY event_type))
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_selected,
      |  CAST(SUM(event_id) AS BIGINT) AS id_sum
      |FROM ranked, mn WHERE rk <= min_n
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The hashing trick (feature hashing a la Weinberger et al. /
    * spark.ml FeatureHasher, md5-derived for cross-engine exactness):
    * three categorical features per event hash into a 16-bucket signed
    * vector, summed per user. Entirely map-side until the one
    * (user, bucket) shuffle; the vector dimension is fixed so output
    * never grows with vocabulary — the point of the trick at 100 TB. */
  private def featureHashing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = Tables.events(spark, dir).select($"user_id",
      explode(array(
        concat(lit("et="), $"event_type"),
        concat(lit("ub="), ($"user_id" % 50).cast("string")),
        concat(lit("vb="), floor($"value" / 50.0).cast("long").cast("string"))
      )).as("feat"))
    feats
      .withColumn("bucket",
        conv(substring(md5($"feat".cast("binary")), 1, 8), 16, 10)
          .cast("long") % 16)
      .withColumn("sgn",
        when(conv(substring(md5($"feat".cast("binary")), 9, 1), 16, 10)
            .cast("long") % 2 === 0,
          lit(1)).otherwise(lit(-1)))
      .groupBy($"user_id", $"bucket")
      .agg(sum($"sgn").cast("long").as("w"))
      .filter($"w" =!= 0)
      .orderBy($"user_id", $"bucket")
  }

  private val featureHashingSql =
    """WITH feats AS (
      |  SELECT user_id, unnest(list_value(
      |    'et=' || event_type,
      |    'ub=' || CAST(user_id % 50 AS VARCHAR),
      |    'vb=' || CAST(CAST(FLOOR(value / 50.0) AS BIGINT) AS VARCHAR))) AS feat
      |  FROM events),
      |hashed AS (
      |  SELECT user_id,
      |    CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT) % 16 AS bucket,
      |    CASE WHEN CAST('0x' || substr(md5(feat), 9, 1) AS BIGINT) % 2 = 0
      |      THEN 1 ELSE -1 END AS sgn
      |  FROM feats)
      |SELECT user_id, bucket, CAST(SUM(sgn) AS BIGINT) AS w
      |FROM hashed GROUP BY 1, 2 HAVING SUM(sgn) <> 0
      |ORDER BY user_id, bucket""".stripMargin

  /** StandardScaler training statistics (spark.ml StandardScaler's fit
    * half, made cross-engine exact): per class n / mean / sample std via
    * DECIMAL sum and sum-of-squares (value carries 2 decimals, its square
    * 4 — scale 6 holds both losslessly), then identical double formulas
    * last, incl. the z-range of the observed extremes. One partial-
    * aggregated pass; no second scan for the variance. */
  private def featureScaling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = Tables.events(spark, dir).groupBy($"event_type").agg(
      count(lit(1)).as("n"),
      dsum($"value").as("s1"),
      dsum($"value" * $"value").as("s2"),
      min($"value").as("mn"), max($"value").as("mx"))
    def std = sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1))
    s.select($"event_type", $"n",
        ($"s1" / $"n").as("mean"),
        std.as("std"),
        (($"mn" - $"s1" / $"n") / std).as("min_z"),
        (($"mx" - $"s1" / $"n") / std).as("max_z"))
      .orderBy($"event_type")
  }

  private[graft] val featureScalingSql =
    """WITH s AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(value * value AS DECIMAL(25,6))) AS DOUBLE) AS s2,
      |    MIN(value) AS mn, MAX(value) AS mx
      |  FROM events GROUP BY 1)
      |SELECT event_type, n, s1 / n AS mean,
      |  SQRT((s2 - s1 * s1 / n) / (n - 1)) AS std,
      |  (mn - s1 / n) / SQRT((s2 - s1 * s1 / n) / (n - 1)) AS min_z,
      |  (mx - s1 / n) / SQRT((s2 - s1 * s1 / n) / (n - 1)) AS max_z
      |FROM s ORDER BY event_type""".stripMargin

  // ---------------------------------------------------- MMD kernel drift
  /** Kernel two-sample drift WITHOUT pair enumeration: MMD² under the
    * polynomial kernel k(x, y) = (c + x·y)² collapses to exact MOMENTS —
    * Σ_{ij}(c + x_i y_j)² = n_x n_y c² + 2c·Σx·Σy + Σx²·Σy² — so the
    * O(n²) kernel sums a textbook MMD needs become one pass of integer
    * aggregation (the V-statistic form, diagonal included, documented).
    * Values lift to exact cents; Σx/Σx² stay BIGINT and their cross
    * products go through DECIMAL(38,0) (exact — the products reach
    * ~10²⁷); doubles appear only in the closing 3-term combination,
    * written in the identical order in both engines. c = 10⁹ cents²
    * keeps the three kernel terms within a few orders of each other.
    *
    * This is the drift family's kernel member next to KS/PSI/χ²/
    * Wasserstein: sensitive to mean AND second-moment shifts in one
    * number, and the moment collapse is what makes a kernel method
    * 100 TB-viable — the same six sums also make the streaming twin a
    * complete-mode aggregation. */
  private def mmdPoly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mmdFromMoments(mmdMoments(ev(spark, dir)))
  }

  /** The six per-type moments (shared with the streaming twin). */
  private[graft] def mmdMoments(e: DataFrame): DataFrame =
    e.withColumn("x", floor(col("value") * 100.0 + 0.5).cast("long"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("is_ref").cast("long")).as("nx"),
        sum(lit(1L) - col("is_ref")).as("ny"),
        sum(when(col("is_ref") === 1, col("x")).otherwise(0L)).as("sx"),
        sum(when(col("is_ref") === 0, col("x")).otherwise(0L)).as("sy"),
        sum(when(col("is_ref") === 1, col("x") * col("x")).otherwise(0L))
          .as("sxx"),
        sum(when(col("is_ref") === 0, col("x") * col("x")).otherwise(0L))
          .as("syy"))

  /** Closed-form MMD² tail (shared batch/stream). */
  private[graft] def mmdFromMoments(mo: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d38(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
    val nxd = col("nx").cast("double"); val nyd = col("ny").cast("double")
    val term = (na: org.apache.spark.sql.Column,
                nb: org.apache.spark.sql.Column,
                sa: String, sb: String, qa: String, qb: String) =>
      (na * nb * lit(1.0e18)
        + lit(2.0e9) * (d38(col(sa)) * d38(col(sb))).cast("double")
        + (d38(col(qa)) * d38(col(qb))).cast("double")) / (na * nb)
    mo.select(col("event_type"), col("nx"), col("ny"),
        (term(nxd, nxd, "sx", "sx", "sxx", "sxx")
          + term(nyd, nyd, "sy", "sy", "syy", "syy")
          - lit(2.0) * term(nxd, nyd, "sx", "sy", "sxx", "syy")).as("mmd2"))
      .orderBy(col("event_type"))
  }

  private[graft] val mmdPolySql =
    """WITH e AS (
      |  SELECT event_type,
      |    CASE WHEN epoch_ms(ts) < 1705363200000 THEN 1 ELSE 0 END AS is_ref,
      |    CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS x
      |  FROM events
      |), mo AS (
      |  SELECT event_type,
      |    CAST(SUM(is_ref) AS BIGINT) AS nx,
      |    CAST(SUM(1 - is_ref) AS BIGINT) AS ny,
      |    CAST(SUM(CASE WHEN is_ref = 1 THEN x ELSE 0 END) AS DECIMAL(38,0)) AS sx,
      |    CAST(SUM(CASE WHEN is_ref = 0 THEN x ELSE 0 END) AS DECIMAL(38,0)) AS sy,
      |    CAST(SUM(CASE WHEN is_ref = 1 THEN x*x ELSE 0 END) AS DECIMAL(38,0)) AS sxx,
      |    CAST(SUM(CASE WHEN is_ref = 0 THEN x*x ELSE 0 END) AS DECIMAL(38,0)) AS syy
      |  FROM e GROUP BY event_type
      |)
      |SELECT event_type, nx, ny,
      |  (CAST(nx AS DOUBLE) * nx * 1e18
      |     + 2e9 * CAST(sx * sx AS DOUBLE) + CAST(sxx * sxx AS DOUBLE))
      |    / (CAST(nx AS DOUBLE) * nx)
      |  + (CAST(ny AS DOUBLE) * ny * 1e18
      |     + 2e9 * CAST(sy * sy AS DOUBLE) + CAST(syy * syy AS DOUBLE))
      |    / (CAST(ny AS DOUBLE) * ny)
      |  - 2.0 * (CAST(nx AS DOUBLE) * ny * 1e18
      |     + 2e9 * CAST(sx * sy AS DOUBLE) + CAST(sxx * syy AS DOUBLE))
      |    / (CAST(nx AS DOUBLE) * ny) AS mmd2
      |FROM mo ORDER BY event_type""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "drift_mmd_poly" -> (mmdPoly _),
    "ml_class_rebalance" -> (classRebalance _),
    "ml_feature_hashing" -> (featureHashing _),
    "ml_feature_scaling" -> (featureScaling _),
    "drift_ks_statistic" -> (ks _),
    "drift_wasserstein" -> (wasserstein _),
    "drift_psi" -> (psi _),
    "drift_chi2" -> (chi2 _),
    "quality_quantiles" -> (quantiles _),
    "quality_iqr_outliers" -> (iqrOutliers _),
    "ml_stratified_split" -> (stratifiedSplit _))

  override def oracles: Map[String, String] = Map(
    "drift_mmd_poly" -> mmdPolySql,
    "drift_ks_statistic" -> ksSql,
    "drift_wasserstein" -> wassersteinSql,
    "drift_psi" -> psiSql,
    "drift_chi2" -> chi2Sql,
    "quality_quantiles" -> quantilesSql,
    "quality_iqr_outliers" -> iqrOutliersSql,
    "ml_stratified_split" -> stratifiedSplitSql,
    "ml_class_rebalance" -> classRebalanceSql,
    "ml_feature_hashing" -> featureHashingSql,
    "ml_feature_scaling" -> featureScalingSql)
}
