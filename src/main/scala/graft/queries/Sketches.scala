package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Exact._

/** Sketch-based approximate operators — the single-pass, mergeable,
  * fixed-memory primitives a 100 TB pipeline uses where exact answers
  * would need an unbounded shuffle: HyperLogLog cardinality, count-min
  * heavy-hitter estimation, bloom-filter join pruning.
  *
  * Every sketch here is DETERMINISTIC: hashes are md5-derived (the repo's
  * cross-engine rule — never engine hash()) and all register/counter
  * arithmetic stays in exact integers until one final IEEE-deterministic
  * division, so the DuckDB oracle reproduces the sketch bit-for-bit, not
  * just approximately. Each query also carries the exact answer next to
  * the estimate — the error column is the measurement, as with
  * emb_ann_recall.
  *
  * Reference anchor: the reference keeps approximate per-key distinct and
  * top-k gauges in its monitoring path (metrics.py gauge family); these
  * are the scale-correct forms of those gauges.
  */
object Sketches extends QueryModule {

  // ------------------------------------------------------------------ HLL
  /** HyperLogLog distinct-user estimate per event type + merged ALL row.
    *
    * One scan computes per-(type, bucket) max rank — a map-side-partial
    * max into a |types|×m row shuffle, the whole point of HLL at scale.
    * The ALL row is NOT a second scan: registers MERGE by max, so it
    * derives from the per-type register table (the same merge a
    * 1000-executor tree-reduce or a cross-day rollup would do).
    *
    * m = 32 registers keeps the raw estimator in its valid range at the
    * test SF (n/m ≈ 4.7 > 2.5); production raises m to 2^14+. The
    * small-range linear-counting correction is deliberately omitted — it
    * needs ln(), which is libm-dependent and breaks bit-exact cross-engine
    * comparison; the raw estimator is exact-rational until one division.
    *
    * Register math: h = 32-bit md5 of user_id; bucket = h mod 32;
    * w = h div 32 (27 bits); rho = 28 - bitlength(w), 28 when w = 0.
    * T = sum over the m registers of 2^(28 - M_j)  (exact integer;
    * absent register contributes 2^28), E = alpha_32 * m^2 * 2^28 / T. */
  private[graft] val hllM = 32
  private val hllAlpha = 0.697 // standard alpha for m = 32

  /** (bucket, rho) columns for a frame carrying user_id — shared by the
    * batch register aggregation and the streaming register state. */
  private[graft] def hllBucketRho(df: DataFrame): DataFrame = {
    val h = conv(substring(md5(col("user_id").cast("string").cast("binary")),
      1, 8), 16, 10).cast("long")
    // h < 2^32 and m is a power of two, so the double division is exact
    val w = floor(h / lit(hllM.toDouble)).cast("long")
    val rho = when(w === 0L, lit(28))
      .otherwise(lit(28) - length(bin(w))).cast("int")
    df.withColumn("bucket", pmod(h, lit(hllM.toLong)).cast("int"))
      .withColumn("rho", rho)
  }

  /** Estimate + exact measurement from a register table
    * (event_type, bucket, m_j; only SEEN buckets present) — the shared
    * tail of the batch query and its streaming twin (same oracle). */
  private[graft] def hllFromRegs(regs: DataFrame, ev: DataFrame): DataFrame = {
    // registers merge by max -> the ALL row costs |types|*m rows, no rescan
    val merged = regs.unionByName(
      regs.groupBy(col("bucket")).agg(max(col("m_j")).as("m_j"))
        .withColumn("event_type", lit("ALL"))
        .select(col("event_type"), col("bucket"), col("m_j")))
    val est = merged.groupBy(col("event_type"))
      .agg(
        sum(expr("cast(power(2, 28 - m_j) as bigint)")).as("t_set"),
        count(lit(1)).as("n_regs"))
      .withColumn("t_total",
        col("t_set") + (lit(hllM.toLong) - col("n_regs")) * lit(1L << 28))
      .withColumn("hll_estimate",
        round(lit(hllAlpha * hllM * hllM * (1L << 28).toDouble) /
          col("t_total").cast("double"), 6))
    val exact = ev.rollup(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        col("n_exact"))
    est.join(exact, Seq("event_type"))
      .withColumn("rel_error",
        round(abs(col("hll_estimate") - col("n_exact").cast("double")) /
          col("n_exact").cast("double"), 6))
      .select(col("event_type"), col("n_exact"), col("hll_estimate"),
        col("n_regs").cast("long").as("n_regs"), col("rel_error"))
      .orderBy(col("event_type"))
  }

  private def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val regs = hllBucketRho(ev)
      .select(col("event_type"), col("bucket"), col("rho"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("m_j"))
    hllFromRegs(regs, ev)
  }

  private[graft] val hllDistinctSql =
    s"""WITH h AS (
       |  SELECT event_type,
       |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
       |  FROM events
       |), r AS (
       |  SELECT event_type, hv % $hllM AS bucket,
       |    CASE WHEN hv // $hllM = 0 THEN 28
       |         ELSE 28 - length(bin(hv // $hllM)) END AS rho
       |  FROM h
       |), regs AS (
       |  SELECT event_type, bucket, MAX(rho) AS m_j
       |  FROM r GROUP BY event_type, bucket
       |), merged AS (
       |  SELECT event_type, bucket, m_j FROM regs
       |  UNION ALL
       |  SELECT 'ALL' AS event_type, bucket, MAX(m_j) AS m_j
       |  FROM regs GROUP BY bucket
       |), est AS (
       |  SELECT event_type,
       |    CAST(SUM(CAST(power(2, 28 - m_j) AS BIGINT)) AS BIGINT) AS t_set,
       |    CAST(COUNT(*) AS BIGINT) AS n_regs
       |  FROM merged GROUP BY event_type
       |), exact AS (
       |  SELECT COALESCE(event_type, 'ALL') AS event_type,
       |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
       |  FROM events GROUP BY ROLLUP (event_type)
       |)
       |, joined AS (
       |  -- rel_error derives from the ROUNDED estimate, matching the
       |  -- engine side exactly
       |  SELECT e.event_type, x.n_exact,
       |    ROUND($hllAlpha * $hllM * $hllM * CAST(1 << 28 AS DOUBLE)
       |      / CAST(t_set + ($hllM - n_regs) * CAST(1 << 28 AS BIGINT) AS DOUBLE), 6)
       |      AS hll_estimate,
       |    n_regs
       |  FROM est e JOIN exact x USING (event_type)
       |)
       |SELECT event_type, n_exact, hll_estimate, n_regs,
       |  ROUND(ABS(hll_estimate - CAST(n_exact AS DOUBLE))
       |    / CAST(n_exact AS DOUBLE), 6) AS rel_error
       |FROM joined
       |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------ count-min
  /** Count-min sketch heavy hitters: a d=4 × w=64 counter grid estimates
    * per-user event counts; the query reports the exact top-10 users next
    * to their CMS estimates (estimate >= exact always — the one-sided CMS
    * guarantee, surfaced as the overestimate column).
    *
    * Scale shape: the sketch is ONE grouped agg into d*w = 256 cells
    * (map-side partial sums), mergeable across partitions/days by cell
    * addition — versus the exact top-k's full shuffle on user_id. The
    * exact side here is the measurement harness, as with emb_ann_recall. */
  private[graft] val cmsD = 4
  private[graft] val cmsW = 64

  private[graft] def cmsHash(r: Int, key: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(concat(lit(s"$r:"), key.cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("long"), lit(cmsW.toLong))

  /** The d (row, column) cells a key hashes into, as an exploded column. */
  private[graft] def cmsCellsOf(key: org.apache.spark.sql.Column) =
    explode(array((0 until cmsD).map(r =>
      struct(lit(r).as("r"), cmsHash(r, key).as("c"))): _*))

  /** Probe tail shared by the batch and streaming CMS queries: exact
    * top-10 keys, each estimated as the MIN over its d grid cells. */
  private[graft] def cmsFromCells(cells: DataFrame, ev: DataFrame): DataFrame = {
    val top = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id")).limit(10)
    top.select(col("user_id"), col("n_exact"),
        cmsCellsOf(col("user_id")).as("rc"))
      .join(broadcast(cells),
        col("rc.r") === cells("r") && col("rc.c") === cells("c"))
      .groupBy(col("user_id"), col("n_exact"))
      .agg(min(col("cnt")).as("n_cms"))
      .withColumn("overestimate", col("n_cms") - col("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id"))
  }

  private def cmsTopk(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cells = ev.select(cmsCellsOf(col("user_id")).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
    cmsFromCells(cells, ev)
  }

  private[graft] val cmsTopkSql =
    s"""WITH cells AS (
       |  SELECT r.r AS r,
       |    CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' ||
       |      CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % $cmsW AS c,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM events, (SELECT unnest(range($cmsD)) AS r) r
       |  GROUP BY 1, 2
       |), top AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
       |  FROM events GROUP BY user_id
       |  ORDER BY n_exact DESC, user_id LIMIT 10
       |)
       |SELECT t.user_id, t.n_exact, MIN(m.cnt) AS n_cms,
       |  MIN(m.cnt) - t.n_exact AS overestimate
       |FROM top t, (SELECT unnest(range($cmsD)) AS r) r
       |JOIN cells m ON m.r = r.r
       |  AND m.c = CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' ||
       |    CAST(t.user_id AS VARCHAR)), 1, 8)) AS BIGINT) % $cmsW
       |GROUP BY t.user_id, t.n_exact
       |ORDER BY t.n_exact DESC, t.user_id""".stripMargin

  // -------------------------------------------------------- bloom pruning
  /** Semi-join with bloom-filter pre-pruning: orders of BUILDING-segment
    * customers. The dimension side builds a 4096-bit md5-derived bloom
    * filter (graft.operators.BloomPrune); the fact scan drops non-members
    * BEFORE the shuffle; the exact semi-join after removes false
    * positives, so the result is the plain semi-join — which is exactly
    * what the oracle checks. See ScaleOpsSpec for the pruning assertion.
    *
    * This mirrors Spark's own runtime row-level filtering
    * (InjectRuntimeFilter / spark.sql.optimizer.runtime.bloomFilter.*):
    * at 100 TB the win is shuffle bytes ∝ matching rows, not scan rows. */
  private def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.BloomPrune
    val seg = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    // dimension-side collect is bounded BY CONSTRUCTION (a bloom filter
    // only applies when the build side is small); an unbounded build runs
    // as an aggregation instead (see BloomPrune scaladoc)
    val words = BloomPrune.build(
      seg.collect().map(_.getLong(0).toString).toIterable)
    Tables.orders(spark, dir)
      .filter(BloomPrune.mightContain(words, col("o_custkey").cast("string")))
      .join(seg, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val bloomSemiJoinSql =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
      |FROM orders
      |WHERE o_custkey IN
      |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------- bitmap distinct
  /** EXACT distinct-user count per event type via bitmap-index words —
    * the roaring-bitmap aggregation pattern every OLAP engine keeps next
    * to HLL: bucket the integer key into 64-bit words (word = id div 64,
    * bit = id mod 64), OR the words per group, popcount-sum the result.
    *
    * Scale shape: the shuffle carries (group, word) partial ORs — map-side
    * combine collapses each partition to ≤ |ids|/64 words per group, and
    * words MERGE by OR exactly like HLL registers merge by max, so the
    * same tree-reduce / cross-day rollup works; distinct becomes an
    * ADDITIVE sum of popcounts with no count-distinct re-expansion. The
    * ALL row derives from the per-type word table by a second OR-merge,
    * not a second scan. Exact integers end-to-end — no float, no
    * estimate column needed. */
  /** (group, word) partial-OR stage — shared verbatim by the batch query
    * and the streaming twin (bit_or is algebraic, so the same expression
    * runs as a streaming aggregation). 32 ids per BIGINT word, not 64:
    * DuckDB's checked left shift rejects `1 << 63` (sign-bit overflow),
    * and a sign-safe 63-bit payload costs an extra CASE in both engines
    * for 3% density — half-full words keep the oracle one shift. */
  private[graft] def bitmapWordsOf(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), expr("user_id div 32").as("word_idx"),
        expr("shiftleft(1L, CAST(user_id % 32 AS INT))").as("w"))
      .groupBy(col("event_type"), col("word_idx"))
      .agg(expr("bit_or(w)").as("bits"))

  /** popcount rollup over a (event_type, word_idx, bits) word table:
    * per-type counts + the OR-merged ALL row. */
  private[graft] def bitmapRollup(words: DataFrame): DataFrame = {
    val perType = words.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_words"),
        sum(expr("bit_count(bits)")).cast("long").as("distinct_users"))
    val merged = words.groupBy(col("word_idx"))
      .agg(expr("bit_or(bits)").as("bits"))
      .agg(lit("ALL").as("event_type"), count(lit(1)).as("n_words"),
        sum(expr("bit_count(bits)")).cast("long").as("distinct_users"))
    perType.unionByName(merged).orderBy(col("event_type"))
  }

  private def bitmapDistinct(spark: SparkSession, dir: String): DataFrame =
    bitmapRollup(bitmapWordsOf(Tables.events(spark, dir)))

  private[graft] val bitmapDistinctSql =
    """WITH words AS (
      |  SELECT event_type, user_id // 32 AS word_idx,
      |    bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bits
      |  FROM events GROUP BY 1, 2
      |), per_type AS (
      |  SELECT event_type, count(*) AS n_words,
      |    CAST(SUM(bit_count(bits)) AS BIGINT) AS distinct_users
      |  FROM words GROUP BY 1
      |), merged_words AS (
      |  SELECT word_idx, bit_or(bits) AS bits FROM words GROUP BY 1
      |), merged AS (
      |  SELECT 'ALL' AS event_type, count(*) AS n_words,
      |    CAST(SUM(bit_count(bits)) AS BIGINT) AS distinct_users
      |  FROM merged_words)
      |SELECT * FROM per_type UNION ALL SELECT * FROM merged
      |ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------------ KMV
  /** k-minimum-values (bottom-k) distinct sketch with SET OPERATIONS
    * (Beyer et al. 2007, "On synopses for distinct-value estimation") —
    * the sketch family HLL cannot do: HLL registers merge by max (union
    * only), while two bottom-k sketches support union AND intersection,
    * so one 64-hash synopsis per segment answers overlap questions
    * between any segment pair without rescanning either.
    *
    * Sets: users active in the first vs second half of the event
    * timeline. h = 32-bit md5 of user_id (the repo hash rule); each
    * side keeps its k = 64 smallest distinct hash values. The union
    * sketch K is the k smallest of the pooled sketches; with
    * c = |{h ∈ K present in both sides}| and kth = max(K),
    *
    *   Jaccard ≈ c/k,   |A∪B| ≈ (k−1)·2³²/kth,   |A∩B| ≈ product
    *
    * — integer counts and two single double divisions (the product of
    * two identically-computed doubles is itself deterministic). The
    * exact n_a / n_b / true overlap ride along as the error measurement,
    * like every other sketch row here.
    *
    * Scale shape: one shuffle builds the distinct (side, hash) table;
    * each side's bottom-k goes through RankedWindow (two-phase global
    * rank — NO single-partition sort); everything after is ≤ 2k rows.
    * Bottom-k is mergeable (min of mins), so the per-executor partial
    * at 100 TB is the same k-row synopsis. */
  private val kmvK = 64

  /** KMV set-operation finale over a per-side bottom-k table `(side, h)`
    * for sides "a"/"b" — shared by the batch query's ranked sketches and
    * the streaming twin's state arrays, so the estimate algebra can never
    * diverge between the two runtimes. */
  private[graft] def kmvSetOps(sk: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val skA = sk.filter(col("side") === "a")
      .select(col("h")).withColumn("in_a", lit(1L))
    val skB = sk.filter(col("side") === "b")
      .select(col("h")).withColumn("in_b", lit(1L))
    val pooled = skA.select(col("h")).unionAll(skB.select(col("h")))
      .distinct()
      .orderBy(col("h")).limit(kmvK) // ≤ 2k rows: bounded final stage
    pooled
      .join(skA, Seq("h"), "left").join(skB, Seq("h"), "left")
      .agg(
        count(lit(1)).as("k_used"),
        max(col("h")).as("kth"),
        sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L)
          .otherwise(0L)).as("c_both"))
      .select(col("k_used"), col("kth"), col("c_both"),
        (col("c_both").cast("double") / col("k_used").cast("double"))
          .as("jaccard_est"),
        when(col("kth") > 0,
          ((col("k_used") - 1L) * lit(4294967296L)).cast("double") /
            col("kth").cast("double")).otherwise(lit(0.0)).as("union_est"))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
  }

  private def kmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).withColumn("ems", epochMs($"ts"))
    val b = ev.agg(min($"ems").as("mn"), max($"ems").as("mx"))
      .select(expr("(mn + mx) div 2").as("mid"))
    val sided = ev.crossJoin(broadcast(b))
      .select(when($"ems" <= $"mid", "a").otherwise("b").as("side"),
        $"user_id")
    val hashed = sided.select($"side",
      conv(substring(md5($"user_id".cast("string").cast("binary")), 1, 8),
        16, 10).cast("long").as("h"))
      .distinct()
    def bottomK(side: String) =
      graft.operators.RankedWindow.rankDesc(
        hashed.filter($"side" === side).select($"h"),
        value = -$"h", tie = $"h", sealOutput = false)
        .filter($"rnk" <= kmvK).select($"h")
    val sk = kmvSetOps(
      bottomK("a").withColumn("side", lit("a"))
        .unionAll(bottomK("b").withColumn("side", lit("b"))))
    // exact ground truth (the error measurement)
    val exact = sided.distinct()
      .groupBy($"user_id")
      .agg(max(when($"side" === "a", 1L).otherwise(0L)).as("a"),
        max(when($"side" === "b", 1L).otherwise(0L)).as("b"))
      .agg(sum($"a").cast("long").as("n_a_exact"),
        sum($"b").cast("long").as("n_b_exact"),
        sum($"a" * $"b").cast("long").as("overlap_exact"))
    sk.crossJoin(broadcast(exact))
      .select($"k_used", $"kth", $"c_both",
        $"n_a_exact", $"n_b_exact", $"overlap_exact",
        $"jaccard_est", $"union_est", $"inter_est")
  }

  private val kmvOverlapSql =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_ms(ts) AS ems FROM events
       |), b AS (SELECT (MIN(ems) + MAX(ems)) // 2 AS mid FROM ev),
       |sided AS (
       |  SELECT DISTINCT CASE WHEN ems <= mid THEN 'a' ELSE 'b' END AS side,
       |    user_id
       |  FROM ev, b
       |), hashed AS (
       |  SELECT DISTINCT side,
       |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
       |      AS BIGINT) AS h
       |  FROM sided
       |), ranked AS (
       |  SELECT side, h,
       |    row_number() OVER (PARTITION BY side ORDER BY h) AS rnk
       |  FROM hashed
       |), ska AS (SELECT h FROM ranked WHERE side = 'a' AND rnk <= $kmvK),
       |skb AS (SELECT h FROM ranked WHERE side = 'b' AND rnk <= $kmvK),
       |pooled AS (
       |  SELECT h FROM (SELECT DISTINCT h FROM
       |    (SELECT h FROM ska UNION ALL SELECT h FROM skb))
       |  ORDER BY h LIMIT $kmvK
       |), sk AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
       |    CAST(MAX(p.h) AS BIGINT) AS kth,
       |    CAST(SUM(CASE WHEN ska.h IS NOT NULL AND skb.h IS NOT NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS c_both
       |  FROM pooled p
       |  LEFT JOIN ska ON p.h = ska.h LEFT JOIN skb ON p.h = skb.h
       |), ex AS (
       |  SELECT CAST(SUM(a) AS BIGINT) AS n_a_exact,
       |    CAST(SUM(b) AS BIGINT) AS n_b_exact,
       |    CAST(SUM(a * b) AS BIGINT) AS overlap_exact
       |  FROM (
       |    SELECT user_id,
       |      MAX(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS a,
       |      MAX(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS b
       |    FROM sided GROUP BY user_id)
       |)
       |SELECT k_used, kth, c_both, n_a_exact, n_b_exact, overlap_exact,
       |  CAST(c_both AS DOUBLE) / CAST(k_used AS DOUBLE) AS jaccard_est,
       |  CASE WHEN kth > 0 THEN
       |    CAST((k_used - 1) * 4294967296 AS DOUBLE) / CAST(kth AS DOUBLE)
       |  ELSE 0.0 END AS union_est,
       |  (CAST(c_both AS DOUBLE) / CAST(k_used AS DOUBLE)) *
       |  (CASE WHEN kth > 0 THEN
       |    CAST((k_used - 1) * 4294967296 AS DOUBLE) / CAST(kth AS DOUBLE)
       |  ELSE 0.0 END) AS inter_est
       |FROM sk, ex""".stripMargin

  /** Oracle for the STREAMING KMV twin: sides are the click vs purchase
    * user populations (event-type sides stream cleanly; the batch query's
    * timeline split needs the corpus min/max up front, which a stream
    * doesn't have). Sketch-only columns — the ground-truth ride-along
    * stays with the batch query. */
  private[graft] val kmvStreamSql =
    s"""WITH hashed AS (
       |  SELECT DISTINCT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b'
       |      END AS side,
       |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
       |      AS BIGINT) AS h
       |  FROM events WHERE event_type IN ('click', 'purchase')
       |), ranked AS (
       |  SELECT side, h,
       |    row_number() OVER (PARTITION BY side ORDER BY h) AS rnk
       |  FROM hashed
       |), ska AS (SELECT h FROM ranked WHERE side = 'a' AND rnk <= $kmvK),
       |skb AS (SELECT h FROM ranked WHERE side = 'b' AND rnk <= $kmvK),
       |pooled AS (
       |  SELECT h FROM (SELECT DISTINCT h FROM
       |    (SELECT h FROM ska UNION ALL SELECT h FROM skb))
       |  ORDER BY h LIMIT $kmvK
       |), sk AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
       |    CAST(MAX(p.h) AS BIGINT) AS kth,
       |    CAST(SUM(CASE WHEN ska.h IS NOT NULL AND skb.h IS NOT NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS c_both
       |  FROM pooled p
       |  LEFT JOIN ska ON p.h = ska.h LEFT JOIN skb ON p.h = skb.h
       |)
       |SELECT k_used, kth, c_both,
       |  CAST(c_both AS DOUBLE) / CAST(k_used AS DOUBLE) AS jaccard_est,
       |  CASE WHEN kth > 0 THEN
       |    CAST((k_used - 1) * 4294967296 AS DOUBLE) / CAST(kth AS DOUBLE)
       |  ELSE 0.0 END AS union_est,
       |  (CAST(c_both AS DOUBLE) / CAST(k_used AS DOUBLE)) *
       |  (CASE WHEN kth > 0 THEN
       |    CAST((k_used - 1) * 4294967296 AS DOUBLE) / CAST(kth AS DOUBLE)
       |  ELSE 0.0 END) AS inter_est
       |FROM sk""".stripMargin

  // ------------------------------------------------ priority sampling
  /** Deterministic PRIORITY SAMPLE (Efraimidis–Spirakis with uniform
    * weights — the distributed, mergeable form of reservoir sampling):
    * per event type, the 8 rows with the smallest 60-bit md5 priority.
    * Unlike TABLESAMPLE this is (a) deterministic — the same sample on
    * every run and any cluster layout, reproducible by the oracle; and
    * (b) MERGEABLE — bottom-k priorities union like KMV registers, so
    * partitions sample independently and combine, day N's sample unions
    * with day N+1's, and the streaming twin keeps exactly that state
    * (`SketchState.kmvBottomK` with event_type as the side key).
    * Two-phase ranking: a salted (h % 64) local bottom-8 bounds the
    * per-type finale to ≤ 8·64 rows — no single-partition global sort.
    * 60-bit priorities: a collision would merely rank both carriers
    * adjacently (tie-broken by event_id, identically in both engines). */
  private def prioritySample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"))
      .withColumn("h", expr(
        "cast(conv(substr(md5(cast(cast(event_id as string) as binary)), " +
          "1, 15), 16, 10) as bigint)"))
    val w1 = Window.partitionBy(col("event_type"), pmod(col("h"), lit(64L)))
      .orderBy(col("h"), col("event_id"))
    val w2 = Window.partitionBy(col("event_type"))
      .orderBy(col("h"), col("event_id"))
    ev.withColumn("r1", row_number().over(w1)).filter(col("r1") <= 8)
      .withColumn("rk", row_number().over(w2).cast("long"))
      .filter(col("rk") <= 8)
      .select(col("event_type"), col("rk"), col("event_id"), col("h"))
      .orderBy(col("event_type"), col("rk"))
  }

  private[graft] val prioritySampleSql =
    """WITH h AS (
      |  SELECT event_type, event_id,
      |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
      |      AS BIGINT) AS h
      |  FROM events
      |), r AS (
      |  SELECT event_type, event_id, h,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY h, event_id) AS BIGINT) AS rk
      |  FROM h
      |)
      |SELECT event_type, rk, event_id, h FROM r WHERE rk <= 8
      |ORDER BY event_type, rk""".stripMargin

  // --------------------------------------- weighted priority sampling
  /** WEIGHTED priority sample with integer weights by TICKET REPLICATION
    * (round 10 — completes the sampling family: stratified split /
    * uniform reservoir / weighted reservoir): an item of weight w holds
    * w independent md5 tickets and its priority is the MINIMUM — the
    * discrete-weight form of Efraimidis–Spirakis (P(min ticket beats a
    * rival's) rises with w exactly as w uniform draws vs theirs), and
    * still fully MERGEABLE: per-partition min-ticket partials combine,
    * then bottom-k per type unions like any KMV register (the streaming
    * twin keeps ticket-level bottom-32 state — see
    * StreamingPipelines.weightedSampleStream for why 32 suffices for an
    * exact top-8). Weight = 1 + (value cents mod 4) ∈ 1..4 — a
    * value-derived integer, so heavy transactions are oversampled. The
    * ticket explode multiplies rows by E[w] ≈ 2.5 BEFORE the map-side
    * min-combine collapses them back — bounded blowup, no shuffle
    * growth. Same salted two-phase ranking as the uniform sample. */
  private def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        (lit(1L) + floor(col("value") * 100.0 + 0.5).cast("long") % 4)
          .as("w"))
      .withColumn("t", explode(expr("sequence(1L, w)")))
      .withColumn("th", expr(
        "cast(conv(substr(md5(cast(concat(cast(event_id as string), ':', " +
          "cast(t as string)) as binary)), 1, 15), 16, 10) as bigint)"))
      .groupBy(col("event_type"), col("event_id"), col("w"))
      .agg(min(col("th")).as("mh"))
    val w1 = Window.partitionBy(col("event_type"), pmod(col("mh"), lit(64L)))
      .orderBy(col("mh"), col("event_id"))
    val w2 = Window.partitionBy(col("event_type"))
      .orderBy(col("mh"), col("event_id"))
    ev.withColumn("r1", row_number().over(w1)).filter(col("r1") <= 8)
      .withColumn("rk", row_number().over(w2).cast("long"))
      .filter(col("rk") <= 8)
      .select(col("event_type"), col("rk"), col("event_id"), col("w"),
        col("mh"))
      .orderBy(col("event_type"), col("rk"))
  }

  private[graft] val weightedSampleSql =
    """WITH c AS (
      |  SELECT event_type, event_id,
      |    1 + (CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) % 4) AS w
      |  FROM events
      |), j AS (
      |  SELECT event_type, event_id, w,
      |    unnest(generate_series(1, w)) AS t
      |  FROM c
      |), t AS (
      |  SELECT event_type, event_id, w,
      |    CAST(('0x' || substr(md5(event_id || ':' || t), 1, 15)) AS BIGINT)
      |      AS th
      |  FROM j
      |), m AS (
      |  SELECT event_type, event_id, w, MIN(th) AS mh
      |  FROM t GROUP BY 1, 2, 3
      |), r AS (
      |  SELECT event_type, event_id, w, mh,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY mh, event_id) AS BIGINT) AS rk
      |  FROM m
      |)
      |SELECT event_type, rk, event_id, w, mh FROM r WHERE rk <= 8
      |ORDER BY event_type, rk""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_hll_distinct" -> (hllDistinct _),
    "sketch_cms_topk" -> (cmsTopk _),
    "rel_bloom_semi_join" -> (bloomSemiJoin _),
    "sketch_bitmap_distinct" -> (bitmapDistinct _),
    "sketch_kmv_overlap" -> (kmvOverlap _),
    "ml_priority_sample" -> (prioritySample _),
    "ml_weighted_sample" -> (weightedSample _))

  override def oracles: Map[String, String] = Map(
    "sketch_hll_distinct" -> hllDistinctSql,
    "sketch_cms_topk" -> cmsTopkSql,
    "rel_bloom_semi_join" -> bloomSemiJoinSql,
    "sketch_bitmap_distinct" -> bitmapDistinctSql,
    "sketch_kmv_overlap" -> kmvOverlapSql,
    "ml_priority_sample" -> prioritySampleSql,
    "ml_weighted_sample" -> weightedSampleSql)
}
