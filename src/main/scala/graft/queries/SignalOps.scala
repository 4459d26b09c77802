package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import Exact._

/** Round-9 additions: Haar wavelet decomposition (batch + streaming),
  * HITS hubs/authorities, exact two-phase distributed percentile
  * selection, forward as-of join, and the ORC leg of the format family.
  *
  * Reference anchors: the reference's monitoring path keeps rolling
  * spectral/level summaries per metric (streaming/core/processors/
  * transaction.py gauge family) and its training extracts use
  * percentile clipping (training/pipeline.py quality bounds); these are
  * the scale-correct Spark forms with bit-exact DuckDB oracles.
  */
object SignalOps extends QueryModule {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).withColumn("ems", epochMs(col("ts")))

  // --------------------------------------------- Haar wavelet energy
  /** Unnormalized Haar wavelet decomposition of each event type's hourly
    * count series on the 16-hour dyadic grid anchored at the corpus max
    * hour (absent hours = 0 — the anchor fixes the length, like
    * [[AdvancedOps]]'s Holt grids): 4 levels of pairwise sums a and
    * differences d, ALL integers (the lifting form — no /2, so no
    * rounding anywhere). Per-level detail energies e_l = Σ d², squared
    * in DECIMAL(38,0) so the ANSI bound is 10³⁸, not the 64-bit
    * intermediate; the normalized comparison puts them over the common
    * denominator 2⁴: E_l = e_l·2^(4−l), dominant level = argmax E_l
    * (ties → coarser time scale, i.e. smaller l), and dom_share =
    * E_dom / ΣE_l is the single double division.
    *
    * Scale shape: ONE shuffle on (type, hour); the 16-column pivot and
    * the whole transform are per-type expression work inside codegen —
    * the map-side partial aggregation already reduces 100 TB of events
    * to |types|·16 rows. Output BIGINTs overflow only past ~9·10¹⁸
    * true energy (≈3·10⁹ events per type-hour). */
  private def haarEnergy(spark: SparkSession, dir: String): DataFrame =
    haarTail(ev(spark, dir)
      .withColumn("h", expr("ems div 3600000"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")))

  /** Haar finale over a per-(type, hour) count table `(event_type, h, c)`
    * — shared by the batch query and the streaming twin (whose
    * complete-mode aggregation state IS that table). */
  private[graft] def haarTail(pm: DataFrame): DataFrame = {
    val spark = pm.sparkSession
    import spark.implicits._
    val mx = pm.agg(max($"h").as("mxh"))
    val xcols = (0 to 15).map(i =>
      sum(when($"t" === i, $"c").otherwise(0L)).cast("long").as(s"x$i"))
    val xs = pm.crossJoin(broadcast(mx))
      .withColumn("t", $"h" - ($"mxh" - 15))
      .filter($"t" >= 0)
      .groupBy($"event_type")
      .agg(xcols.head, xcols.tail: _*)
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    // level 1..4 coefficients as named per-level projections
    val l1 = xs.select(
      Seq($"event_type") ++
        (0 to 7).map(i => (col(s"x${2 * i}") + col(s"x${2 * i + 1}")).as(s"a1_$i")) ++
        (0 to 7).map(i => (col(s"x${2 * i}") - col(s"x${2 * i + 1}")).as(s"d1_$i")): _*)
    val l2 = l1.select(
      Seq($"event_type") ++ (0 to 7).map(i => col(s"d1_$i")) ++
        (0 to 3).map(i => (col(s"a1_${2 * i}") + col(s"a1_${2 * i + 1}")).as(s"a2_$i")) ++
        (0 to 3).map(i => (col(s"a1_${2 * i}") - col(s"a1_${2 * i + 1}")).as(s"d2_$i")): _*)
    val l3 = l2.select(
      Seq($"event_type") ++ (0 to 7).map(i => col(s"d1_$i")) ++
        (0 to 3).map(i => col(s"d2_$i")) ++
        (0 to 1).map(i => (col(s"a2_${2 * i}") + col(s"a2_${2 * i + 1}")).as(s"a3_$i")) ++
        (0 to 1).map(i => (col(s"a2_${2 * i}") - col(s"a2_${2 * i + 1}")).as(s"d3_$i")): _*)
    val l4 = l3.select(
      Seq($"event_type") ++ (0 to 7).map(i => col(s"d1_$i")) ++
        (0 to 3).map(i => col(s"d2_$i")) ++ (0 to 1).map(i => col(s"d3_$i")) ++ Seq(
          ($"a3_0" + $"a3_1").as("a4"), ($"a3_0" - $"a3_1").as("d4")): _*)
    val e1 = (0 to 7).map(i => dec(col(s"d1_$i")) * col(s"d1_$i")).reduce(_ + _)
    val e2 = (0 to 3).map(i => dec(col(s"d2_$i")) * col(s"d2_$i")).reduce(_ + _)
    val e3 = (0 to 1).map(i => dec(col(s"d3_$i")) * col(s"d3_$i")).reduce(_ + _)
    val e4 = dec($"d4") * $"d4"
    val scored = l4.select($"event_type", $"a4".as("total"), $"d4",
        e1.cast("long").as("e1"), e2.cast("long").as("e2"),
        e3.cast("long").as("e3"), e4.cast("long").as("e4"))
      .withColumn("w1", dec($"e1") * 8)
      .withColumn("w2", dec($"e2") * 4)
      .withColumn("w3", dec($"e3") * 2)
      .withColumn("w4", dec($"e4"))
      .withColumn("wsum", $"w1" + $"w2" + $"w3" + $"w4")
    scored.select($"event_type", $"total", $"d4", $"e1", $"e2", $"e3", $"e4",
        when($"w1" >= $"w2" && $"w1" >= $"w3" && $"w1" >= $"w4", 1L)
          .when($"w2" >= $"w3" && $"w2" >= $"w4", 2L)
          .when($"w3" >= $"w4", 3L).otherwise(4L).as("dom_level"),
        when($"wsum" === 0, lit(null).cast("double"))
          .otherwise(
            greatest($"w1", $"w2", $"w3", $"w4").cast("double") /
              $"wsum".cast("double")).as("dom_share"))
      .orderBy($"event_type")
  }

  private[graft] val haarEnergySql = {
    val xcols = (0 to 15).map(i =>
      s"""CAST(COALESCE(SUM(CASE WHEN t = $i THEN c END), 0) AS BIGINT)
         |    AS x$i""".stripMargin).mkString(",\n  ")
    val a1 = (0 to 7).map(i => s"x${2 * i} + x${2 * i + 1} AS a1_$i")
    val d1 = (0 to 7).map(i => s"x${2 * i} - x${2 * i + 1} AS d1_$i")
    val a2 = (0 to 3).map(i => s"a1_${2 * i} + a1_${2 * i + 1} AS a2_$i")
    val d2 = (0 to 3).map(i => s"a1_${2 * i} - a1_${2 * i + 1} AS d2_$i")
    val a3 = (0 to 1).map(i => s"a2_${2 * i} + a2_${2 * i + 1} AS a3_$i")
    val d3 = (0 to 1).map(i => s"a2_${2 * i} - a2_${2 * i + 1} AS d3_$i")
    val e1 = (0 to 7).map(i => s"CAST(d1_$i AS HUGEINT) * d1_$i").mkString(" + ")
    val e2 = (0 to 3).map(i => s"CAST(d2_$i AS HUGEINT) * d2_$i").mkString(" + ")
    val e3 = (0 to 1).map(i => s"CAST(d3_$i AS HUGEINT) * d3_$i").mkString(" + ")
    s"""WITH pm AS (
       |  SELECT event_type, epoch_ms(ts) // 3600000 AS h,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2
       |), m AS (SELECT MAX(h) AS mxh FROM pm),
       |xs AS (
       |  SELECT event_type,
       |  $xcols
       |  FROM (SELECT event_type, h - (mxh - 15) AS t, c FROM pm, m
       |        WHERE h >= mxh - 15)
       |  GROUP BY event_type
       |),
       |l1 AS (SELECT event_type, ${(a1 ++ d1).mkString(", ")} FROM xs),
       |l2 AS (SELECT event_type, ${(0 to 7).map(i => s"d1_$i").mkString(", ")},
       |  ${(a2 ++ d2).mkString(", ")} FROM l1),
       |l3 AS (SELECT event_type, ${(0 to 7).map(i => s"d1_$i").mkString(", ")},
       |  ${(0 to 3).map(i => s"d2_$i").mkString(", ")},
       |  ${(a3 ++ d3).mkString(", ")} FROM l2),
       |l4 AS (SELECT event_type,
       |  ${(0 to 7).map(i => s"d1_$i").mkString(", ")},
       |  ${(0 to 3).map(i => s"d2_$i").mkString(", ")},
       |  d3_0, d3_1,
       |  a3_0 + a3_1 AS a4, a3_0 - a3_1 AS d4 FROM l3),
       |en AS (SELECT event_type, a4 AS total, d4,
       |  CAST($e1 AS BIGINT) AS e1, CAST($e2 AS BIGINT) AS e2,
       |  CAST($e3 AS BIGINT) AS e3,
       |  CAST(CAST(d4 AS HUGEINT) * d4 AS BIGINT) AS e4 FROM l4),
       |sc AS (SELECT *, CAST(e1 AS HUGEINT) * 8 AS w1,
       |  CAST(e2 AS HUGEINT) * 4 AS w2, CAST(e3 AS HUGEINT) * 2 AS w3,
       |  CAST(e4 AS HUGEINT) AS w4 FROM en)
       |SELECT event_type, total, d4, e1, e2, e3, e4,
       |  CAST(CASE
       |    WHEN w1 >= w2 AND w1 >= w3 AND w1 >= w4 THEN 1
       |    WHEN w2 >= w3 AND w2 >= w4 THEN 2
       |    WHEN w3 >= w4 THEN 3 ELSE 4 END AS BIGINT) AS dom_level,
       |  CASE WHEN w1 + w2 + w3 + w4 = 0 THEN NULL
       |    ELSE CAST(greatest(w1, w2, w3, w4) AS DOUBLE)
       |      / CAST(w1 + w2 + w3 + w4 AS DOUBLE) END AS dom_share
       |FROM sc ORDER BY event_type""".stripMargin
  }

  /** Streaming twin: per-(type, hour) counts as a declarative
    * complete-mode aggregation, then [[haarTail]] over the final hour
    * table — same oracle as the batch query. */
  private def haarStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingPipelines
    val per = StreamingPipelines.eventStream(spark, dir)
      .select(col("event_type"), expr("ems div 3600000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
    val sink = StreamingPipelines.runToMemory(spark, per, "complete", "haar")
    haarTail(sink)
  }

  // --------------------------------------------- HITS hubs/authorities
  /** HITS (Kleinberg) on the DIRECTED supplier→customer trade graph
    * (supplier s supplied an order of customer c): authorities a = Eᵀh,
    * hubs h = Ea, 3 synchronous rounds, each side max-normalized back to
    * the 10⁹ fixed-point scale with integer `div` — the mutual-
    * reinforcement + per-round normalization structure PageRank's
    * single teleport walk doesn't have. The raw sums are exact BIGINTs
    * (≤ deg·10⁹); the normalizing multiply runs in DECIMAL(38,0) before
    * the div so the ANSI bound is 10³⁸. Both engines walk the identical
    * all-integer trajectory.
    *
    * Scale shape: per round, one shuffle keyed on each side of the edge
    * table (the standard message-passing agg) + a broadcast scalar max;
    * node/edge tables are dimension-bounded, ranks localCheckpoint'd so
    * the 3-round plan doesn't nest. */
  private def hits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Scale = 1000000000L
    // shared session-cached directed pair set (round 14, TradeGraph) —
    // already localCheckpoint'd, so the 3 HITS rounds replan against a
    // leaf and nothing needs a persist() pin or release
    val rel = graft.queries.TradeGraph.rawPairs(spark, dir)
      .select(col("s"), col("c"))
    var hub = rel.select($"s".as("id")).distinct()
      .select($"id", lit(Scale).as("sc")).localCheckpoint(true)
    var auth: DataFrame = null
    for (_ <- 1 to 3) {
      val araw = rel.join(hub, rel("s") === hub("id"))
        .groupBy($"c".as("id")).agg(sum($"sc").as("raw"))
      val amax = araw.agg(max($"raw").as("mx"))
      auth = araw.crossJoin(broadcast(amax))
        .select($"id",
          expr(s"(cast(raw as decimal(38,0)) * ${Scale}L) div mx").as("sc"))
        .localCheckpoint(true)
      val hraw = rel.join(auth, rel("c") === auth("id"))
        .groupBy($"s".as("id")).agg(sum($"sc").as("raw"))
      val hmax = hraw.agg(max($"raw").as("mx"))
      hub = hraw.crossJoin(broadcast(hmax))
        .select($"id",
          expr(s"(cast(raw as decimal(38,0)) * ${Scale}L) div mx").as("sc"))
        .localCheckpoint(true)
    }
    val top = (df: DataFrame, role: String) => df
      .select(lit(role).as("role"),
        row_number().over(Window.orderBy($"sc".desc, $"id"))
          .cast("long").as("rank"),
        $"id", $"sc".as("score"))
      .filter($"rank" <= 10)
    top(hub, "hub").unionByName(top(auth, "auth")).orderBy($"role", $"rank")
  }

  private val hitsSql = {
    val rounds = (1 to 3).map { r =>
      s"""a${r}raw AS MATERIALIZED (
         |  SELECT c AS id, CAST(SUM(h.sc) AS BIGINT) AS raw
         |  FROM rel JOIN h${r - 1} h ON h.id = rel.s GROUP BY c),
         |a$r AS MATERIALIZED (
         |  SELECT id, CAST(CAST(raw AS HUGEINT) * 1000000000
         |    // (SELECT MAX(raw) FROM a${r}raw) AS BIGINT) AS sc
         |  FROM a${r}raw),
         |h${r}raw AS MATERIALIZED (
         |  SELECT s AS id, CAST(SUM(a.sc) AS BIGINT) AS raw
         |  FROM rel JOIN a$r a ON a.id = rel.c GROUP BY s),
         |h$r AS MATERIALIZED (
         |  SELECT id, CAST(CAST(raw AS HUGEINT) * 1000000000
         |    // (SELECT MAX(raw) FROM h${r}raw) AS BIGINT) AS sc
         |  FROM h${r}raw)""".stripMargin
    }.mkString(",\n")
    s"""WITH rel AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |h0 AS MATERIALIZED (
       |  SELECT DISTINCT s AS id, CAST(1000000000 AS BIGINT) AS sc FROM rel),
       |$rounds,
       |ranked AS (
       |  SELECT 'hub' AS role,
       |    CAST(row_number() OVER (ORDER BY sc DESC, id) AS BIGINT) AS rank,
       |    id, sc AS score FROM h3
       |  UNION ALL
       |  SELECT 'auth' AS role,
       |    CAST(row_number() OVER (ORDER BY sc DESC, id) AS BIGINT) AS rank,
       |    id, sc AS score FROM a3)
       |SELECT role, rank, id, score FROM ranked
       |WHERE rank <= 10 ORDER BY role, rank""".stripMargin
  }

  // ------------------------------- exact two-phase percentile selection
  /** EXACT p50/p90/p99 of order totals by distributed selection — the
    * global-sort-free way to get exact (not approximate) percentiles out
    * of 100 TB: phase 1 builds a $1000-bucket histogram (one shuffle to
    * a price-range-bounded table) and walks its running sum to locate,
    * for each target rank k = ⌈p·n/100⌉, the bucket holding the k-th
    * smallest value and the within-bucket offset; phase 2 ranks ONLY the
    * ≤3 selected buckets (semi-join keeps the scan's filter pushed, the
    * per-bucket sort touches a 1/range fraction of the data). Values are
    * exact integer cents; `value` is the one closing division. Ties
    * across equal cents are positionally arbitrary but the SELECTED
    * value is deterministic — every row at that rank carries the same
    * cents. Oracle brute-forces the same ranks over a full sort. */
  private def exactPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = Tables.orders(spark, dir)
      .select(floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("bucket", expr("cents div 100000"))
    percentileSelect(cents, cents.groupBy($"bucket").agg(count(lit(1)).as("bn")))
  }

  /** The two-phase selection finale over a raw `(cents, bucket)` frame and
    * its `(bucket, bn)` histogram — split out so the streaming twin can
    * feed the histogram from its complete-mode aggregation state while
    * phase 2 ranks the raw table (the same batch-finale contract as the
    * HLL/KMV streaming sketches). */
  private[graft] def percentileSelect(
      cents: DataFrame, hist: DataFrame): DataFrame = {
    val spark = cents.sparkSession
    import spark.implicits._
    // running count over the histogram: bounded by price-range/1000 rows,
    // so the single-partition window is a deliberate small-table choice
    val cum = hist
      .withColumn("chi", sum($"bn").over(
        Window.orderBy($"bucket").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("clo", $"chi" - $"bn")
    val n = hist.agg(sum($"bn").cast("long").as("n"))
    val targets = Seq(50L, 90L, 99L).toDF("p")
      .crossJoin(broadcast(n))
      .withColumn("k", expr("(n * p + 99) div 100"))
    val picked = targets.join(cum, $"k" > $"clo" && $"k" <= $"chi")
      .select($"p", $"n", $"k", $"bucket", ($"k" - $"clo").as("off"))
    val ranked = cents
      .join(broadcast(picked.select($"bucket").distinct()), Seq("bucket"))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"bucket").orderBy($"cents"))
          .cast("long"))
    picked.join(ranked, Seq("bucket"))
      .filter($"rn" === $"off")
      .select($"p", $"n", $"k", $"cents",
        ($"cents".cast("double") / 100.0).as("value"))
      .orderBy($"p")
  }

  private val exactPercentilesSql =
    """WITH c AS (
      |  SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      |  FROM orders
      |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
      |t AS (SELECT p, n, (n * p + 99) // 100 AS k
      |      FROM (VALUES (CAST(50 AS BIGINT)), (90), (99)) v(p), n),
      |r AS (SELECT cents,
      |        CAST(row_number() OVER (ORDER BY cents) AS BIGINT) AS rn
      |      FROM c)
      |SELECT t.p, t.n, t.k, r.cents,
      |  CAST(r.cents AS DOUBLE) / 100.0 AS value
      |FROM t JOIN r ON r.rn = t.k
      |ORDER BY t.p""".stripMargin

  /** Streaming exact percentiles: the $10-bucket histogram of event
    * `value` cents maintained as a DECLARATIVE complete-mode streaming
    * aggregation (counts are algebraic — the engine's own state store,
    * no custom state machine), then the [[percentileSelect]] finale
    * locates each target rank's bucket from the streamed histogram and
    * ranks ONLY those buckets of the batch table — the same
    * batch-finale contract as the HLL/KMV streaming sketches. At 100 TB
    * the stream maintains a bounded histogram forever and phase 2
    * touches a 1/range fraction of the store on demand. */
  private def percentilesStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingPipelines
    val hist = StreamingPipelines.eventStream(spark, dir)
      .select(expr("cast(floor(value * 100.0 + 0.5) as bigint)").as("cents"))
      .withColumn("bucket", expr("cents div 1000"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("bn"))
    val sink = StreamingPipelines.runToMemory(spark, hist, "complete", "pctl")
    val cents = ev(spark, dir)
      .select(floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("bucket", expr("cents div 1000"))
    percentileSelect(cents, sink)
  }

  private val evtPercentilesSql =
    """WITH c AS (
      |  SELECT CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
      |t AS (SELECT p, n, (n * p + 99) // 100 AS k
      |      FROM (VALUES (CAST(50 AS BIGINT)), (90), (99)) v(p), n),
      |r AS (SELECT cents,
      |        CAST(row_number() OVER (ORDER BY cents) AS BIGINT) AS rn
      |      FROM c)
      |SELECT t.p, t.n, t.k, r.cents,
      |  CAST(r.cents AS DOUBLE) / 100.0 AS value
      |FROM t JOIN r ON r.rn = t.k
      |ORDER BY t.p""".stripMargin

  // --------------------------------------- PCA top component (power iter)
  /** Top principal component of the embedding corpus by POWER ITERATION
    * in exact integer arithmetic — distributed linear algebra without a
    * single float accumulation: embeddings quantized to micro ints (the
    * emb-family convention), the 64×64 scatter matrix by the centered
    * identity C = n·Σqqᵀ − (Σq)(Σq)ᵀ (DECIMAL(38,0) — exact, no mean
    * subtraction roundoff), then 4 iterations of v ← C·v with the HITS
    * normalization trick: sign·((|w|·10⁶) div max|w|) keeps every state
    * integer, so both engines walk the identical trajectory. Output is
    * the normalized loading vector plus the Rayleigh quotient (two
    * closing double casts, one division).
    *
    * Scale shape: ONE pass computes the d² moment matrix via map-side
    * partial aggregation (n·d² products reduced to d² cells — the
    * standard distributed covariance); the iterations run on the
    * d²-bounded cell table with broadcast max scalars, ranks
    * localCheckpoint'd. d = 64 here; the shape holds for any d where
    * d² fits one executor (d ≈ 10⁴+). */
  private def pcaPower(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (c, v) = pcaTopFor(spark, dir)
    val ray = c.join(broadcast(v.select($"i".as("j"), $"v".as("vj"))),
        Seq("j"))
      .join(broadcast(v.select($"i", $"v".as("vi"))), Seq("i"))
      .agg((sum($"vi".cast(DecimalType(38, 0)) * $"cij" * $"vj").cast("double")
        / lit(1000000000000.0)).as("num"))
    val den = v.agg((sum($"v".cast(DecimalType(38, 0)) * $"v").cast("double")
      / lit(1000000000000.0)).as("den"))
    val out = v.crossJoin(broadcast(ray)).crossJoin(broadcast(den))
      .select($"i".cast("long").as("dim"), $"v".as("v_scaled"),
        ($"v".cast("double") / 1000000.0).as("loading"),
        ($"num" / $"den").as("rayleigh"))
      .orderBy($"dim")
    out // c stays resident in the session chain cache (d²-bounded)
  }

  /** Shared by the whole PCA family via [[pcaTopFor]]: the exact-integer
    * centered scatter matrix and the 4-round integer power iterate v1
    * (scale 10⁶) — both localCheckpointed, retained for the session by
    * the chain cache (d²-bounded tables, trivial residency). */
  private def pcaScatterTop(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val q = Tables.embeddings(spark, dir)
      .select($"vec_id",
        posexplode(expr(
          "transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0) as bigint))"))
          .as(Seq("i", "qv")))
    val n = Tables.embeddings(spark, dir).count()
    val s = q.groupBy($"i").agg(sum($"qv").as("si"))
    val cr = q.select($"vec_id", $"i", $"qv")
      .join(q.select($"vec_id", $"i".as("j"), $"qv".as("qw")), Seq("vec_id"))
      .groupBy($"i", $"j")
      .agg(sum($"qv".cast(DecimalType(38, 0)) * $"qw").as("sqq"))
    // coalesce(1): the d² cell table is 4096 rows — every one of the 8+
    // downstream iteration joins scans it, and 32 near-empty tasks per
    // round cost more scheduling than the rows (measured: the deflate
    // chain's 10 s was task overhead, not arithmetic).
    // localCheckpoint, NOT persist: the repo's iterative-algorithm rule —
    // persist caches the data but every downstream round still carries
    // (and re-optimizes) the full nested logical plan; truncating here
    // is what keeps the chained-deflation queries' driver time flat in
    // the number of components (measured: emb_pca_third 20 s → 6 s).
    val c = cr
      .join(s.select($"i", $"si"), Seq("i"))
      .join(s.select($"i".as("j"), $"si".as("sj")), Seq("j"))
      .select($"i", $"j",
        (lit(n) * $"sqq" - $"si".cast(DecimalType(38, 0)) * $"sj").as("cij"))
      .coalesce(1)
      .localCheckpoint(true)
    var v = s.select($"i", lit(1000000L).as("v")).localCheckpoint(true)
    for (_ <- 1 to 4) {
      val w = c.join(broadcast(v.select($"i".as("j"), $"v")), Seq("j"))
        .groupBy($"i").agg(sum($"cij" * $"v").as("wi"))
      val m = w.agg(max(abs($"wi")).as("mx"))
      v = w.crossJoin(broadcast(m))
        .select($"i",
          (signum($"wi").cast("long") *
            expr("(cast(abs(wi) as decimal(38,0)) * 1000000L) div mx"))
            .as("v"))
        .localCheckpoint(true)
    }
    (c, v)
  }

  // ------------------------------------ PCA second component (deflation)
  /** SECOND principal component by WIELANDT DEFLATION in the same exact
    * integer arithmetic as [[pcaPower]] — the round-9 backlog marked
    * this "likely unreachable" because textbook deflation
    * C₂ = C − λ·vvᵀ needs the irrational λ and unit v; the reachable
    * form is the rational Wielandt matrix D = d·C − uuᵀ with u = C·v₁
    * and d = v₁ᵀC·v₁ (all integers): D annihilates v₁ EXACTLY
    * (D·v₁ = d·u − u·d = 0) and is a positive multiple of the
    * λ-deflated matrix when v₁ is exact, so power iteration on D walks
    * to the second component. What makes it fit DECIMAL(38,0)/HUGEINT
    * are two DETERMINISTIC integer rescales — sign·(abs div
    * (max div 10⁹ + 1)) — applied to C before deflation and to D
    * after: uniform scaling preserves eigenvectors, the div truncation
    * is identical in both engines (the same reason the HITS/pcaPower
    * normalization is exact), and the guard is data-derived so the
    * bound holds at ANY corpus size. v₁ enters at scale 10³ (not 10⁶)
    * to keep d = v₁ᵀCv₁ under 10¹⁹. Output: the second loading vector,
    * its Rayleigh quotient on D (double, two fixed divisions), and the
    * exact integer dot product with v₁ — the orthogonality audit both
    * engines must agree on bit-for-bit. Scale shape identical to
    * pcaPower: everything after the one d²-cell scatter pass operates
    * on d²-bounded tables with broadcast scalars.
    *
    * Honest convergence note (measured vs numpy.linalg.eigh at sf0.01):
    * this corpus is near-isotropic — λ₁/λ₂ = 1.013, λ₂/λ₃ = 1.02 — so
    * NO iteration count separates individual eigenvectors (0.98^t decay);
    * what 4 rounds deliver, and what the query claims, is a
    * near-orthogonal high-variance direction of the deflated subspace:
    * cos(v₂,v₁) = 1.7e-4 and Rayleigh(v₂) = 0.91·λ₂ (pcaPower's v₁
    * captures 0.86·λ₁ under the same flatness). On a corpus with a real
    * spectral gap the same trajectory converges geometrically. */
  private def pcaDeflate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, v1) = pcaTopFor(spark, dir)
    val (dm, x) = pcaDeflFor(spark, dir)
    val vk = v1.select($"i",
      (signum($"v").cast("long") * expr("abs(v) div 1000L")).as("vk"))
    val ray = dm.join(broadcast(x.select($"i".as("j"), $"v".as("vj"))),
        Seq("j"))
      .join(broadcast(x.select($"i", $"v".as("vi"))), Seq("i"))
      .agg((sum($"vi".cast(DecimalType(38, 0)) * $"dkij" * $"vj")
        .cast("double") / lit(1000000000000.0)).as("num"))
    val den = x.agg((sum($"v".cast(DecimalType(38, 0)) * $"v").cast("double")
      / lit(1000000000000.0)).as("den"))
    val dot = x.join(vk, Seq("i"))
      .agg(sum($"v".cast(DecimalType(38, 0)) * $"vk").cast("long")
        .as("dot_v1"))
    val out = x.crossJoin(broadcast(ray)).crossJoin(broadcast(den))
      .crossJoin(broadcast(dot))
      .select($"i".cast("long").as("dim"), $"v".cast("long").as("v_scaled"),
        ($"v".cast("double") / 1000000.0).as("loading"),
        ($"num" / $"den").as("rayleigh"), $"dot_v1")
      .orderBy($"dim")
    out // chain frames stay resident in the session cache
  }

  private def pcaRescale(df: DataFrame, valCol: String, outCol: String)
      : DataFrame = {
    val m = df.agg(max(abs(col(valCol))).as("m"))
      .select((expr("m div 1000000000") + lit(1L))
        .cast(DecimalType(38, 0)).as("scl"))
    df.crossJoin(broadcast(m))
      .withColumn(outCol,
        signum(col(valCol)).cast("long") *
          expr(s"abs($valCol) div scl"))
      .drop("scl", valCol)
  }

  /** One Wielandt deflation + 4-round power iteration on an already-
    * rescaled integer matrix `m` (cols i, j, `valCol` ≤ ~10⁹) against
    * iterate `v` (cols i, v at scale 10⁶): returns (deflated matrix —
    * rescaled back under 10⁹, coalesced + persisted, caller releases —
    * with cell column `dkij`, and its top 4-round iterate). The bound
    * closure (rescale in ⇒ rescale out) is what makes the construction
    * iterable to ANY component depth inside DECIMAL(38,0)/HUGEINT. */
  private def pcaDeflateOnce(m: DataFrame, valCol: String, v: DataFrame)
      : (DataFrame, DataFrame) = {
    import m.sparkSession.implicits._
    val vk = v.select($"i",
      (signum($"v").cast("long") * expr("abs(v) div 1000L")).as("vk"))
    val u = m.join(broadcast(vk.select($"i".as("j"), $"vk")), Seq("j"))
      .groupBy($"i")
      .agg(sum(col(valCol).cast(DecimalType(38, 0)) * $"vk").as("ui"))
    val d = u.join(vk, Seq("i"))
      .agg(sum($"ui" * $"vk").as("d"))
    val dm = pcaRescale(
      m.join(broadcast(u.select($"i", $"ui")), Seq("i"))
        .join(broadcast(u.select($"i".as("j"), $"ui".as("uj"))), Seq("j"))
        .crossJoin(broadcast(d))
        .select($"i", $"j",
          ($"d" * col(valCol).cast(DecimalType(38, 0)) - $"ui" * $"uj")
            .as("dij")),
      "dij", "dkij")
      .coalesce(1)
      .localCheckpoint(true) // lineage truncation per level (see scatter)
    var x = dm.select($"i").distinct()
      .select($"i", ($"i".cast("long") + 1L).as("v")).localCheckpoint(true)
    for (_ <- 1 to 4) {
      val w = dm.join(broadcast(x.select($"i".as("j"), $"v")), Seq("j"))
        .groupBy($"i")
        .agg(sum($"dkij".cast(DecimalType(38, 0)) * $"v").as("wi"))
      val mx = w.agg(max(abs($"wi")).as("mx"))
      x = w.crossJoin(broadcast(mx))
        .select($"i",
          (signum($"wi").cast("long") *
            expr("(cast(abs(wi) as decimal(38,0)) * 1000000L) div mx"))
            .as("v"))
        .localCheckpoint(true)
    }
    (dm, x)
  }

  /** Session-scoped PCA chain cache (round-14, the funnelFlags pattern):
    * all four emb_pca_* queries walk a strict prefix of ONE deflation
    * chain — scatter+v₁ ⊂ (dm, v₂) ⊂ (dm₂, v₃) — but each used to
    * rebuild its prefix per invocation (the family was ~17 s of the
    * suite, almost all of it driver-iteration rounds repeated 2–4×).
    * The chain is cached per (session, dir) in three lazily-built
    * levels, so emb_pca_power never pays for a deflation it does not
    * use, and the deflate/project/third finales reduce to d-bounded
    * joins over frames that already exist. Every cached frame is
    * localCheckpoint'd (the pinned-matrix rule) and d²-bounded — 4096
    * cells + 64-row iterates per level — so session residency is
    * trivial; SessionKeys keying means a dead session's blocks can
    * never be served to a new one. */
  private val pcaTopCache =
    new scala.collection.concurrent.TrieMap[String, (DataFrame, DataFrame)]()
  private val pcaDeflCache =
    new scala.collection.concurrent.TrieMap[String, (DataFrame, DataFrame)]()
  private val pcaThirdCache =
    new scala.collection.concurrent.TrieMap[String, (DataFrame, DataFrame)]()

  /** (scatter c, first iterate v1), built once per (session, dir). */
  private def pcaTopFor(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    pcaTopCache.getOrElseUpdate(
      s"${graft.core.SessionKeys.of(spark)}@$dir",
      pcaScatterTop(spark, dir))

  /** (deflated matrix dm, second iterate v2) — level 2 of the chain. */
  private def pcaDeflFor(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    pcaDeflCache.getOrElseUpdate(
      s"${graft.core.SessionKeys.of(spark)}@$dir", {
        val (c, v1) = pcaTopFor(spark, dir)
        val ck = pcaRescale(c, "cij", "ckij")
        pcaDeflateOnce(ck, "ckij", v1)
      })

  /** (twice-deflated matrix dm2, third iterate v3) — level 3. */
  private def pcaThirdFor(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    pcaThirdCache.getOrElseUpdate(
      s"${graft.core.SessionKeys.of(spark)}@$dir", {
        val (dm, v2) = pcaDeflFor(spark, dir)
        pcaDeflateOnce(dm, "dkij", v2)
      })

  // ------------------------------------- PCA third component (chained)
  /** THIRD principal component by CHAINED Wielandt deflation — the proof
    * that [[pcaDeflateOnce]]'s bound closure (rescaled matrix in ⇒
    * rescaled matrix out) makes the construction iterable to any top-k
    * in exact integer arithmetic: the identical step applied to the
    * already-deflated matrix against its own iterate. Output carries
    * BOTH integer dot-product audits (v₃·v₁k and v₃·v₂k — the second is
    * an exact-annihilation check, the first decays through one extra
    * truncation layer; both graded bit-for-bit). The same near-isotropy
    * caveat as [[pcaDeflate]] applies to the direction; the audits and
    * the trajectory are the graded content. */
  private def pcaThird(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, v1) = pcaTopFor(spark, dir)
    val (_, v2) = pcaDeflFor(spark, dir)
    val (dm2, v3) = pcaThirdFor(spark, dir)
    def kOf(v: DataFrame, out: String) = v.select($"i",
      (signum($"v").cast("long") * expr("abs(v) div 1000L")).as(out))
    val dot1 = v3.join(kOf(v1, "vk"), Seq("i"))
      .agg(sum($"v".cast(DecimalType(38, 0)) * $"vk").cast("long")
        .as("dot_v1"))
    val dot2 = v3.join(kOf(v2, "vk2"), Seq("i"))
      .agg(sum($"v".cast(DecimalType(38, 0)) * $"vk2").cast("long")
        .as("dot_v2"))
    val ray = dm2.join(broadcast(v3.select($"i".as("j"), $"v".as("vj"))),
        Seq("j"))
      .join(broadcast(v3.select($"i", $"v".as("vi"))), Seq("i"))
      .agg((sum($"vi".cast(DecimalType(38, 0)) * $"dkij" * $"vj")
        .cast("double") / lit(1000000000000.0)).as("num"))
    val den = v3.agg((sum($"v".cast(DecimalType(38, 0)) * $"v")
      .cast("double") / lit(1000000000000.0)).as("den"))
    val out = v3.crossJoin(broadcast(ray)).crossJoin(broadcast(den))
      .crossJoin(broadcast(dot1)).crossJoin(broadcast(dot2))
      .select($"i".cast("long").as("dim"), $"v".cast("long").as("v_scaled"),
        ($"v".cast("double") / 1000000.0).as("loading"),
        ($"num" / $"den").as("rayleigh"), $"dot_v1", $"dot_v2")
      .orderBy($"dim")
    out // chain frames stay resident in the session cache
  }

  private lazy val pcaThirdSql = {
    val rounds = (1 to 4).map { r =>
      s"""g$r AS MATERIALIZED (
         |  SELECT dm2.i, SUM(dm2.dkij * z.v) AS wi
         |  FROM dm2 JOIN z${r - 1} z ON z.i = dm2.j GROUP BY dm2.i),
         |z$r AS MATERIALIZED (
         |  SELECT i, CAST(CASE WHEN wi < 0 THEN -1 WHEN wi > 0 THEN 1
         |      ELSE 0 END AS HUGEINT)
         |    * ((abs(wi) * 1000000) // (SELECT MAX(abs(wi)) FROM g$r)) AS v
         |  FROM g$r)""".stripMargin
    }.mkString(",\n")
    s"""$pcaDeflatePrefixSql,
       |vk2 AS (
       |  SELECT i, CAST(CASE WHEN v < 0 THEN -1 WHEN v > 0 THEN 1
       |      ELSE 0 END AS HUGEINT) * (abs(v) // 1000) AS vk
       |  FROM x4),
       |u2 AS MATERIALIZED (
       |  SELECT dm.i, SUM(dm.dkij * vk2.vk) AS ui
       |  FROM dm JOIN vk2 ON vk2.i = dm.j GROUP BY dm.i),
       |dd2 AS (SELECT SUM(u2.ui * vk2.vk) AS d
       |        FROM u2 JOIN vk2 ON vk2.i = u2.i),
       |dr2 AS MATERIALIZED (
       |  SELECT dm.i, dm.j,
       |    (SELECT d FROM dd2) * dm.dkij - ui.ui * uj.ui AS dij
       |  FROM dm JOIN u2 ui ON ui.i = dm.i JOIN u2 uj ON uj.i = dm.j),
       |dscl2 AS (SELECT MAX(abs(dij)) // 1000000000 + 1 AS sc FROM dr2),
       |dm2 AS MATERIALIZED (
       |  SELECT i, j, CAST(CASE WHEN dij < 0 THEN -1 WHEN dij > 0 THEN 1
       |      ELSE 0 END AS HUGEINT)
       |    * (abs(dij) // (SELECT sc FROM dscl2)) AS dkij
       |  FROM dr2),
       |z0 AS (SELECT i, CAST(i + 1 AS HUGEINT) AS v
       |       FROM (SELECT unnest(range(64)) AS i)),
       |$rounds,
       |ray3 AS (
       |  SELECT CAST(SUM(vi.v * dm2.dkij * vj.v) AS DOUBLE)
       |      / 1000000000000.0 AS num
       |  FROM dm2 JOIN z4 vj ON vj.i = dm2.j JOIN z4 vi ON vi.i = dm2.i),
       |den3 AS (
       |  SELECT CAST(SUM(v * v) AS DOUBLE) / 1000000000000.0 AS den FROM z4),
       |dt1 AS (SELECT CAST(SUM(z4.v * vk.vk) AS BIGINT) AS dot_v1
       |        FROM z4 JOIN vk ON vk.i = z4.i),
       |dt2 AS (SELECT CAST(SUM(z4.v * vk2.vk) AS BIGINT) AS dot_v2
       |        FROM z4 JOIN vk2 ON vk2.i = z4.i)
       |SELECT CAST(z4.i AS BIGINT) AS dim, CAST(z4.v AS BIGINT) AS v_scaled,
       |  CAST(z4.v AS DOUBLE) / 1000000.0 AS loading,
       |  ray3.num / den3.den AS rayleigh, dt1.dot_v1, dt2.dot_v2
       |FROM z4 CROSS JOIN ray3 CROSS JOIN den3 CROSS JOIN dt1 CROSS JOIN dt2
       |ORDER BY dim""".stripMargin
  }

  // ----------------------------------------- PCA 2-D projection features
  /** Project every embedding onto the two integer principal directions —
    * the dimensionality-reduction DELIVERABLE the two component queries
    * exist for (64 floats → 2 coordinates per vector, the features a
    * downstream trainer or a UMAP-style plot consumes). Coordinates are
    * EXACT BIGINTs: coordₖ = Σᵢ qᵢ·vₖᵢ with micro-quantized qᵢ and the
    * 10⁶-scaled integer loading vectors, so the oracle re-walks both
    * component trajectories and must reproduce every coordinate
    * bit-for-bit (|coord| ≤ 64·|q|·10⁶ ≈ 3·10¹³ — BIGINT-safe at any
    * embedding magnitude that fits the micro quantization). One extra
    * d-wide join pass over the quantized table; everything upstream is
    * the shared scatter/deflation machinery. */
  private def pcaProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, v1) = pcaTopFor(spark, dir)
    val (_, v2) = pcaDeflFor(spark, dir)
    val q = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label",
        posexplode(expr(
          "transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0) as bigint))"))
          .as(Seq("i", "qv")))
    val out = q
      .join(broadcast(v1.select($"i", $"v".as("w1"))), Seq("i"))
      .join(broadcast(v2.select($"i", $"v".as("w2"))), Seq("i"))
      .groupBy($"vec_id", $"label")
      .agg(sum($"qv".cast(DecimalType(38, 0)) * $"w1").cast("long")
          .as("coord1"),
        sum($"qv".cast(DecimalType(38, 0)) * $"w2").cast("long")
          .as("coord2"))
      .select($"vec_id", $"label".cast("long").as("label"),
        $"coord1", $"coord2")
      .orderBy($"vec_id")
    out // chain frames stay resident in the session cache
  }

  private lazy val pcaProjectSql =
    s"""$pcaDeflatePrefixSql
       |SELECT q.vec_id,
       |  CAST(ANY_VALUE(e.label) AS BIGINT) AS label,
       |  CAST(SUM(q.qv * v4.v) AS BIGINT) AS coord1,
       |  CAST(SUM(q.qv * x4.v) AS BIGINT) AS coord2
       |FROM q
       |JOIN v4 ON v4.i = q.i
       |JOIN x4 ON x4.i = q.i
       |JOIN embeddings e ON e.vec_id = q.vec_id
       |GROUP BY q.vec_id
       |ORDER BY q.vec_id""".stripMargin

  /** Prefix chain through BOTH component iterates (v4 = first, x4 =
    * second) — shared by the pcaDeflate and pcaProject oracles. */
  private lazy val pcaDeflatePrefixSql = {
    val rounds = (1 to 4).map { r =>
      s"""y$r AS MATERIALIZED (
         |  SELECT dm.i, SUM(dm.dkij * x.v) AS wi
         |  FROM dm JOIN x${r - 1} x ON x.i = dm.j GROUP BY dm.i),
         |x$r AS MATERIALIZED (
         |  SELECT i, CAST(CASE WHEN wi < 0 THEN -1 WHEN wi > 0 THEN 1
         |      ELSE 0 END AS HUGEINT)
         |    * ((abs(wi) * 1000000) // (SELECT MAX(abs(wi)) FROM y$r)) AS v
         |  FROM y$r)""".stripMargin
    }.mkString(",\n")
    s"""$pcaPrefixSql,
       |scl AS (SELECT MAX(abs(cij)) // 1000000000 + 1 AS sc FROM c),
       |ck AS MATERIALIZED (
       |  SELECT i, j, CAST(CASE WHEN cij < 0 THEN -1 WHEN cij > 0 THEN 1
       |      ELSE 0 END AS HUGEINT)
       |    * (abs(cij) // (SELECT sc FROM scl)) AS ckij
       |  FROM c),
       |vk AS (
       |  SELECT i, CAST(CASE WHEN v < 0 THEN -1 WHEN v > 0 THEN 1
       |      ELSE 0 END AS HUGEINT) * (abs(v) // 1000) AS vk
       |  FROM v4),
       |u AS MATERIALIZED (
       |  SELECT ck.i, SUM(ck.ckij * vk.vk) AS ui
       |  FROM ck JOIN vk ON vk.i = ck.j GROUP BY ck.i),
       |dd AS (SELECT SUM(u.ui * vk.vk) AS d FROM u JOIN vk ON vk.i = u.i),
       |dr AS MATERIALIZED (
       |  SELECT ck.i, ck.j,
       |    (SELECT d FROM dd) * ck.ckij - ui.ui * uj.ui AS dij
       |  FROM ck JOIN u ui ON ui.i = ck.i JOIN u uj ON uj.i = ck.j),
       |dscl AS (SELECT MAX(abs(dij)) // 1000000000 + 1 AS sc FROM dr),
       |dm AS MATERIALIZED (
       |  SELECT i, j, CAST(CASE WHEN dij < 0 THEN -1 WHEN dij > 0 THEN 1
       |      ELSE 0 END AS HUGEINT)
       |    * (abs(dij) // (SELECT sc FROM dscl)) AS dkij
       |  FROM dr),
       |x0 AS (SELECT i, CAST(i + 1 AS HUGEINT) AS v
       |       FROM (SELECT unnest(range(64)) AS i)),
       |$rounds""".stripMargin
  }

  private lazy val pcaDeflateSql =
    s"""$pcaDeflatePrefixSql,
       |ray AS (
       |  SELECT CAST(SUM(vi.v * dm.dkij * vj.v) AS DOUBLE) / 1000000000000.0
       |    AS num
       |  FROM dm JOIN x4 vj ON vj.i = dm.j JOIN x4 vi ON vi.i = dm.i),
       |den AS (
       |  SELECT CAST(SUM(v * v) AS DOUBLE) / 1000000000000.0 AS den FROM x4),
       |dot AS (
       |  SELECT CAST(SUM(x4.v * vk.vk) AS BIGINT) AS dot_v1
       |  FROM x4 JOIN vk ON vk.i = x4.i)
       |SELECT CAST(x4.i AS BIGINT) AS dim, CAST(x4.v AS BIGINT) AS v_scaled,
       |  CAST(x4.v AS DOUBLE) / 1000000.0 AS loading,
       |  ray.num / den.den AS rayleigh, dot.dot_v1
       |FROM x4 CROSS JOIN ray CROSS JOIN den CROSS JOIN dot
       |ORDER BY dim""".stripMargin

  /** The q → scatter → v0..v4 CTE chain shared by the pcaPower and
    * pcaDeflate oracles (both walk the identical first-component
    * trajectory before diverging). */
  private lazy val pcaPrefixSql = {
    val rounds = (1 to 4).map { r =>
      s"""w$r AS MATERIALIZED (
         |  SELECT c.i, SUM(c.cij * v.v) AS wi
         |  FROM c JOIN v${r - 1} v ON v.i = c.j GROUP BY c.i),
         |v$r AS MATERIALIZED (
         |  SELECT i, CAST(CASE WHEN wi < 0 THEN -1 WHEN wi > 0 THEN 1
         |      ELSE 0 END AS HUGEINT)
         |    * ((abs(wi) * 1000000) // (SELECT MAX(abs(wi)) FROM w$r)) AS v
         |  FROM w$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id, i,
       |    CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 1000000.0) AS BIGINT)
       |      AS qv
       |  FROM embeddings, (SELECT unnest(range(64)) AS i)
       |), n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM embeddings),
       |s AS MATERIALIZED (
       |  SELECT i, CAST(SUM(qv) AS HUGEINT) AS si FROM q GROUP BY i),
       |cr AS MATERIALIZED (
       |  SELECT a.i AS i, b.i AS j, SUM(CAST(a.qv AS HUGEINT) * b.qv) AS sqq
       |  FROM q a JOIN q b USING (vec_id) GROUP BY a.i, b.i),
       |c AS MATERIALIZED (
       |  SELECT cr.i, cr.j, n.n * cr.sqq - si.si * sj.si AS cij
       |  FROM cr CROSS JOIN n
       |  JOIN s si ON si.i = cr.i JOIN s sj ON sj.i = cr.j),
       |v0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS v
       |       FROM (SELECT unnest(range(64)) AS i)),
       |$rounds""".stripMargin
  }

  private val pcaPowerSql = {
    s"""$pcaPrefixSql,
       |ray AS (
       |  SELECT CAST(SUM(vi.v * c.cij * vj.v) AS DOUBLE) / 1000000000000.0
       |    AS num
       |  FROM c JOIN v4 vj ON vj.i = c.j JOIN v4 vi ON vi.i = c.i),
       |den AS (
       |  SELECT CAST(SUM(v * v) AS DOUBLE) / 1000000000000.0 AS den FROM v4)
       |SELECT CAST(i AS BIGINT) AS dim, CAST(v AS BIGINT) AS v_scaled,
       |  CAST(v AS DOUBLE) / 1000000.0 AS loading,
       |  ray.num / den.den AS rayleigh
       |FROM v4 CROSS JOIN ray CROSS JOIN den
       |ORDER BY dim""".stripMargin
  }

  // ------------------------------------------------ forward as-of join
  /** Forward as-of join (pandas merge_asof direction='forward'): each
    * purchase gets the EARLIEST click of the same user at-or-after the
    * purchase instant, null-gated to a 1-hour tolerance — the time-mirror
    * of evt_asof_join, via [[graft.operators.AsOfJoin.forwardAsOf]]'s
    * union-sort shape (one shuffle on user_id, |L|+|R| rows, no per-left
    * explosion; the oracle's join-then-min form IS the explosion the
    * operator avoids). Tolerance applies as a projection on the matched
    * ts the payload carries. */
  private def asofForward(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ems")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ems".as("c_ems"))
    graft.operators.AsOfJoin.forwardAsOf(
        purchases, clicks, Seq("user_id"), "ems", "c_ems",
        rightCols = Seq("c_ems"), tieBreak = "c_ems")
      .withColumn("next_click_ems",
        when($"c_ems" - $"ems" <= 3600000L, $"c_ems"))
      .select($"user_id", $"event_id", $"ems",
        $"next_click_ems",
        ($"next_click_ems" - $"ems").as("gap_ms"))
      .orderBy($"event_id")
  }

  private val asofForwardSql =
    """WITH p AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ems FROM events
      |  WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, epoch_ms(ts) AS ems FROM events
      |  WHERE event_type = 'click'
      |), m AS (
      |  SELECT p.user_id, p.event_id, p.ems,
      |    CAST(MIN(c.ems) AS BIGINT) AS next_ems
      |  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ems >= p.ems
      |  GROUP BY p.user_id, p.event_id, p.ems
      |)
      |SELECT user_id, event_id, ems,
      |  CASE WHEN next_ems - ems <= 3600000 THEN next_ems END
      |    AS next_click_ems,
      |  CASE WHEN next_ems - ems <= 3600000 THEN next_ems - ems END
      |    AS gap_ms
      |FROM m ORDER BY event_id""".stripMargin

  // ------------------------------------------------ NEAREST as-of join
  /** Nearest-direction as-of join (round 11,
    * [[graft.operators.AsOfJoin.nearestAsOf]]): each purchase attaches
    * the user's click CLOSEST in time in EITHER direction — the pandas
    * merge_asof(direction='nearest') semantics completing the
    * backward/forward trio, with ties to the backward side and a 24 h
    * tolerance applied downstream as a projection on the carried click
    * ts. One union-sort shuffle; the two directional carries are
    * consecutive Sorts over the same Exchange. Signed gap_ms keeps the
    * chosen direction visible (≤0 backward, >0 forward). */
  private def asofNearest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ems")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ems".as("c_ems"))
    graft.operators.AsOfJoin.nearestAsOf(
        purchases, clicks, Seq("user_id"), "ems", "c_ems",
        rightCols = Seq("c_ems"), tieBreak = "c_ems")
      .withColumn("near_click_ems",
        when(abs($"c_ems" - $"ems") <= 86400000L, $"c_ems"))
      .select($"user_id", $"event_id", $"ems",
        $"near_click_ems",
        ($"near_click_ems" - $"ems").as("gap_ms"))
      .orderBy($"event_id")
  }

  private val asofNearestSql =
    """WITH p AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ems FROM events
      |  WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, epoch_ms(ts) AS ems FROM events
      |  WHERE event_type = 'click'
      |), m AS (
      |  SELECT p.user_id, p.event_id, p.ems,
      |    CAST(MAX(CASE WHEN c.ems <= p.ems THEN c.ems END) AS BIGINT) AS b_ems,
      |    CAST(MIN(CASE WHEN c.ems >= p.ems THEN c.ems END) AS BIGINT) AS f_ems
      |  FROM p LEFT JOIN c ON c.user_id = p.user_id
      |  GROUP BY p.user_id, p.event_id, p.ems
      |), pick AS (
      |  SELECT user_id, event_id, ems,
      |    CASE WHEN b_ems IS NULL THEN f_ems
      |         WHEN f_ems IS NULL THEN b_ems
      |         WHEN ems - b_ems <= f_ems - ems THEN b_ems
      |         ELSE f_ems END AS near_ems
      |  FROM m
      |)
      |SELECT user_id, event_id, ems,
      |  CASE WHEN ABS(near_ems - ems) <= 86400000 THEN near_ems END
      |    AS near_click_ems,
      |  CASE WHEN ABS(near_ems - ems) <= 86400000 THEN near_ems - ems END
      |    AS gap_ms
      |FROM pick ORDER BY event_id""".stripMargin

  // ------------------------------------- permutation feature importance
  /** Permutation importance of `value` for the event-type-vs-rest labels:
    * exact Mann-Whitney AUC (the ml_feature_auc doubled-midrank algebra)
    * on the real (label, value) pairing MINUS the AUC after the pairing
    * is broken by a deterministic md5-driven permutation — the
    * model-free importance = how much of the ranking signal survives
    * when the feature is shuffled (≈0 after shuffling ⇒ the original
    * AUC was real signal, not class-imbalance artifact).
    *
    * The permutation is BUCKET-LOCAL (64 md5 buckets; labels re-ranked
    * by md5(id||'a'), values by md5(id||'b'), re-paired on
    * (bucket, rank)): a composition of disjoint within-bucket
    * permutations IS a permutation of the whole column, but each bucket
    * permutes inside one shuffle partition — the 100 TB form, where a
    * single global random sort would be the bottleneck. All ranks and
    * moments integer; two closing double divisions + one subtraction,
    * written in the same order in both engines. */
  private def permImportance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
      .select($"event_id", $"event_type", $"value")
      .withColumn("bkt",
        pmod(conv(substring(md5($"event_id".cast("string").cast("binary")),
          1, 8), 16, 10).cast("long"), lit(64L)))
      .withColumn("ha",
        conv(substring(md5(concat($"event_id".cast("string"), lit("a"))
          .cast("binary")), 1, 8), 16, 10).cast("long"))
      .withColumn("hb",
        conv(substring(md5(concat($"event_id".cast("string"), lit("b"))
          .cast("binary")), 1, 8), 16, 10).cast("long"))
    val lab = e.withColumn("rn", row_number().over(
        Window.partitionBy($"bkt").orderBy($"ha", $"event_id")).cast("long"))
      .select($"bkt", $"rn", $"event_type")
    val vals = e.withColumn("rn", row_number().over(
        Window.partitionBy($"bkt").orderBy($"hb", $"event_id")).cast("long"))
      .select($"bkt", $"rn", $"value")
    val perm = lab.join(vals, Seq("bkt", "rn"))
      .select($"event_type", $"value")
    val n = e.count() // driver scalar: total rows (bounded metadata)
    def aucOf(df: DataFrame, out: String): DataFrame = {
      val vt = df.groupBy($"value").agg(count(lit(1)).as("t"))
        .withColumn("c", sum($"t").over(
          Window.orderBy($"value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - $"t")
      val vp = df.groupBy($"value", $"event_type").agg(count(lit(1)).as("pos"))
      vp.join(vt, Seq("value"))
        .groupBy($"event_type")
        .agg(sum($"pos").as("n_pos"),
          sum($"pos" * (lit(2) * $"c" + $"t" + 1)).as("ranksum2"))
        .select($"event_type", $"n_pos".cast("long").as("n_pos"),
          (($"ranksum2" - $"n_pos" * ($"n_pos" + 1)).cast("double") /
            (lit(2L) * $"n_pos" * (lit(n) - $"n_pos")).cast("double"))
            .as(out))
    }
    aucOf(e.select($"event_type", $"value"), "auc")
      .join(aucOf(perm, "auc_perm").drop("n_pos"), Seq("event_type"))
      .withColumn("importance", $"auc" - $"auc_perm")
      .orderBy($"event_type")
  }

  private val permImportanceSql =
    """WITH e AS (
      |  SELECT event_id, event_type, value,
      |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 64 AS bkt,
      |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'a'), 1, 8))
      |      AS BIGINT) AS ha,
      |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'b'), 1, 8))
      |      AS BIGINT) AS hb
      |  FROM events
      |), lab AS (
      |  SELECT bkt, row_number() OVER (PARTITION BY bkt ORDER BY ha, event_id)
      |    AS rn, event_type FROM e
      |), vals AS (
      |  SELECT bkt, row_number() OVER (PARTITION BY bkt ORDER BY hb, event_id)
      |    AS rn, value FROM e
      |), perm AS (
      |  SELECT l.event_type, v.value FROM lab l JOIN vals v USING (bkt, rn)
      |), n AS (SELECT count(*) AS n FROM e),
      |vt1 AS (SELECT value, count(*) AS t FROM e GROUP BY 1),
      |vc1 AS (SELECT value, t, SUM(t) OVER (ORDER BY value
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t AS c FROM vt1),
      |vp1 AS (SELECT value, event_type, count(*) AS pos FROM e GROUP BY 1, 2),
      |a1 AS (
      |  SELECT vp1.event_type, CAST(SUM(vp1.pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(vp1.pos * (2 * vc1.c + vc1.t + 1))
      |         - SUM(vp1.pos) * (SUM(vp1.pos) + 1) AS DOUBLE)
      |      / CAST(2 * SUM(vp1.pos) * (n.n - SUM(vp1.pos)) AS DOUBLE) AS auc
      |  FROM vp1 JOIN vc1 ON vp1.value = vc1.value CROSS JOIN n
      |  GROUP BY vp1.event_type, n.n
      |),
      |vt2 AS (SELECT value, count(*) AS t FROM perm GROUP BY 1),
      |vc2 AS (SELECT value, t, SUM(t) OVER (ORDER BY value
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t AS c FROM vt2),
      |vp2 AS (SELECT value, event_type, count(*) AS pos FROM perm GROUP BY 1, 2),
      |a2 AS (
      |  SELECT vp2.event_type,
      |    CAST(SUM(vp2.pos * (2 * vc2.c + vc2.t + 1))
      |         - SUM(vp2.pos) * (SUM(vp2.pos) + 1) AS DOUBLE)
      |      / CAST(2 * SUM(vp2.pos) * (n.n - SUM(vp2.pos)) AS DOUBLE)
      |      AS auc_perm
      |  FROM vp2 JOIN vc2 ON vp2.value = vc2.value CROSS JOIN n
      |  GROUP BY vp2.event_type, n.n
      |)
      |SELECT a1.event_type, a1.n_pos, a1.auc, a2.auc_perm,
      |  a1.auc - a2.auc_perm AS importance
      |FROM a1 JOIN a2 USING (event_type)
      |ORDER BY a1.event_type""".stripMargin

  // ------------------------------------------------------ ORC roundtrip
  /** ORC write → read → aggregate, completing the format family
    * (csv/json/avro already covered): the events table's exact-integer
    * projection round-trips through Spark's native ORC source; the
    * oracle recomputes from the raw parquet — the format must change the
    * bytes, not the answer. Layout staged once per (dataset, JVM) under
    * /tmp, guarded by _SUCCESS. */
  private def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = ev(spark, dir)
      .select($"event_id", $"event_type", $"user_id", $"ems",
        floor($"value" * 1000000.0 + 0.5).cast("long").as("micro"))
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_orc_" +
      math.abs(dir.hashCode).toString
    if (!new java.io.File(s"$base/_SUCCESS").exists())
      src.write.mode("overwrite").orc(base)
    spark.read.orc(base)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct($"user_id").cast("long").as("n_users"),
        sum($"micro").cast("long").as("micro_sum"),
        min($"ems").as("first_ems"), max($"ems").as("last_ems"))
      .orderBy($"event_type")
  }

  private val orcRoundtripSql =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS micro_sum,
      |  CAST(MIN(epoch_ms(ts)) AS BIGINT) AS first_ems,
      |  CAST(MAX(epoch_ms(ts)) AS BIGINT) AS last_ems
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_haar_energy" -> (haarEnergy _),
    "stream_haar" -> (haarStream _),
    "graph_hits" -> (hits _),
    "rel_exact_percentiles" -> (exactPercentiles _),
    "stream_percentiles" -> (percentilesStream _),
    "emb_pca_power" -> (pcaPower _),
    "emb_pca_deflate" -> (pcaDeflate _),
    "emb_pca_project" -> (pcaProject _),
    "emb_pca_third" -> (pcaThird _),
    "evt_asof_forward" -> (asofForward _),
    "evt_asof_nearest" -> (asofNearest _),
    "ml_permutation_importance" -> (permImportance _),
    "src_orc_roundtrip" -> (orcRoundtrip _))

  override def oracles: Map[String, String] = Map(
    "evt_haar_energy" -> haarEnergySql,
    "stream_haar" -> haarEnergySql,
    "graph_hits" -> hitsSql,
    "rel_exact_percentiles" -> exactPercentilesSql,
    "stream_percentiles" -> evtPercentilesSql,
    "emb_pca_power" -> pcaPowerSql,
    "emb_pca_deflate" -> pcaDeflateSql,
    "emb_pca_project" -> pcaProjectSql,
    "emb_pca_third" -> pcaThirdSql,
    "evt_asof_forward" -> asofForwardSql,
    "evt_asof_nearest" -> asofNearestSql,
    "ml_permutation_importance" -> permImportanceSql,
    "src_orc_roundtrip" -> orcRoundtripSql)
}
