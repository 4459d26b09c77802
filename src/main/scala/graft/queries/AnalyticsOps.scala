package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import Exact._

/** Feature-engineering + data-quality operators a production feature
  * platform layers on top of the core engine (ref features/, the reference
  * computes EWMA-style decayed aggregates in streaming/core/windowing.py and
  * ships validation checks with its feature views):
  *
  *   - per-key EWMA features (the classic decayed counter, exact sequential
  *     fold — identical left-fold in both engines, never a bare SUM);
  *   - CUSUM changepoint detection (the max(0, ...) recurrence rewritten as
  *     cumsum minus running-min so it is pure DECIMAL window algebra — exact
  *     and summation-order-independent, safe under DuckDB's segment trees);
  *   - out-of-fold smoothed target encoding (the standard leakage-safe mean
  *     encoder, integer counts + one double formula shared verbatim);
  *   - exact Pearson correlation matrix (values lifted to integer cents so
  *     every moment accumulates exactly; doubles appear only in the final
  *     closed-form, written identically in both engines);
  *   - market-basket association rules (support/lift over co-ordered parts;
  *     the pair join is bounded by order size, never catalog²);
  *   - Deequ-style column profiling and constraint verification (the data
  *     contracts run before features are trusted).
  *
  * 100 TB notes: EWMA/CUSUM shuffle once on the entity key and their state
  * per key is O(events-per-key) only inside the fold (the streaming twin
  * keeps O(1)); target encoding and profiling are single-pass aggregations;
  * the basket self-join fans out ≤ (order size choose 2) per order.
  */
object AnalyticsOps extends QueryModule {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).withColumn("ems", epochMs(col("ts")))

  // ------------------------------------------------------------------ EWMA
  /** Per-user exponentially-weighted moving average of `value` (α = 0.25),
    * folded left over the (ems, event_id)-sorted event list. Both engines
    * run the identical `0.25*x + 0.75*acc` double recurrence — a bare SUM
    * over decay weights would be summation-order-dependent. */
  private def ewma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir)
      .groupBy($"user_id")
      .agg(array_sort(collect_list(struct($"ems", $"event_id", $"value")))
        .as("evs"))
      .select($"user_id",
        size($"evs").cast("long").as("n_events"),
        element_at($"evs", -1).getField("ems").as("last_ems"),
        expr("aggregate(slice(evs, 2, size(evs) - 1), evs[0].value," +
          " (acc, x) -> 0.25D * x.value + 0.75D * acc)").as("ewma_value"))
      .orderBy($"user_id")
  }

  /** Shared with the streaming twin (stream_ewma). */
  val ewmaSql =
    """WITH s AS (
      |  SELECT user_id,
      |    list(value ORDER BY epoch_ms(ts), event_id) AS vs,
      |    count(*) AS n_events,
      |    max(epoch_ms(ts)) AS last_ems
      |  FROM events GROUP BY 1)
      |SELECT user_id, CAST(n_events AS BIGINT) AS n_events, last_ems,
      |  list_reduce(vs, (acc, x) -> 0.25 * x + 0.75 * acc) AS ewma_value
      |FROM s ORDER BY user_id""".stripMargin

  // ----------------------------------------------------------------- CUSUM
  /** Per-user one-sided CUSUM changepoint detector against the fixed target
    * level 50 (the corpus mean): S_i = max(0, S_{i-1} + (x_i - 50)), alarm
    * when S_i > 100. The recurrence is rewritten as
    * S_i = C_i - min(0, min_{j<=i} C_j) over the DECIMAL cumulative sum C,
    * so both engines do exact decimal algebra — no float fold at all, and
    * DuckDB's segment-tree window order cannot matter. */
  private def cusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ems", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(spark, dir)
      .withColumn("dev",
        col("value").cast(DecimalType(25, 6)) - lit(50).cast(DecimalType(25, 6)))
      .withColumn("csum", sum($"dev").over(w))
      .withColumn("runmin", min($"csum").over(w))
      // NOT least(): DuckDB LEAST over mixed decimal widths coerces to
      // DOUBLE; the CASE keeps both engines in exact decimal algebra.
      .withColumn("pos",
        when($"runmin" < 0, $"csum" - $"runmin").otherwise($"csum"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"pos" > 100, 1L).otherwise(0L)).as("n_alarms"),
        max($"pos").cast("double").as("max_cusum"))
      .orderBy($"user_id")
  }

  private[graft] val cusumSql =
    """WITH d AS (
      |  SELECT user_id, epoch_ms(ts) AS ems, event_id,
      |    CAST(value AS DECIMAL(25,6)) - CAST(50 AS DECIMAL(25,6)) AS dev
      |  FROM events
      |), cs AS (
      |  SELECT user_id, ems, event_id, SUM(dev) OVER w AS csum
      |  FROM d
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ems, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), c AS (
      |  SELECT user_id, csum, MIN(csum) OVER w AS runmin
      |  FROM cs
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ems, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), p AS (
      |  SELECT user_id,
      |    CASE WHEN runmin < 0 THEN csum - runmin ELSE csum END AS pos
      |  FROM c)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(SUM(CASE WHEN pos > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
      |  CAST(MAX(pos) AS DOUBLE) AS max_cusum
      |FROM p GROUP BY 1 ORDER BY user_id""".stripMargin

  // ------------------------------------------------- smoothed target encoding
  /** Out-of-fold smoothed target encoding of event_type against the binary
    * target (value > 75): fold f's encoding uses only the OTHER folds'
    * rows — the standard leakage guard — shrunk toward the global prior
    * with pseudo-count m = 10. Counts stay BIGINT end-to-end; the single
    * double formula is shared verbatim between engines. */
  private def targetEncoding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir).select($"event_type",
      ($"event_id" % 5).as("fold"),
      when($"value" > 75.0, 1L).otherwise(0L).as("y"))
    val perFold = e.groupBy($"event_type", $"fold")
      .agg(count(lit(1)).as("n"), sum($"y").as("pos"))
    val wCat = Window.partitionBy($"event_type")
    val g = e.agg(count(lit(1)).as("gn"), sum($"y").as("gpos"))
    perFold
      .withColumn("n_other", sum($"n").over(wCat) - $"n")
      .withColumn("pos_other", sum($"pos").over(wCat) - $"pos")
      .crossJoin(broadcast(g))
      .select($"event_type", $"fold", $"n_other",
        (($"pos_other".cast("double") +
          lit(10.0) * ($"gpos".cast("double") / $"gn".cast("double"))) /
          ($"n_other".cast("double") + lit(10.0))).as("encoded"))
      .orderBy($"event_type", $"fold")
  }

  private val targetEncodingSql =
    """WITH e AS (
      |  SELECT event_type, event_id % 5 AS fold,
      |    CASE WHEN value > 75.0 THEN 1 ELSE 0 END AS y
      |  FROM events
      |), pf AS (
      |  SELECT event_type, fold, count(*) AS n,
      |    CAST(SUM(y) AS BIGINT) AS pos
      |  FROM e GROUP BY 1, 2
      |), g AS (
      |  SELECT count(*) AS gn, CAST(SUM(y) AS BIGINT) AS gpos FROM e)
      |SELECT event_type, fold,
      |  CAST(SUM(n) OVER (PARTITION BY event_type) - n AS BIGINT) AS n_other,
      |  (CAST(SUM(pos) OVER (PARTITION BY event_type) - pos AS DOUBLE) +
      |     10.0 * (CAST(gpos AS DOUBLE) / CAST(gn AS DOUBLE))) /
      |    (CAST(SUM(n) OVER (PARTITION BY event_type) - n AS DOUBLE) + 10.0)
      |    AS encoded
      |FROM pf, g
      |ORDER BY event_type, fold""".stripMargin

  // ------------------------------------------------------ Pearson correlation
  /** Exact Pearson correlation matrix over lineitem's four numeric measures.
    * Values are lifted to integer cents (floor(x*100 + 0.5) — all four
    * columns carry at most 2 true decimals), so every moment (Sx, Sxx, Sxy)
    * accumulates EXACTLY (Spark DECIMAL(38,0) sums == DuckDB HUGEINT sums).
    * Doubles appear only in the final closed-form
    * (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy − Sy²)), written identically
    * in both engines — sqrt and the four basic ops are IEEE-exact. */
  private def correlation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def cents(c: String) = floor(col(c) * 100.0 + 0.5)
    val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val short = Map("l_quantity" -> "q", "l_extendedprice" -> "p",
      "l_discount" -> "d", "l_tax" -> "t")
    val base = Tables.lineitem(spark, dir)
      .select(names.map(n => cents(n).as(short(n))): _*)
    def s38(c: org.apache.spark.sql.Column) = sum(c.cast(DecimalType(38, 0)))
    val aggCols =
      Seq(count(lit(1)).as("n")) ++
        names.map(n => s38(col(short(n))).as(s"s_${short(n)}")) ++
        names.map(n => s38(col(short(n)) * col(short(n)))
          .as(s"s_${short(n)}${short(n)}")) ++
        names.combinations(2).toSeq.map { case Seq(a, b) =>
          s38(col(short(a)) * col(short(b))).as(s"s_${short(a)}${short(b)}")
        }
    val m = base.agg(aggCols.head, aggCols.tail: _*)
    def corr(a: String, b: String) = {
      val nn = col("n").cast("double")
      val sx = col(s"s_${short(a)}").cast("double")
      val sy = col(s"s_${short(b)}").cast("double")
      val sxx = col(s"s_${short(a)}${short(a)}").cast("double")
      val syy = col(s"s_${short(b)}${short(b)}").cast("double")
      val sxy = col(s"s_${short(a)}${short(b)}").cast("double")
      (nn * sxy - sx * sy) /
        (sqrt(nn * sxx - sx * sx) * sqrt(nn * syy - sy * sy))
    }
    val pairs = names.combinations(2).toSeq
    m.select(explode(array(pairs.map { case Seq(a, b) =>
        struct(lit(a).as("col_x"), lit(b).as("col_y"),
          col("n").cast("long").as("n"), corr(a, b).as("pearson_r"))
      }: _*)).as("r"))
      .select($"r.col_x", $"r.col_y", $"r.n", $"r.pearson_r")
      .orderBy($"col_x", $"col_y")
  }

  private val correlationSql = {
    val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val short = Map("l_quantity" -> "q", "l_extendedprice" -> "p",
      "l_discount" -> "d", "l_tax" -> "t")
    val moments =
      (Seq("count(*) AS n") ++
        names.map(n => s"SUM(${short(n)}) AS s_${short(n)}") ++
        names.map(n => s"SUM(${short(n)} * ${short(n)}) AS s_${short(n)}${short(n)}") ++
        names.combinations(2).toSeq.map { case Seq(a, b) =>
          s"SUM(${short(a)} * ${short(b)}) AS s_${short(a)}${short(b)}"
        }).mkString(",\n    ")
    val arms = names.combinations(2).toSeq.map { case Seq(a, b) =>
      val (x, y) = (short(a), short(b))
      s"""SELECT '$a' AS col_x, '$b' AS col_y, CAST(n AS BIGINT) AS n,
         |  (CAST(n AS DOUBLE) * CAST(s_$x$y AS DOUBLE)
         |     - CAST(s_$x AS DOUBLE) * CAST(s_$y AS DOUBLE)) /
         |  (sqrt(CAST(n AS DOUBLE) * CAST(s_$x$x AS DOUBLE)
         |     - CAST(s_$x AS DOUBLE) * CAST(s_$x AS DOUBLE)) *
         |   sqrt(CAST(n AS DOUBLE) * CAST(s_$y$y AS DOUBLE)
         |     - CAST(s_$y AS DOUBLE) * CAST(s_$y AS DOUBLE))) AS pearson_r
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH c AS (
       |  SELECT ${names.map(n =>
            s"CAST(floor($n * 100.0 + 0.5) AS BIGINT) AS ${short(n)}")
            .mkString(", ")}
       |  FROM lineitem
       |), m AS (
       |  SELECT $moments
       |  FROM c)
       |$arms
       |ORDER BY col_x, col_y""".stripMargin
  }

  // --------------------------------------------------------- market basket
  /** Association rules over co-ordered parts: support = distinct orders
    * containing both parts, lift = support·n_orders / (n1·n2). The pair
    * join fans out ≤ (order size choose 2) per order — bounded by the
    * schema, never catalog² — and item counts broadcast. Top 50 by
    * (support desc, p1, p2). */
  private def marketBasket(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val io = Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val itemN = io.groupBy($"pk").agg(count(lit(1)).as("n_item"))
    val nOrders = io.select($"ok").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val pairs = io.as("a")
      .join(io.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .groupBy($"p1", $"p2").agg(count(lit(1)).as("support"))
      .filter($"support" >= 2)
    pairs
      .join(broadcast(itemN.withColumnRenamed("pk", "p1")
        .withColumnRenamed("n_item", "n1")), Seq("p1"))
      .join(broadcast(itemN.withColumnRenamed("pk", "p2")
        .withColumnRenamed("n_item", "n2")), Seq("p2"))
      .crossJoin(broadcast(nOrders))
      .select($"p1", $"p2", $"support", $"n1", $"n2",
        (($"support".cast("double") * $"n_orders".cast("double")) /
          ($"n1".cast("double") * $"n2".cast("double"))).as("lift"))
      .orderBy($"support".desc, $"p1", $"p2")
      .limit(50)
  }

  private val marketBasketSql =
    """WITH io AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), item_n AS (
      |  SELECT pk, count(*) AS n_item FROM io GROUP BY 1
      |), no AS (
      |  SELECT count(DISTINCT ok) AS n_orders FROM io
      |), pairs AS (
      |  SELECT a.pk AS p1, b.pk AS p2, count(*) AS support
      |  FROM io a JOIN io b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT p1, p2, support, i1.n_item AS n1, i2.n_item AS n2,
      |  (CAST(support AS DOUBLE) * CAST(n_orders AS DOUBLE)) /
      |    (CAST(i1.n_item AS DOUBLE) * CAST(i2.n_item AS DOUBLE)) AS lift
      |FROM pairs
      |JOIN item_n i1 ON i1.pk = p1
      |JOIN item_n i2 ON i2.pk = p2
      |CROSS JOIN no
      |ORDER BY support DESC, p1, p2
      |LIMIT 50""".stripMargin

  // ------------------------------------------------------------ dq profile
  /** Deequ-style column profile of `orders`: row count, nulls,
    * completeness, distinct count, numeric min/max — one scan, one row per
    * profiled column. */
  private def dqProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val numeric = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val stringy = Seq("o_orderstatus", "o_orderpriority")
    val aggCols =
      Seq(count(lit(1)).as("n")) ++
        (numeric ++ stringy).flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
            countDistinct(col(c)).cast("long").as(s"dist_$c"))
        } ++
        numeric.flatMap { c =>
          Seq(min(col(c)).cast("double").as(s"min_$c"),
            max(col(c)).cast("double").as(s"max_$c"))
        }
    val m = o.agg(aggCols.head, aggCols.tail: _*)
    def row(c: String, isNum: Boolean) = struct(
      lit(c).as("column"), col("n").cast("long").as("n_rows"),
      col(s"null_$c").as("n_null"),
      (($"n".cast("double") - col(s"null_$c").cast("double")) /
        $"n".cast("double")).as("completeness"),
      col(s"dist_$c").as("n_distinct"),
      (if (isNum) col(s"min_$c") else lit(null).cast("double")).as("min_num"),
      (if (isNum) col(s"max_$c") else lit(null).cast("double")).as("max_num"))
    m.select(explode(array(
        numeric.map(row(_, isNum = true)) ++
          stringy.map(row(_, isNum = false)): _*)).as("r"))
      .select($"r.*")
      .orderBy($"column")
  }

  private val dqProfileSql = {
    val numeric = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val stringy = Seq("o_orderstatus", "o_orderpriority")
    def arm(c: String, isNum: Boolean) = {
      val mn = if (isNum) s"CAST(min_$c AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (isNum) s"CAST(max_$c AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS "column", n AS n_rows, null_$c AS n_null,
         |  (CAST(n AS DOUBLE) - CAST(null_$c AS DOUBLE)) / CAST(n AS DOUBLE)
         |    AS completeness,
         |  dist_$c AS n_distinct, $mn AS min_num, $mx AS max_num
         |FROM m""".stripMargin
    }
    val moments =
      (Seq("count(*) AS n") ++
        (numeric ++ stringy).flatMap { c =>
          Seq(s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_$c",
            s"CAST(count(DISTINCT $c) AS BIGINT) AS dist_$c")
        } ++
        numeric.flatMap { c => Seq(s"min($c) AS min_$c", s"max($c) AS max_$c") })
        .mkString(",\n    ")
    s"""WITH m AS (
       |  SELECT $moments
       |  FROM orders)
       |${(numeric.map(arm(_, isNum = true)) ++
            stringy.map(arm(_, isNum = false))).mkString("\nUNION ALL\n")}
       |ORDER BY "column"""".stripMargin
  }

  // -------------------------------------------------------- dq constraints
  /** Constraint verification across the warehouse — the contracts a feature
    * pipeline asserts before trusting its inputs: key uniqueness,
    * referential integrity (anti-join violation count), range checks,
    * completeness. Each check is an independent scan-shaped aggregate;
    * violations are BIGINT, status derives from them. */
  private def dqConstraints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val cu = Tables.customer(spark, dir)
    val e = Tables.events(spark, dir)
    def check(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check_name"),
        col("violations").cast("long").as("violations"),
        when(col("violations") === 0, "pass").otherwise("fail").as("status"))
    val uniq = o.agg((count(lit(1)) - countDistinct($"o_orderkey"))
      .as("violations"))
    val fk = o.join(broadcast(cu),
        o("o_custkey") === cu("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val price = o.agg(sum(when($"o_totalprice" <= 0, 1L).otherwise(0L))
      .as("violations"))
    val disc = li.agg(sum(when($"l_discount" < 0 || $"l_discount" > 0.1, 1L)
      .otherwise(0L)).as("violations"))
    val complete = e.agg(sum(when($"value".isNull, 1L).otherwise(0L))
      .as("violations"))
    check("orders_orderkey_unique", uniq)
      .unionAll(check("orders_custkey_fk", fk))
      .unionAll(check("orders_totalprice_positive", price))
      .unionAll(check("lineitem_discount_range", disc))
      .unionAll(check("events_value_complete", complete))
      .orderBy($"check_name")
  }

  private val dqConstraintsSql =
    """WITH checks AS (
      |  SELECT 'orders_orderkey_unique' AS check_name,
      |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
      |  FROM orders
      |  UNION ALL
      |  SELECT 'orders_custkey_fk',
      |    CAST(count(*) AS BIGINT)
      |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      |  UNION ALL
      |  SELECT 'orders_totalprice_positive',
      |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem_discount_range',
      |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
      |                  THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'events_value_complete',
      |    CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM events)
      |SELECT check_name, violations,
      |  CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
      |FROM checks ORDER BY check_name""".stripMargin

  // --------------------------------------------------- last-touch attribution
  /** Marketing-style last-touch revenue attribution: each purchase credits
    * the user's most recent PRIOR non-purchase event type (the channel),
    * "none" when the purchase opens the history. The channel lookup is a
    * per-user IGNORE NULLS window — one shuffle on the entity key — then a
    * tiny grouped rollup. */
  private def attribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ems", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev(spark, dir)
      .withColumn("ch_raw",
        when($"event_type" =!= "purchase", $"event_type"))
      .withColumn("channel",
        coalesce(last($"ch_raw", ignoreNulls = true).over(w), lit("none")))
      .filter($"event_type" === "purchase")
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_purchases"), dsum($"value").as("revenue"))
      .orderBy($"channel")
  }

  private val attributionSql =
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) AS ems, event_id, event_type, value,
      |    CASE WHEN event_type <> 'purchase' THEN event_type END AS ch_raw
      |  FROM events
      |), a AS (
      |  SELECT event_type, value,
      |    COALESCE(last_value(ch_raw IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ems, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'none')
      |      AS channel
      |  FROM e)
      |SELECT channel, count(*) AS n_purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      |FROM a WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY channel""".stripMargin

  // ------------------------------------- U-shaped multi-touch attribution
  /** POSITION-BASED (U-shaped) multi-touch attribution over the last-8
    * touch lookback window — the other standard marketing model next to
    * [[attribution]]'s last-touch: each purchase's revenue splits 40% to
    * the FIRST touch in the window, 40% to the LAST, and 20% shared
    * equally among the middles (m=1 → 100%, m=2 → 40/60 with the shared
    * fifth folded into the last touch). All credit math is exact integer
    * micro-units: base = FLOOR(value·1e6), first = base·2 div 5, each
    * middle = (base div 5) div (m−2), last = base − first − Σmiddles — so
    * credits CONSERVE exactly (Σ credits = base per purchase, remainder
    * to the recency end) and both engines agree bit-for-bit (operands all
    * non-negative, so Spark's truncating `div` == DuckDB's flooring `//`).
    * A purchase with no prior touches credits the synthetic 'none'
    * channel in full.
    *
    * Scale shape: touches get a per-user sequence number once (one
    * entity-key window pass); each purchase EXPLODES to at most 8
    * sequence slots (`sequence(t_lo, t_hi)`) and equi-joins touches on
    * (user_id, tn) — bounded fan-out, no purchases×history pair blowup,
    * which is what makes the lookback-window form (vs. all-priors) the
    * one that survives hot users at 100 TB. */
  private val touchLookback = 8

  private def positionAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wAll = Window.partitionBy($"user_id").orderBy($"ems", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = ev(spark, dir)
      .withColumn("tn",
        sum(($"event_type" =!= "purchase").cast("long")).over(wAll))
    val touches = base.filter($"event_type" =!= "purchase")
      .select($"user_id", $"tn", $"event_type".as("channel"))
    val purch = base.filter($"event_type" === "purchase")
      .select($"user_id", $"tn".as("t_hi"),
        floor($"value" * lit(1000000.0)).cast("long").as("base_micro"))
    val direct = purch.filter($"t_hi" === 0)
      .select(lit("none").as("channel"), $"base_micro".as("credit_micro"))
    val firstC = expr("(base_micro * 2) div 5")
    val midC = when($"m" >= 3,
      expr("(base_micro div 5) div (m - 2)")).otherwise(lit(0L))
    val credited = purch.filter($"t_hi" > 0)
      .withColumn("t_lo", greatest(lit(1L), $"t_hi" - lit(touchLookback - 1L)))
      .withColumn("m", $"t_hi" - $"t_lo" + lit(1L))
      .withColumn("tn", explode(sequence($"t_lo", $"t_hi")))
      .withColumn("credit_micro",
        when($"m" === 1, $"base_micro")
          .when($"tn" === $"t_lo", firstC)
          .when($"tn" === $"t_hi",
            $"base_micro" - firstC - ($"m" - 2) * midC)
          .otherwise(midC))
      .join(touches, Seq("user_id", "tn"))
      .select($"channel", $"credit_micro")
    credited.unionAll(direct)
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_credits"), sum($"credit_micro").as("credit_micro"))
      .orderBy($"channel")
  }

  private[graft] val positionAttributionSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, value,
      |    CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS tn
      |  FROM events
      |), touches AS (
      |  SELECT user_id, tn, event_type AS channel FROM e
      |  WHERE event_type <> 'purchase'
      |), purch AS (
      |  SELECT user_id, tn AS t_hi,
      |    CAST(FLOOR(value * 1000000.0) AS BIGINT) AS base_micro
      |  FROM e WHERE event_type = 'purchase'
      |), direct AS (
      |  SELECT 'none' AS channel, base_micro AS credit_micro
      |  FROM purch WHERE t_hi = 0
      |), win AS (
      |  SELECT p.user_id, p.base_micro,
      |    GREATEST(1, p.t_hi - 7) AS t_lo,
      |    p.t_hi - GREATEST(1, p.t_hi - 7) + 1 AS m,
      |    unnest(range(GREATEST(1, p.t_hi - 7), p.t_hi + 1)) AS tn
      |  FROM purch p WHERE p.t_hi > 0
      |), cr AS (
      |  SELECT user_id, tn,
      |    CASE WHEN m = 1 THEN base_micro
      |         WHEN tn = t_lo THEN (base_micro * 2) // 5
      |         WHEN tn = t_lo + m - 1 THEN base_micro - (base_micro * 2) // 5
      |              - (m - 2) * (CASE WHEN m >= 3
      |                           THEN (base_micro // 5) // (m - 2) ELSE 0 END)
      |         ELSE (base_micro // 5) // (m - 2) END AS credit_micro
      |  FROM win
      |), j AS (
      |  SELECT t.channel, c.credit_micro
      |  FROM cr c JOIN touches t USING (user_id, tn)
      |  UNION ALL SELECT channel, credit_micro FROM direct
      |)
      |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
      |  CAST(SUM(credit_micro) AS BIGINT) AS credit_micro
      |FROM j GROUP BY channel ORDER BY channel""".stripMargin

  // -------------------------------------------- Kaplan-Meier survival curve
  /** Kaplan–Meier time-to-convert survival estimator with RIGHT CENSORING
    * — the statistically-honest upgrade over raw time-to-convert
    * percentiles (which silently drop non-converters): per user, the
    * clock starts at the first observed event; the conversion event is
    * the first purchase with value > 150 (rarer than any-purchase, so a
    * real censored population exists — at sf0.01: 67 convert, 83 censor
    * at their last observed event). Durations bucket to hours; the life
    * table carries (n_risk, events, censored) per hour and
    * S(h) = Π_{h'≤h} (1 − d_{h'}/n_{h'}) — the product folds over the
    * hour-ASCENDING factor list from 1.0 in both engines (a bare product
    * aggregate would be order-dependent), deaths-before-censors at tied
    * hours per the standard convention (both stay in the risk set at
    * their own hour).
    *
    * Scale: the life table is bounded by the observation window in hours
    * (never user count), so the global window + driver-size factor array
    * are O(hours); the per-user reduction is one groupBy. */
  private def survivalKm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val u = ev(spark, dir).groupBy($"user_id")
      .agg(min($"ems").as("s"), max($"ems").as("e"),
        min(when($"event_type" === "purchase" && $"value" > 150.0, $"ems"))
          .as("p"))
    kmFromUsers(u)
  }

  /** KM life-table finale from per-user (s, e, p) rows — shared by the
    * batch query and the streaming twin (which maintains the same three
    * primitives per user in state), so the curve math cannot drift. */
  private[graft] def kmFromUsers(u: DataFrame): DataFrame = {
    val d = u.select(
      when(col("p").isNotNull, expr("(p - s) div 3600000"))
        .otherwise(expr("(e - s) div 3600000")).as("h"),
      when(col("p").isNotNull, 1L).otherwise(0L).as("ev"))
    val lt = d.groupBy(col("h"))
      .agg(sum(col("ev")).as("d_h"), sum(lit(1L) - col("ev")).as("c_h"))
    val tot = d.agg(count(lit(1)).as("total"))
    val wPrior = Window.orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = lt.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("total") - coalesce(sum(col("d_h") + col("c_h")).over(wPrior),
          lit(0L)))
      .withColumn("factor",
        lit(1.0) - col("d_h").cast("double") / col("n_risk"))
      .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
    val arr = risk
      .agg(array_sort(collect_list(struct(col("h"), col("factor")))).as("hf"))
      .select(expr("transform(hf, x -> x.factor)").as("fs"))
    risk.crossJoin(broadcast(arr))
      .select(col("h"), col("n_risk"), col("d_h").as("n_events"),
        col("c_h").as("n_censored"),
        expr("aggregate(slice(fs, 1, rn), 1.0D, (acc, x) -> acc * x)")
          .as("surv"))
      .orderBy(col("h"))
  }

  private[graft] val survivalKmSql =
    """WITH u AS (
      |  SELECT user_id, MIN(epoch_ms(ts)) AS s, MAX(epoch_ms(ts)) AS e,
      |    MIN(CASE WHEN event_type = 'purchase' AND value > 150.0
      |             THEN epoch_ms(ts) END) AS p
      |  FROM events GROUP BY user_id
      |), d AS (
      |  SELECT
      |    CASE WHEN p IS NOT NULL THEN (p - s) // 3600000
      |         ELSE (e - s) // 3600000 END AS h,
      |    CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM u
      |), lt AS (
      |  SELECT h, CAST(SUM(ev) AS BIGINT) AS d_h,
      |    CAST(SUM(1 - ev) AS BIGINT) AS c_h
      |  FROM d GROUP BY h
      |), risk AS (
      |  SELECT h, d_h, c_h,
      |    CAST((SELECT COUNT(*) FROM d) AS BIGINT)
      |      - CAST(COALESCE(SUM(d_h + c_h) OVER (ORDER BY h
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |        AS BIGINT) AS n_risk
      |  FROM lt
      |), f AS (
      |  SELECT h, d_h, c_h, n_risk,
      |    1.0 - CAST(d_h AS DOUBLE) / n_risk AS factor,
      |    row_number() OVER (ORDER BY h) AS rn
      |  FROM risk
      |), arr AS (
      |  SELECT list(factor ORDER BY h) AS fs FROM f
      |)
      |SELECT f.h, f.n_risk, f.d_h AS n_events, f.c_h AS n_censored,
      |  list_reduce(list_prepend(1.0, (arr.fs)[1:f.rn]),
      |    (acc, x) -> acc * x) AS surv
      |FROM f, arr ORDER BY f.h""".stripMargin

  // ---------------------------------------------- online bootstrap CI
  /** Online (Poisson/multinomial) BOOTSTRAP confidence interval for the
    * mean of `value` — the Owen/Eckles one-pass resampling that actually
    * runs on clusters: instead of materializing B resampled datasets,
    * every event carries a deterministic md5-derived multiplicity
    * m ∈ {0,1,2} (mean 1 — the 3-point surrogate for Poisson(1)) per
    * replicate b < 32, and replicate means are Σm·value / Σm with exact
    * DECIMAL(25,6) accumulation (one double division each). The 95%-ish
    * interval is the 2nd/31st order statistics of the 32 replicate means
    * (exact selection, no libm quantiles). One pass over the data with
    * NO row fan-out (round 14): the B replicate sums are 2B aggregate
    * columns of the same scan, so the whole state is one row of
    * counters. Deterministic md5 multiplicities keep both engines
    * resampling the identical "randomness" — the repo's hash rule. */
  /** 8 md5 digests per event; replicate b's multiplicity reads the 8-hex
    * window (b % 4)·8+1 of digest b div 4 — 4× fewer md5 evaluations and
    * (in the one-pass aggregate form) no 32× row fan-out at all. Shared
    * by the batch query and the streaming twin so the two cannot drift;
    * the oracle mirrors the same windows in its unnest form (DECIMAL
    * addition is exact and commutative, so the evaluation SHAPE — 64
    * aggregate columns here vs unnest + GROUP BY there — cannot change
    * a single bit of the sums). */
  private[graft] def withBootDigests(df: DataFrame): DataFrame =
    (0 until 8).foldLeft(df)((d, g) =>
      d.withColumn(s"h$g", md5(concat(col("event_id").cast("string"),
        lit(s"_$g")).cast("binary"))))

  private[graft] def bootMult(b: Int): Column =
    conv(substring(col(s"h${b / 4}"), (b % 4) * 8 + 1, 8), 16, 10)
      .cast("long") % 3

  /** The shared one-row → 32-replicate finale: reshape the 64 aggregate
    * columns to (b, boot_mean) rows, rank, pick the 2nd/31st order
    * statistics, and attach the point estimate. Sums arrive as exact
    * micro-unit LONGS (the cusum convention: value → DECIMAL(25,6) →
    * ×10⁶ long, so long addition IS decimal addition) and convert back
    * through exact decimal division by 10⁶ — the resulting DECIMAL(25,6)
    * is bit-identical to the oracle's direct decimal sum, so the double
    * casts agree to the last ulp. */
  private[graft] def bootFinale(one: DataFrame): DataFrame = {
    def dec(c: Column): Column =
      (c.cast(DecimalType(31, 6)) / 1000000).cast(DecimalType(25, 6))
    val bm = one.select(explode(array((0 until 32).map(b =>
        struct(lit(b.toLong).as("b"),
          (dec(col(s"sv$b")).cast("double") / col(s"sm$b"))
            .as("boot_mean"))): _*))
        .as("s"))
      .select(col("s.b").as("b"), col("s.boot_mean").as("boot_mean"))
    val ranked = bm.withColumn("rn",
      row_number().over(Window.orderBy(col("boot_mean"), col("b"))))
    val lo = ranked.filter(col("rn") === 2)
      .select(col("boot_mean").as("ci_lo"))
    val hi = ranked.filter(col("rn") === 31)
      .select(col("boot_mean").as("ci_hi"))
    val pt = one.select(col("n"),
      (dec(col("svall")).cast("double") / col("n")).as("mean_value"))
    pt.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
  }

  /** The shared 66-column aggregate list over a frame carrying v_micro
    * (exact 10⁶-scaled long) + the 8 digests: 32 (Σm·v, Σm) pairs in
    * pure LONG arithmetic + the point estimate's (n, Σv). */
  private[graft] def bootAggs(): Seq[Column] =
    (0 until 32).flatMap { b =>
      Seq(sum(col("vm") * bootMult(b)).as(s"sv$b"),
        sum(bootMult(b)).as(s"sm$b"))
    } ++ Seq(count(lit(1)).as("n"), sum(col("vm")).as("svall"))

  private def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ONE aggregation pass, no row fan-out (round 14): the 32 replicate
    // sums are 64 aggregate columns over the event scan (8 md5s/event,
    // down from 32; the 33× explode was the query's whole cost), in
    // exact micro-long arithmetic — all mergeable, all codegen'd.
    val e = withBootDigests(ev(spark, dir).select($"event_id", $"value"))
      .withColumn("vm",
        ($"value".cast(DecimalType(25, 6)) * 1000000).cast("long"))
    val aggs = bootAggs()
    bootFinale(e.agg(aggs.head, aggs.tail: _*))
  }

  private[graft] val bootstrapCiSql =
    """WITH reps AS (
      |  -- replicate b reads 8-hex window (b % 4)*8+1 of digest b // 4
      |  -- (round 14: mirrors the Spark side's 8-digests-per-event form;
      |  -- the unnest shape is kept here because DECIMAL sums are exact
      |  -- and commutative, so the shapes cannot disagree)
      |  SELECT e.event_id, e.value, b.b,
      |    CAST(('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || '_' ||
      |      CAST(b.b // 4 AS VARCHAR)), (b.b % 4) * 8 + 1, 8)) AS BIGINT)
      |      % 3 AS m
      |  FROM events e, (SELECT unnest(range(32)) AS b) b
      |), bm AS (
      |  SELECT b, CAST(SUM(m) AS BIGINT) AS n_eff,
      |    CAST(SUM(m * CAST(value AS DECIMAL(25,6))) AS DOUBLE)
      |      / CAST(SUM(m) AS BIGINT) AS boot_mean
      |  FROM reps GROUP BY b
      |), ranked AS (
      |  SELECT boot_mean, row_number() OVER (ORDER BY boot_mean, b) AS rn
      |  FROM bm
      |), pt AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
      |      AS mean_value
      |  FROM events
      |)
      |SELECT pt.n, pt.mean_value,
      |  (SELECT boot_mean FROM ranked WHERE rn = 2) AS ci_lo,
      |  (SELECT boot_mean FROM ranked WHERE rn = 31) AS ci_hi
      |FROM pt""".stripMargin

  // ------------------------------------------------- difference-in-differences
  /** Difference-in-differences estimate over the deterministic A/B split
    * (user_id % 2, the Qini/z-test assignment) and a pre/post period cut
    * at the data midpoint ((min+max) div 2 of event time — exact BIGINT):
    * the 2×2 (treat, post) cells carry exact counts and purchase rates,
    * and DiD = (r₁₁ − r₁₀) − (r₀₁ − r₀₀) — the causal-inference
    * workhorse when randomization is suspect and a parallel-trends
    * control exists. Rate subtractions are written in the identical
    * order in both engines; the synthetic corpus yields an honest ~0
    * effect. Single-pass groupBy over 4 cells. */
  private def diffInDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir).select($"ems",
      when($"user_id" % 2 === 0, 1L).otherwise(0L).as("treat"),
      when($"event_type" === "purchase", 1L).otherwise(0L).as("y"))
    val mid = e.agg(expr("(min(ems) + max(ems)) div 2").as("m"))
    val cells = e.crossJoin(broadcast(mid))
      .withColumn("post", when($"ems" >= $"m", 1L).otherwise(0L))
      .groupBy($"treat", $"post")
      .agg(count(lit(1)).as("n"), sum($"y").as("n_pos"))
    didFromCells(cells)
  }

  /** The per-arm training-data midpoint, broadcast to the streaming twin
    * as its trained constant. */
  private[graft] def didMidpoint(spark: SparkSession, dir: String): Long =
    ev(spark, dir).agg(expr("(min(ems) + max(ems)) div 2")).head().getLong(0)

  /** Shared DiD finale from (treat, post, n, n_pos) cells — batch and
    * streaming twin report through one code path. */
  private[graft] def didFromCells(cells0: DataFrame): DataFrame = {
    val cells = cells0.withColumn("rate",
      col("n_pos").cast("double") / col("n"))
    val did = cells.agg(
      ((max(when(col("treat") === 1 && col("post") === 1, col("rate")))
        - max(when(col("treat") === 1 && col("post") === 0, col("rate"))))
        - (max(when(col("treat") === 0 && col("post") === 1, col("rate")))
          - max(when(col("treat") === 0 && col("post") === 0, col("rate")))))
        .as("did"))
    cells.crossJoin(broadcast(did))
      .select(col("treat"), col("post"), col("n"), col("n_pos"),
        col("rate"), col("did"))
      .orderBy(col("treat"), col("post"))
  }

  private[graft] val diffInDiffSql =
    """WITH e AS (
      |  SELECT epoch_ms(ts) AS ems,
      |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events
      |), mid AS (
      |  SELECT (MIN(ems) + MAX(ems)) // 2 AS m FROM e
      |), cells AS (
      |  SELECT CAST(treat AS BIGINT) AS treat,
      |    CAST(CASE WHEN ems >= m THEN 1 ELSE 0 END AS BIGINT) AS post,
      |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
      |    CAST(SUM(y) AS DOUBLE) / COUNT(*) AS rate
      |  FROM e, mid GROUP BY 1, 2
      |), did AS (
      |  SELECT
      |    (MAX(CASE WHEN treat = 1 AND post = 1 THEN rate END)
      |     - MAX(CASE WHEN treat = 1 AND post = 0 THEN rate END))
      |    - (MAX(CASE WHEN treat = 0 AND post = 1 THEN rate END)
      |       - MAX(CASE WHEN treat = 0 AND post = 0 THEN rate END)) AS did
      |  FROM cells
      |)
      |SELECT c.treat, c.post, c.n, c.n_pos, c.rate, d.did
      |FROM cells c, did d ORDER BY treat, post""".stripMargin

  // ------------------------------------------------------------- CUPED
  /** CUPED variance reduction (Deng et al. 2013 — the experimentation-
    * platform standard next to [[diffInDiff]] and the A/B z-test): the
    * pre-period per-user spend is the covariate, the post-period spend
    * the metric; θ = cov(x,y)/var(x) from EXACT integer-cent moments
    * (n·Σxy − ΣxΣy over n·Σx² − (Σx)², all BIGINT — the Pearson
    * discipline), and each arm reports its raw vs CUPED-adjusted mean
    * ȳ − θ(x̄_arm − x̄_global) plus the theoretical variance-reduction
    * ρ² = cov²/(var(x)·var(y)). Per-user sums stay exact cents (never
    * per-user mean doubles), so every moment is partition-order
    * independent; doubles appear only in the closed-form tail, written
    * identically in both engines. Honest ~0 reduction on this
    * uncorrelated synthetic corpus. */
  private def cuped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir).select($"user_id", $"ems",
      floor($"value" * 100.0 + 0.5).cast("long").as("cents"),
      when($"user_id" % 2 === 0, 1L).otherwise(0L).as("treat"))
    val mid = e.agg(expr("(min(ems) + max(ems)) div 2").as("m"))
    val u = e.crossJoin(broadcast(mid))
      .groupBy($"user_id")
      .agg(max($"treat").as("treat"),
        sum(when($"ems" < $"m", $"cents").otherwise(0L)).as("x"),
        sum(when($"ems" >= $"m", $"cents").otherwise(0L)).as("y"))
      .persist()
    val g = u.agg(count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
      sum($"y" * $"y").as("syy"))
    val th = g.select($"n", $"sx",
      (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
        ($"n" * $"sxx" - $"sx" * $"sx")).as("theta"),
      ((($"n" * $"sxy" - $"sx" * $"sy").cast("double") *
        ($"n" * $"sxy" - $"sx" * $"sy")) /
        (($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
          ($"n" * $"syy" - $"sy" * $"sy"))).as("rho2"))
    val out = u.groupBy($"treat")
      .agg(count(lit(1)).as("n_users"),
        sum($"y").as("ay"), sum($"x").as("ax"))
      .crossJoin(broadcast(th))
      .select($"treat", $"n_users",
        ($"ay".cast("double") / $"n_users" / 100.0).as("raw_mean"),
        (($"ay".cast("double") / $"n_users"
          - $"theta" * ($"ax".cast("double") / $"n_users"
            - $"sx".cast("double") / $"n")) / 100.0).as("cuped_mean"),
        $"theta", $"rho2".as("var_reduction"))
      .orderBy($"treat")
    graft.core.CachePin.sealAndRelease(out, u)
  }

  private val cupedSql =
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) AS ems,
      |    CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents,
      |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat
      |  FROM events
      |), mid AS (SELECT (MIN(ems) + MAX(ems)) // 2 AS m FROM e),
      |u AS (
      |  SELECT user_id, CAST(MAX(treat) AS BIGINT) AS treat,
      |    CAST(SUM(CASE WHEN ems < m THEN cents ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN ems >= m THEN cents ELSE 0 END) AS BIGINT) AS y
      |  FROM e, mid GROUP BY user_id
      |), g AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
      |    CAST(SUM(y*y) AS BIGINT) AS syy
      |  FROM u
      |), th AS (
      |  SELECT n, sx,
      |    CAST(n*sxy - sx*sy AS DOUBLE) / (n*sxx - sx*sx) AS theta,
      |    (CAST(n*sxy - sx*sy AS DOUBLE) * (n*sxy - sx*sy))
      |      / (CAST(n*sxx - sx*sx AS DOUBLE) * (n*syy - sy*sy)) AS rho2
      |  FROM g
      |)
      |SELECT u.treat, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(u.y) AS DOUBLE) / COUNT(*) / 100.0 AS raw_mean,
      |  (CAST(SUM(u.y) AS DOUBLE) / COUNT(*)
      |   - th.theta * (CAST(SUM(u.x) AS DOUBLE) / COUNT(*)
      |                 - CAST(th.sx AS DOUBLE) / th.n)) / 100.0 AS cuped_mean,
      |  th.theta AS theta, th.rho2 AS var_reduction
      |FROM u, th GROUP BY u.treat, th.theta, th.rho2, th.sx, th.n
      |ORDER BY treat""".stripMargin

  // -------------------------------------------------------- decile binning
  /** Equal-frequency decile binning of `value` with per-bin stats — the
    * quantile-binning feature transform. Global ntile(10) WITHOUT the
    * single-partition sort: the two-phase RankedWindow reconstruction
    * (integer arithmetic, bit-identical to the naive form). */
  private def quantileBins(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vals = ev(spark, dir).select($"value", $"event_id")
    graft.operators.RankedWindow
      .rankDesc(vals, $"value", $"event_id", tiles = 10, sealOutput = false)
      .groupBy($"quartile".cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        min($"value").as("min_value"), max($"value").as("max_value"),
        davg($"value").as("mean_value"))
      .orderBy($"bin")
  }

  private val quantileBinsSql =
    """WITH r AS (
      |  SELECT value, CAST(ntile(10) OVER (ORDER BY value DESC, event_id)
      |                     AS BIGINT) AS bin
      |  FROM events)
      |SELECT bin, count(*) AS n, min(value) AS min_value,
      |  max(value) AS max_value,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / count(value)
      |    AS mean_value
      |FROM r GROUP BY 1 ORDER BY bin""".stripMargin

  // ------------------------------------------------------------ gains table
  /** Cumulative-gains table (the model-evaluation companion to the
    * decile bins): rank events by value DESC through the two-phase
    * distributed ntile (operators/RankedWindow — no single-partition
    * sort), then per decile the positive count (purchase) and the
    * cumulative capture rate (gain) against cumulative depth — the
    * "top 20% of scores captures X% of conversions" curve. Cumulative
    * sums run over the 10-row decile table; totals broadcast back. */
  private def gainsTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vals = ev(spark, dir).select($"value", $"event_id",
      when($"event_type" === "purchase", 1L).otherwise(0L).as("pos"))
    val per = graft.operators.RankedWindow
      .rankDesc(vals, $"value", $"event_id", tiles = 10, sealOutput = false)
      .groupBy($"quartile".cast("long").as("decile"))
      .agg(count(lit(1)).as("n"), sum($"pos").as("positives"))
    val w = Window.orderBy($"decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.agg(sum($"positives").as("total_pos"),
      sum($"n").as("total_n"))
    per.withColumn("cum_pos", sum($"positives").over(w))
      .withColumn("cum_n", sum($"n").over(w))
      .crossJoin(broadcast(tot))
      .select($"decile", $"n", $"positives", $"cum_pos",
        ($"cum_pos".cast("double") / $"total_pos".cast("double")).as("gain"),
        ($"cum_n".cast("double") / $"total_n".cast("double")).as("depth"))
      .orderBy($"decile")
  }

  private val gainsTableSql =
    """WITH r AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
      |    CAST(ntile(10) OVER (ORDER BY value DESC, event_id) AS BIGINT)
      |      AS decile
      |  FROM events
      |), per AS (
      |  SELECT decile, count(*) AS n, CAST(SUM(pos) AS BIGINT) AS positives
      |  FROM r GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(positives) AS BIGINT) AS total_pos,
      |    CAST(SUM(n) AS BIGINT) AS total_n FROM per
      |), cum AS (
      |  SELECT *, CAST(SUM(positives) OVER cw AS BIGINT) AS cum_pos,
      |    CAST(SUM(n) OVER cw AS BIGINT) AS cum_n
      |  FROM per
      |  WINDOW cw AS (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT decile, n, positives, cum_pos,
      |  CAST(cum_pos AS DOUBLE) / CAST(total_pos AS DOUBLE) AS gain,
      |  CAST(cum_n AS DOUBLE) / CAST(total_n AS DOUBLE) AS depth
      |FROM cum CROSS JOIN tot ORDER BY decile""".stripMargin

  // ---------------------------------------------------- cumulative users
  /** Daily cumulative distinct users — the growth-accounting curve. The
    * count-distinct-over-expanding-window anti-pattern collapses to a
    * first-seen aggregation: min(day) per user (one shuffle), new-user
    * counts per day, and a running sum over the DAY-DOMAIN-bounded
    * table — additive, mergeable, no re-expansion at any scale. */
  private def cumulativeUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perDay = ev(spark, dir)
      .groupBy($"user_id").agg(min(expr("ems div 86400000")).as("day"))
      .groupBy($"day").agg(count(lit(1)).as("new_users"))
    perDay.withColumn("cum_users",
        sum($"new_users").over(Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy($"day")
  }

  private[graft] val cumulativeUsersSql =
    """WITH fs AS (
      |  SELECT user_id, min(epoch_ms(ts) // 86400000) AS day
      |  FROM events GROUP BY 1
      |), per AS (
      |  SELECT day, count(*) AS new_users FROM fs GROUP BY 1)
      |SELECT day, new_users,
      |  CAST(SUM(new_users) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_users
      |FROM per ORDER BY day""".stripMargin

  // -------------------------------------------------- inter-arrival profile
  /** Per-type inter-arrival profile — the traffic-shape DQ check (burst
    * vs steady) and the input to any rate-based alerting threshold:
    * consecutive same-type gaps in ms via a partitioned lag, summarized
    * min / p50 / p90 / max with the suite's ROUND(...,6) percentile
    * parity discipline. Integer gaps; one partitioned window pass. */
  private def interarrival(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"ems", $"event_id")
    ev(spark, dir)
      .withColumn("gap", $"ems" - lag($"ems", 1).over(w))
      .filter($"gap".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"),
        min($"gap").as("min_gap_ms"),
        expr("round(percentile(gap, 0.5), 6)").as("median_gap_ms"),
        expr("round(percentile(gap, 0.9), 6)").as("p90_gap_ms"),
        max($"gap").as("max_gap_ms"))
      .orderBy($"event_type")
  }

  private val interarrivalSql =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY event_type
      |      ORDER BY epoch_ms(ts), event_id) AS gap
      |  FROM events)
      |SELECT event_type, count(*) AS n_gaps,
      |  min(gap) AS min_gap_ms,
      |  ROUND(quantile_cont(gap, 0.5), 6) AS median_gap_ms,
      |  ROUND(quantile_cont(gap, 0.9), 6) AS p90_gap_ms,
      |  max(gap) AS max_gap_ms
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------- freshness SLA
  /** Per-source freshness monitor: each event type's last event time, its
    * lag behind the corpus frontier, and the 1 h SLA flag — the
    * "is this upstream stuck" check every ingest pipeline pages on.
    * One aggregation + a broadcast 1-row frontier; exact integers. */
  private def freshness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = ev(spark, dir).groupBy($"event_type")
      .agg(count(lit(1)).as("n"), max($"ems").as("last_ems"))
    val g = per.agg(max($"last_ems").as("gmax"))
    per.crossJoin(broadcast(g))
      .select($"event_type", $"n", $"last_ems",
        ($"gmax" - $"last_ems").as("lag_ms"),
        (($"gmax" - $"last_ems") > 3600000L).as("is_stale"))
      .orderBy($"event_type")
  }

  private[graft] val freshnessSql =
    """WITH per AS (
      |  SELECT event_type, count(*) AS n, max(epoch_ms(ts)) AS last_ems
      |  FROM events GROUP BY 1
      |), g AS (SELECT max(last_ems) AS gmax FROM per)
      |SELECT event_type, n, last_ems,
      |  gmax - last_ems AS lag_ms,
      |  (gmax - last_ems) > 3600000 AS is_stale
      |FROM per CROSS JOIN g ORDER BY event_type""".stripMargin

  // ------------------------------------------------ behavioral diversity
  /** Per-user behavioral diversity: Gini IMPURITY of the event-type mix,
    * 1 − Σpᵢ² = (n² − Σcᵢ²)/n² — the log-free diversity measure (Shannon
    * entropy needs ln, which is libm-dependent and breaks bit-exact
    * oracles — same trade the HLL estimator documents). Exact integers
    * until one double division; two key-local shuffles. */
  private def typeDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
      .groupBy($"user_id")
      .agg(sum($"c").as("n"), count(lit(1)).as("n_types"),
        sum($"c" * $"c").as("ss"))
      .select($"user_id", $"n", $"n_types",
        (($"n" * $"n" - $"ss").cast("double")
          / ($"n" * $"n").cast("double")).as("gini_impurity"))
      .orderBy($"user_id")
  }

  private val typeDiversitySql =
    """WITH c AS (
      |  SELECT user_id, event_type, count(*) AS c
      |  FROM events GROUP BY 1, 2
      |), g AS (
      |  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
      |    count(*) AS n_types, CAST(SUM(c * c) AS BIGINT) AS ss
      |  FROM c GROUP BY 1)
      |SELECT user_id, n, n_types,
      |  CAST(n * n - ss AS DOUBLE) / CAST(n * n AS DOUBLE) AS gini_impurity
      |FROM g ORDER BY user_id""".stripMargin

  // ---------------------------------------------------- Gini concentration
  /** Traffic-concentration audit: exact Gini coefficient of the per-user
    * event distribution (rank formula G = (2·Σ i·cᵢ − (n+1)·Σ cᵢ) /
    * (n·Σ cᵢ) over counts sorted ascending) plus the top-decile share —
    * the skew measurement that decides whether the hot-key paths
    * (SkewedAggregate, salting) are needed on a corpus. Every moment is
    * an exact integer; doubles appear in two final divisions written
    * identically in both engines. The rank runs over the per-user
    * AGGREGATE (domain-bounded, same note as ml_class_rebalance: at
    * 100 TB user counts the identical selection runs through the
    * two-phase operators/RankedWindow). */
  private def giniConcentration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = ev(spark, dir).groupBy($"user_id").agg(count(lit(1)).as("c"))
    val ranked = c.withColumn("i",
      row_number().over(Window.orderBy($"c", $"user_id")).cast("long"))
    val tot = c.agg(count(lit(1)).as("nn"))
    ranked.crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("n_users"),
        sum($"c").as("total_events"),
        sum($"i" * $"c").as("s_ic"),
        sum(when($"i" > $"nn" - expr("nn div 10"), $"c").otherwise(0L))
          .as("top_decile_events"),
        max($"nn").as("nn"))
      .select($"n_users", $"total_events", $"top_decile_events",
        ((lit(2.0) * $"s_ic".cast("double")
          - ($"nn" + 1L).cast("double") * $"total_events".cast("double"))
          / ($"nn".cast("double") * $"total_events".cast("double")))
          .as("gini"),
        ($"top_decile_events".cast("double")
          / $"total_events".cast("double")).as("top_decile_share"))
  }

  private val giniConcentrationSql =
    """WITH c AS (
      |  SELECT user_id, count(*) AS c FROM events GROUP BY 1
      |), r AS (
      |  SELECT c, user_id,
      |    CAST(row_number() OVER (ORDER BY c, user_id) AS BIGINT) AS i,
      |    (SELECT count(*) FROM c) AS nn
      |  FROM c)
      |SELECT count(*) AS n_users,
      |  CAST(SUM(c) AS BIGINT) AS total_events,
      |  CAST(SUM(CASE WHEN i > nn - nn // 10 THEN c ELSE 0 END) AS BIGINT)
      |    AS top_decile_events,
      |  (2.0 * CAST(SUM(i * c) AS DOUBLE)
      |    - CAST(max(nn) + 1 AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
      |    / (CAST(max(nn) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS gini,
      |  CAST(SUM(CASE WHEN i > nn - nn // 10 THEN c ELSE 0 END) AS DOUBLE)
      |    / CAST(SUM(c) AS DOUBLE) AS top_decile_share
      |FROM r""".stripMargin

  // ------------------------------------------------------ throttle/debounce
  /** Cooldown deduplication (throttle): per user, keep an event only if
    * ≥ 12 h passed since the previously KEPT event — the greedy
    * rate-limiting a feature pipeline applies to duplicate signals. The
    * greedy walk is inherently sequential, so it is an explicit struct
    * fold over the (ems, event_id)-sorted timestamps, identical in both
    * engines (the streaming twin carries the same state per key). */
  private def throttle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir)
      .groupBy($"user_id")
      .agg(expr("transform(array_sort(collect_list(struct(ems, event_id)))," +
        " p -> p.ems)").as("evs"))
      .select($"user_id",
        size($"evs").cast("long").as("n_events"),
        expr("aggregate(" +
          "transform(slice(evs, 2, size(evs) - 1)," +
          "  e -> named_struct('ems', e, 'kept', 0L))," +
          "named_struct('ems', evs[0], 'kept', 1L)," +
          "(acc, x) -> IF(x.ems - acc.ems >= 43200000L," +
          "  named_struct('ems', x.ems, 'kept', acc.kept + 1L), acc))")
          .as("f"))
      .select($"user_id", $"n_events",
        $"f".getField("kept").as("n_kept"),
        $"f".getField("ems").as("last_kept_ems"))
      .orderBy($"user_id")
  }

  /** Shared with the streaming twin (stream_throttle). */
  val throttleSql =
    """WITH s AS (
      |  SELECT user_id, list(epoch_ms(ts) ORDER BY epoch_ms(ts), event_id)
      |    AS vs
      |  FROM events GROUP BY 1
      |), f AS (
      |  SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
      |    list_reduce(
      |      list_prepend({'ems': vs[1], 'kept': CAST(1 AS BIGINT)},
      |        list_transform(vs[2:], e -> {'ems': e, 'kept': CAST(0 AS BIGINT)})),
      |      (acc, x) -> CASE WHEN x.ems - acc.ems >= 43200000
      |        THEN {'ems': x.ems, 'kept': acc.kept + 1} ELSE acc END) AS f
      |  FROM s)
      |SELECT user_id, n_events, f.kept AS n_kept, f.ems AS last_kept_ems
      |FROM f ORDER BY user_id""".stripMargin

  // --------------------------------------------------- token-bucket limiter
  /** Token-bucket rate limiting per user (the OTHER classic limiter next
    * to [[throttle]]'s fixed cooldown: a bucket of capacity 5 tokens
    * refilling 1/hour — bursts up to 5 allowed, sustained rate capped):
    * tokens live in exact millisecond units (1 token = 3 600 000 ms of
    * refill, capacity 18 000 000), so
    *
    *   avail = min(C, tok + Δms);  allowed ⇔ avail ≥ cost;
    *   tok' = avail − allowed·cost
    *
    * is pure integer arithmetic in the per-user sequential fold. Struct
    * accumulator field order (nall, tok, ems) satisfies the CLAUDE.md
    * sequential-eval rule: every cross-field reference points
    * own-or-later. One shuffle on user; per-key lists bounded by the
    * retention window like every fold here. */
  private def tokenBucket(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cap = 18000000L   // 5 tokens x 1h refill, in ms units
    val cost = 3600000L   // 1 token
    ev(spark, dir)
      .groupBy($"user_id")
      .agg(expr("transform(array_sort(collect_list(struct(ems, event_id)))," +
        " p -> p.ems)").as("evs"))
      .select($"user_id",
        size($"evs").cast("long").as("n_events"),
        expr(s"""aggregate(slice(evs, 2, size(evs) - 1),
          |named_struct('nall', 1L, 'tok', ${cap - cost}L, 'ems', evs[0]),
          |(acc, x) -> named_struct(
          |  'nall', acc.nall + IF(least(${cap}L, acc.tok + (x - acc.ems))
          |            >= ${cost}L, 1L, 0L),
          |  'tok', least(${cap}L, acc.tok + (x - acc.ems))
          |         - IF(least(${cap}L, acc.tok + (x - acc.ems)) >= ${cost}L,
          |             ${cost}L, 0L),
          |  'ems', x))""".stripMargin).as("f"))
      .select($"user_id", $"n_events",
        $"f".getField("nall").as("n_allowed"),
        ($"n_events" - $"f".getField("nall")).as("n_denied"),
        $"f".getField("tok").as("final_tokens_ms"))
      .orderBy($"user_id")
  }

  /** Shared with the streaming twin (stream_token_bucket). */
  private[graft] val tokenBucketSql =
    """WITH s AS (
      |  SELECT user_id, list(epoch_ms(ts) ORDER BY epoch_ms(ts), event_id)
      |    AS vs
      |  FROM events GROUP BY 1
      |), f AS (
      |  SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
      |    list_reduce(
      |      list_prepend(
      |        {'nall': CAST(1 AS BIGINT), 'tok': CAST(14400000 AS BIGINT),
      |         'ems': vs[1]},
      |        list_transform(vs[2:],
      |          e -> {'nall': CAST(0 AS BIGINT), 'tok': CAST(0 AS BIGINT),
      |                'ems': e})),
      |      (acc, x) -> {
      |        'nall': acc.nall + CASE WHEN
      |            LEAST(18000000, acc.tok + (x.ems - acc.ems)) >= 3600000
      |          THEN 1 ELSE 0 END,
      |        'tok': LEAST(18000000, acc.tok + (x.ems - acc.ems))
      |          - CASE WHEN
      |              LEAST(18000000, acc.tok + (x.ems - acc.ems)) >= 3600000
      |            THEN 3600000 ELSE 0 END,
      |        'ems': x.ems}) AS f
      |  FROM s)
      |SELECT user_id, n_events, f.nall AS n_allowed,
      |  CAST(n_events - f.nall AS BIGINT) AS n_denied,
      |  CAST(f.tok AS BIGINT) AS final_tokens_ms
      |FROM f ORDER BY user_id""".stripMargin

  // --------------------------------------------------- weighted shortest path
  /** Bounded-hop Bellman-Ford over the symmetrized supplier↔customer trade
    * graph (same graph as graph_pagerank_trade): edge cost
    * 1 + 100 div n_orders (stronger trade links are cheaper), 4 relaxation
    * rounds from supplier 1 = exact min-cost over paths of ≤ 4 edges.
    * All-integer, per-round localCheckpoint (the CLAUDE.md iterative-plan
    * rule); each round is one edge⋈dist join + a min-groupBy — node-table
    * bounded, never materializing paths. Top 20 nearest nodes. */
  private def shortestCost(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // shared session-cached weighted symmetric edges (round 14,
    // TradeGraph — same pair counts, same 1 + 100 div n_ord weights)
    val e = graft.queries.TradeGraph.symWeighted(spark, dir)
    var dist = Seq((2L, 0L)).toDF("id", "dist").localCheckpoint(true)
    for (_ <- 1 to 4) {
      val relaxed = e.join(dist.withColumnRenamed("id", "did"),
          $"src" === $"did")
        .select($"dst".as("id"), ($"dist" + $"w").as("dist"))
      dist = dist.union(relaxed)
        .groupBy($"id").agg(min($"dist").as("dist"))
        .localCheckpoint(true)
    }
    dist.select(
        row_number().over(Window.orderBy($"dist", $"id"))
          .cast("long").as("rank"),
        $"id", $"dist")
      .orderBy($"rank").limit(20)
  }

  private val shortestCostSql = {
    val rounds = (1 to 4).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT id, MIN(dist) AS dist FROM (
         |    SELECT id, dist FROM d${r - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, d.dist + e.w AS dist
         |    FROM e JOIN d${r - 1} d ON d.id = e.src
         |  ) GROUP BY id)""".stripMargin
    }.mkString(", ")
    s"""WITH rel AS MATERIALIZED (
       |  SELECT sid, cid, CAST(1 + 100 // COUNT(*) AS BIGINT) AS w FROM (
       |    SELECT DISTINCT l_orderkey, l_suppkey * 2 AS sid,
       |      o_custkey * 2 + 1 AS cid
       |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
       |  GROUP BY sid, cid),
       |e AS MATERIALIZED (
       |  SELECT sid AS src, cid AS dst, w FROM rel
       |  UNION ALL SELECT cid AS src, sid AS dst, w FROM rel),
       |d0 AS MATERIALIZED (SELECT CAST(2 AS BIGINT) AS id,
       |                           CAST(0 AS BIGINT) AS dist),
       |$rounds
       |SELECT CAST(row_number() OVER (ORDER BY dist, id) AS BIGINT) AS rank,
       |  id, dist
       |FROM d4 ORDER BY rank LIMIT 20""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_ewma" -> (ewma _),
    "evt_cusum" -> (cusum _),
    "ml_target_encoding" -> (targetEncoding _),
    "ml_correlation" -> (correlation _),
    "rel_market_basket" -> (marketBasket _),
    "dq_profile" -> (dqProfile _),
    "dq_constraints" -> (dqConstraints _),
    "evt_attribution" -> (attribution _),
    "evt_attribution_position" -> (positionAttribution _),
    "evt_survival_km" -> (survivalKm _),
    "evt_bootstrap_ci" -> (bootstrapCi _),
    "ml_diff_in_diff" -> (diffInDiff _),
    "ml_cuped" -> (cuped _),
    "ml_quantile_bins" -> (quantileBins _),
    "ml_gains_table" -> (gainsTable _),
    "evt_cumulative_users" -> (cumulativeUsers _),
    "evt_gini_concentration" -> (giniConcentration _),
    "evt_type_diversity" -> (typeDiversity _),
    "dq_freshness" -> (freshness _),
    "evt_interarrival" -> (interarrival _),
    "evt_throttle" -> (throttle _),
    "evt_token_bucket" -> (tokenBucket _),
    "graph_shortest_cost" -> (shortestCost _))

  override def oracles: Map[String, String] = Map(
    "evt_ewma" -> ewmaSql,
    "evt_cusum" -> cusumSql,
    "ml_target_encoding" -> targetEncodingSql,
    "ml_correlation" -> correlationSql,
    "rel_market_basket" -> marketBasketSql,
    "dq_profile" -> dqProfileSql,
    "dq_constraints" -> dqConstraintsSql,
    "evt_attribution" -> attributionSql,
    "evt_attribution_position" -> positionAttributionSql,
    "evt_survival_km" -> survivalKmSql,
    "evt_bootstrap_ci" -> bootstrapCiSql,
    "ml_diff_in_diff" -> diffInDiffSql,
    "ml_cuped" -> cupedSql,
    "ml_quantile_bins" -> quantileBinsSql,
    "ml_gains_table" -> gainsTableSql,
    "evt_cumulative_users" -> cumulativeUsersSql,
    "evt_gini_concentration" -> giniConcentrationSql,
    "evt_type_diversity" -> typeDiversitySql,
    "dq_freshness" -> freshnessSql,
    "evt_interarrival" -> interarrivalSql,
    "evt_throttle" -> throttleSql,
    "evt_token_bucket" -> tokenBucketSql,
    "graph_shortest_cost" -> shortestCostSql)
}
