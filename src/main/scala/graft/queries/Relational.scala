package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Exact._

/** Core relational operators over the TPC-H-ish driver tables: scans with
  * pushed-down filters/projections, hash and broadcast joins, group-by
  * aggregation, semi/anti joins, distinct, union, sort/limit, scalar
  * functions. These exercise SURVEY.md §2.2 (P1-P5), §2.5 (join family),
  * §2.6 (sort/limit/top-k/set ops) and §2.7 (scalar functions) in batch form.
  *
  * Scale notes: dimension tables (region/nation/supplier) are broadcast —
  * at 100 TB the fact-side scan parallelism is the only thing that grows.
  * Aggregations are partial-aggregated map-side by Catalyst; joins on
  * synthetic keys hash-shuffle on the join key only after pushdown prunes
  * columns at the parquet scan.
  */
object Relational extends QueryModule {

  /** TPC-H Q1-style pricing summary (ref: the windowed sum/avg/min/max/count
    * family, /root/reference/streaming/core/processors/transaction.py:54-58,
    * re-expressed as a batch group-by). Exact decimal accumulation. */
  private def q01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1999-12-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_discount) AS DOUBLE) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + filter pushdown (P1/P2): BUILDING-segment customers with
    * positive balance. Row-level output; filters reach the parquet scan. */
  private def q02(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING" && $"c_acctbal" > 0.0)
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  private val q02Sql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0.0
      |ORDER BY c_custkey""".stripMargin

  /** Top-10 orders by revenue (join + agg + top-k; TPC-H Q3 shape).
    * Revenue is exact-decimal so the sort is cross-engine deterministic;
    * orderkey tie-break. */
  private def q03(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === "MACHINERY")
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
           max(epochMs($"o_orderdate")).as("order_date_ms"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  private val q03Sql =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      |  CAST(MAX(epoch_ms(o_orderdate)) AS BIGINT) AS order_date_ms
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'MACHINERY'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Multi-way join through broadcast dimensions (region -> nation ->
    * customer/supplier), TPC-H Q5 shape. Dims are broadcast; the only
    * shuffle is the lineitem/orders join + final group-by. */
  private def q05(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.region(spark, dir)
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  private val q05Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Left-semi join (EXISTS): customers having at least one high-value order. */
  private def qSemi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigOrders = Tables.orders(spark, dir).filter($"o_totalprice" > 200000.0)
    Tables.customer(spark, dir)
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  private val qSemiSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join (NOT EXISTS): parts never shipped in bulk (qty >= 45). */
  private def qAnti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bulk = Tables.lineitem(spark, dir).filter($"l_quantity" >= 45.0)
    Tables.part(spark, dir)
      .join(bulk, $"p_partkey" === $"l_partkey", "left_anti")
      .select($"p_partkey", $"p_name")
      .orderBy($"p_partkey")
  }

  private val qAntiSql =
    """SELECT p_partkey, p_name FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey AND l_quantity >= 45.0)
      |ORDER BY p_partkey""".stripMargin

  /** Distinct aggregation (O5 family): exact distinct suppliers + parts per
    * return flag. (approx_count_distinct is the 100 TB path; the exact form
    * is the oracle-checkable one.) */
  private def qDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_suppkey").as("n_supp"),
           countDistinct($"l_partkey").as("n_part"),
           count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  private val qDistinctSql =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT l_partkey) AS n_part,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Union of two filtered branches (O6/J1: unionByName of feature streams). */
  private def qUnion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val urgent = o.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", lit("urgent").as("branch"))
    val high = o.filter($"o_orderpriority" === "2-HIGH")
      .select($"o_orderkey", lit("high").as("branch"))
    urgent.unionByName(high).orderBy($"o_orderkey", $"branch")
  }

  private val qUnionSql =
    """SELECT o_orderkey, 'urgent' AS branch FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION ALL
      |SELECT o_orderkey, 'high' AS branch FROM orders WHERE o_orderpriority = '2-HIGH'
      |ORDER BY o_orderkey, branch""".stripMargin

  /** Scalar-function suite (§2.7: round/abs/sqrt/least/greatest/pmod,
    * concat_ws, prefix predicate, epoch date parts) over orders.
    * hour-of-day/weekday via epoch arithmetic so both engines agree in UTC
    * (ref calendar features transaction.py:100-103). */
  private def qScalar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" % 97 === 0)
      .select(
        $"o_orderkey",
        round($"o_totalprice" * 0.07, 2).as("est_tax"),
        abs($"o_totalprice" - 100000.0).as("dist_100k"),
        sqrt($"o_totalprice").as("sqrt_price"),
        least($"o_totalprice", lit(150000.0)).as("capped"),
        greatest($"o_totalprice", lit(50000.0)).as("floored"),
        pmod($"o_orderkey", lit(7L)).as("key_mod7"),
        concat_ws(":", lit("order"), $"o_orderkey", $"o_orderstatus").as("row_key"),
        $"o_orderpriority".startsWith("1-").as("is_urgent"),
        // `div` = integer division on longs, matching DuckDB's `//`
        expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000").as("epoch_day"),
        expr("((unix_millis(cast(o_orderdate as timestamp)) div 86400000) + 4) % 7").as("dow"))
      .orderBy($"o_orderkey")
  }

  private val qScalarSql =
    """SELECT o_orderkey,
      |  ROUND(o_totalprice * 0.07, 2) AS est_tax,
      |  ABS(o_totalprice - 100000.0) AS dist_100k,
      |  SQRT(o_totalprice) AS sqrt_price,
      |  LEAST(o_totalprice, 150000.0) AS capped,
      |  GREATEST(o_totalprice, 50000.0) AS floored,
      |  o_orderkey % 7 AS key_mod7,
      |  CONCAT_WS(':', 'order', o_orderkey, o_orderstatus) AS row_key,
      |  o_orderpriority LIKE '1-%' AS is_urgent,
      |  epoch_ms(o_orderdate) // 86400000 AS epoch_day,
      |  ((epoch_ms(o_orderdate) // 86400000) + 4) % 7 AS dow
      |FROM orders WHERE o_orderkey % 97 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** TPC-H Q4 shape — correlated EXISTS as a conditioned left-semi join:
    * orders with at least one line item shipped > 90 days after the order
    * date, counted per priority. The EXISTS predicate lives in the JOIN
    * CONDITION (not a pre-filter on either side), the shape Catalyst
    * plans as a semi hash join with the non-equi condition evaluated at
    * probe time — one shuffle on the order key at any scale. */
  private def q04(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", epochMs($"l_shipdate").as("ship_ms"))
    Tables.orders(spark, dir)
      .withColumn("ord_ms", epochMs($"o_orderdate"))
      .join(li, $"o_orderkey" === $"l_orderkey" &&
        $"ship_ms" > $"ord_ms" + lit(90L * 86400000L), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  private val q04Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND epoch_ms(l.l_shipdate) > epoch_ms(o.o_orderdate) + 7776000000)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q13 shape — customer order-count distribution through a
    * CONDITIONED left outer join (the predicate belongs to the join, so
    * non-matching customers still appear with count 0): two aggregation
    * levels, the classic "distribution of group sizes" query. Scale: the
    * outer join shuffles on custkey; both group-bys partial-aggregate
    * map-side; the second groupBy is on the (tiny) count domain. */
  private def q13(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_custkey", $"o_orderkey")
    val perCust = Tables.customer(spark, dir)
      .join(ord, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  private val q13Sql =
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** PIVOT (cross-tab): order counts by status per priority. The value
    * list is EXPLICIT — `pivot(col, values)` skips the extra
    * distinct-collection job Spark otherwise runs, and pins the output
    * schema (the reference's fixed counter columns per status,
    * transaction.py's per-type counters, are this shape). A pivot with
    * explicit values is a single groupBy: conditional aggregation, one
    * shuffle, map-side partials — same plan at any scale. */
  private def qPivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"F", lit(0L)).as("F"),
        coalesce($"O", lit(0L)).as("O"),
        coalesce($"P", lit(0L)).as("P"))
      .orderBy($"o_orderpriority")
  }

  private val qPivotSql =
    """SELECT o_orderpriority,
      |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
      |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
      |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** ROLLUP multi-level aggregation (round 12 — the one relational
    * operator family the suite lacked): per-(returnflag, linestatus)
    * pricing cells, per-returnflag subtotals, and the grand total in ONE
    * pass. Spark plans `rollup` as a single Expand + hash aggregate —
    * one shuffle for all three grouping levels, map-side partials intact
    * — which is exactly the 100 TB shape (three separate groupBys would
    * scan and shuffle three times). GROUPING flags disambiguate rolled-up
    * NULLs from data NULLs; keys are COALESCEd to 'ALL' so the output
    * carries no NULLs and ordering is plain string order in both
    * engines. Quantity sums through the DECIMAL(25,6) discipline. */
  private def qRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(grouping($"l_returnflag").cast("long").as("g_rf"),
        grouping($"l_linestatus").cast("long").as("g_ls"),
        count(lit(1)).as("n_rows"),
        dsum($"l_quantity").as("sum_qty"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"g_rf", $"g_ls", $"n_rows", $"sum_qty")
      .orderBy($"g_rf", $"g_ls", $"returnflag", $"linestatus")
  }

  private val qRollupSql =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, returnflag, linestatus""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_rollup_pricing" -> (qRollup _),
    "rel_pivot_status" -> (qPivot _),
    "rel_q04_exists_semi" -> (q04 _),
    "rel_q13_custdist" -> (q13 _),
    "rel_q01_pricing_summary" -> (q01 _),
    "rel_q02_filter_project" -> (q02 _),
    "rel_q03_revenue_topk" -> (q03 _),
    "rel_q05_region_join" -> (q05 _),
    "rel_semi_join" -> (qSemi _),
    "rel_anti_join" -> (qAnti _),
    "rel_distinct_agg" -> (qDistinct _),
    "rel_union" -> (qUnion _),
    "rel_scalar_funcs" -> (qScalar _))

  override def oracles: Map[String, String] = Map(
    "rel_rollup_pricing" -> qRollupSql,
    "rel_pivot_status" -> qPivotSql,
    "rel_q04_exists_semi" -> q04Sql,
    "rel_q13_custdist" -> q13Sql,
    "rel_q01_pricing_summary" -> q01Sql,
    "rel_q02_filter_project" -> q02Sql,
    "rel_q03_revenue_topk" -> q03Sql,
    "rel_q05_region_join" -> q05Sql,
    "rel_semi_join" -> qSemiSql,
    "rel_anti_join" -> qAntiSql,
    "rel_distinct_agg" -> qDistinctSql,
    "rel_union" -> qUnionSql,
    "rel_scalar_funcs" -> qScalarSql)
}
