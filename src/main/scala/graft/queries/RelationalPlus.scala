package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import Exact._

/** Second TPC-H-shape relational pack (Q7/Q8/Q9/Q11/Q14/Q15/Q16/Q17/Q18/
  * Q19/Q20/Q21/Q22 adapted to the driver tables — no partsupp/commitdate/
  * phone columns, so the predicates move to the columns that exist; the
  * plan SHAPES are the point): bilateral join-through-two-dimension-paths,
  * market-share ratio, profit rollup, global-fraction HAVING (Q11),
  * conditional-share projection, scalar-subquery max, NOT-IN distinct
  * rollup (Q16), correlated per-group average, group-HAVING top-k,
  * OR-of-ANDs pushdown, nested-semi-join threshold chain (Q20),
  * exists/not-exists waiting-supplier count (Q21), and anti-join with an
  * aggregate threshold. With Q1-Q6/Q10/Q12/Q13 elsewhere this completes
  * all 22 TPC-H query shapes.
  *
  * Scale notes: every dimension (region/nation/supplier/part and 1-row
  * aggregates) is broadcast; facts shuffle only for their own group-bys.
  * The OR-of-ANDs predicate in q19 is pushed to the scan as a residual
  * filter after partition pruning; q17's per-part average is a
  * fact-side group-by rejoined broadcast (the two-pass "avg then filter"
  * plan that avoids a window over the whole fact table).
  */
object RelationalPlus extends QueryModule {

  // ---------------------------------------------------------------- Q7
  /** Volume shipping between two nations: revenue by (supplier nation,
    * customer nation, ship year) for the NATION_3 <-> NATION_19 pair. */
  private def q07(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n1 = Tables.nation(spark, dir)
      .select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select($"n_nationkey".as("ck"), $"n_name".as("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(n1), $"s_nationkey" === $"sk")
      .join(broadcast(n2), $"c_nationkey" === $"ck")
      .filter($"supp_nation".isin("NATION_3", "NATION_19") &&
        $"cust_nation".isin("NATION_3", "NATION_19") &&
        $"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  private val q07Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_3', 'NATION_19')
      |  AND n2.n_name IN ('NATION_3', 'NATION_19')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- Q8
  /** Market share: fraction of ASIA-customer revenue supplied by NATION_5,
    * per order year. Numerator and denominator accumulate exactly in
    * decimal; the single double division happens identically last. */
  private def q08(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnation = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("ck"))
    val snation = Tables.nation(spark, dir)
      .select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
    val vol = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(cnation), $"c_nationkey" === $"ck")
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(snation), $"s_nationkey" === $"sk")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(
        (dsum(when($"supp_nation" === "NATION_5", vol).otherwise(lit(0.0))) /
          dsum(vol)).as("mkt_share"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_year")
  }

  private val q08Sql =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_5'
      |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
      |    AS mkt_share,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE r_name = 'ASIA'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- Q9
  /** Product-type profit rollup: revenue on 'red' parts by supplier
    * nation and order year (partsupp cost column absent — revenue-only
    * profit, the join/rollup shape intact). */
  private def q09(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val redParts = Tables.part(spark, dir).filter($"p_name".contains("red"))
      .select($"p_partkey")
    val snation = Tables.nation(spark, dir)
      .select($"n_nationkey".as("sk"), $"n_name".as("nation"))
    Tables.lineitem(spark, dir)
      .join(broadcast(redParts), $"l_partkey" === $"p_partkey")
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(snation), $"s_nationkey" === $"sk")
      .groupBy($"nation", year($"o_orderdate").cast("long").as("o_year"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  private val q09Sql =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // ---------------------------------------------------------------- Q14
  /** Conditional-share projection: ECONOMY-type revenue share per ship
    * month (the PROMO-share shape; month keyed as yyyymm BIGINT). */
  private def q14(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vol = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), $"l_partkey" === $"p_partkey")
      .groupBy((year($"l_shipdate") * 100 + month($"l_shipdate"))
        .cast("long").as("ship_month"))
      .agg(
        (lit(100.0) *
          dsum(when($"p_type" === "ECONOMY", vol).otherwise(lit(0.0))) /
          dsum(vol)).as("economy_share"),
        count(lit(1)).as("n_items"))
      .orderBy($"ship_month")
  }

  private val q14Sql =
    """SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ship_month,
      |  100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'ECONOMY'
      |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
      |    AS economy_share,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- Q15
  /** Top supplier by 1996-H1 revenue (scalar-subquery max shape, done as
    * a window max so no second scan; decimal-exact revenue makes the
    * double equality deterministic). */
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-07-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("total_revenue"))
    rev.withColumn("mx", max($"total_revenue").over(Window.partitionBy()))
      .filter($"total_revenue" === $"mx")
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  private val q15Sql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- Q17
  /** Small-quantity-order revenue: average yearly revenue lost if Brand#7
    * orders below half the part's average quantity were not taken —
    * the correlated per-group-average shape, two-pass (group-by then
    * broadcast rejoin), not a window over the fact table. */
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val brand = Tables.part(spark, dir).filter($"p_brand" === "Brand#7")
      .select($"p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(brand), $"l_partkey" === $"p_partkey")
    val avgQty = li.groupBy($"l_partkey".as("ak"))
      .agg(davg($"l_quantity").as("avg_qty"))
    li.join(broadcast(avgQty), $"l_partkey" === $"ak")
      .filter($"l_quantity" < lit(0.5) * $"avg_qty")
      .agg((dsum($"l_extendedprice") / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  private val q17Sql =
    """WITH li AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#7'
      |), aq AS (
      |  SELECT l_partkey AS ak,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
      |      / COUNT(l_quantity) AS DOUBLE) AS avg_qty
      |  FROM li GROUP BY 1)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_small
      |FROM li JOIN aq ON l_partkey = ak
      |WHERE l_quantity < 0.5 * avg_qty""".stripMargin

  // ---------------------------------------------------------------- Q18
  /** Large-volume orders: HAVING over a fact group-by, rejoined to its
    * dimensions, top-20 by price. */
  private def q18(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(dsum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 150.0)
    bigOrders
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey",
        epochMs($"o_orderdate").as("o_orderdate_ms"), $"o_totalprice",
        $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(20)
  }

  private val q18Sql =
    """WITH big AS (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) > 150.0)
      |SELECT c_name, c_custkey, o_orderkey,
      |  CAST(epoch_ms(o_orderdate) AS BIGINT) AS o_orderdate_ms,
      |  o_totalprice, sum_qty
      |FROM big JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- Q19
  /** OR-of-ANDs predicate pushdown: revenue from three disjoint
    * (brand, size-range, quantity-range) clauses — one scan, the whole
    * disjunction evaluated as a residual filter at the scan. */
  private def q19(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cond =
      ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
        $"l_quantity".between(1.0, 15.0)) ||
      ($"p_brand" === "Brand#2" && $"p_size".between(10, 30) &&
        $"l_quantity".between(10.0, 25.0)) ||
      ($"p_brand" === "Brand#3" && $"p_size".between(20, 50) &&
        $"l_quantity".between(20.0, 35.0))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), $"l_partkey" === $"p_partkey")
      .filter(cond)
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val q19Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1.0 AND 15.0)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10.0 AND 25.0)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20.0 AND 35.0)"""
      .stripMargin

  // ---------------------------------------------------------------- Q22
  /** Idle high-balance customers: above the average positive balance with
    * no high-value order — 1-row-aggregate broadcast threshold + anti
    * join, rolled up by market segment. */
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter($"c_acctbal" > 0.0)
      .agg(davg($"c_acctbal").as("avg_bal"))
    val bigOrders = Tables.orders(spark, dir)
      .filter($"o_totalprice" > 400000.0).select($"o_custkey")
    cust.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("numcust"), dsum($"c_acctbal").as("totacctbal"))
      .orderBy($"c_mktsegment")
  }

  private val q22Sql =
    """SELECT c_mktsegment, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
      |      / COUNT(c_acctbal) AS DOUBLE)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- Q11
  /** Important-stock rollup (partsupp absent — lineitem is the supply
    * fact): per-part supply value from NATION_3 suppliers, kept when the
    * part's value exceeds 0.1% of the nation's total. The total is the
    * same decimal accumulation as the per-part sums (decimal addition is
    * exact and associative), broadcast as a 1-row aggregate. */
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val suppIn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter($"n_name" === "NATION_3")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(suppIn), $"l_suppkey" === $"s_suppkey")
      .select($"l_partkey", $"l_extendedprice")
    val total = li.agg(dsum($"l_extendedprice").as("tot"))
    li.groupBy($"l_partkey")
      .agg(dsum($"l_extendedprice").as("value"))
      .crossJoin(broadcast(total))
      .filter($"value" > lit(0.001) * $"tot")
      .select($"l_partkey", $"value")
      .orderBy($"value".desc, $"l_partkey")
  }

  private val q11Sql =
    """WITH supp AS (
      |  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_3'),
      |li AS MATERIALIZED (
      |  SELECT l_partkey, l_extendedprice
      |  FROM lineitem JOIN supp ON l_suppkey = s_suppkey),
      |val AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS value
      |  FROM li GROUP BY 1)
      |SELECT l_partkey, value FROM val
      |WHERE value > 0.001 *
      |  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) FROM li)
      |ORDER BY value DESC, l_partkey""".stripMargin

  // ---------------------------------------------------------------- Q16
  /** Parts/supplier relationship count (s_comment absent — negative
    * balance stands in for the complaint filter): distinct suppliers per
    * (brand, type, size) over a NOT-IN-excluded supplier set, ordered by
    * count. The part filter is broadcast; the anti join against the
    * 6-row complainer set is broadcast too. */
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir)
      .filter($"p_brand" =!= "Brand#1" && $"p_type" =!= "STANDARD" &&
        $"p_size".isin(1, 4, 9, 14, 19, 24, 29, 34))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val complainers = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0.0).select($"s_suppkey")
    Tables.lineitem(spark, dir)
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(complainers), $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'STANDARD'
      |  AND p_size IN (1,4,9,14,19,24,29,34)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------- Q20
  /** Potential part promotion (availqty absent — a supplier "holds excess
    * stock" when it shipped over 30% of a blue part's 1996 volume):
    * EUROPE suppliers semi-joined through the nested
    * per-(supplier,part) vs per-part aggregate threshold. Both aggregate
    * sides shuffle once on l_partkey; everything else is broadcast. */
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blueParts = Tables.part(spark, dir)
      .filter($"p_name".contains("blue")).select($"p_partkey")
    val li96 = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(blueParts), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
    val per = li96.groupBy($"l_partkey", $"l_suppkey")
      .agg(dsum($"l_quantity").as("qty"))
    val tot = li96.groupBy($"l_partkey".as("tk"))
      .agg(dsum($"l_quantity").as("tqty"))
    val excess = per.join(tot, $"l_partkey" === $"tk")
      .filter($"qty" > lit(0.3) * $"tqty")
      .select($"l_suppkey").distinct()
    val euroNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    Tables.supplier(spark, dir)
      .join(broadcast(euroNations), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(excess), $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  private val q20Sql =
    """WITH li96 AS MATERIALIZED (
      |  SELECT l_partkey, l_suppkey, l_quantity
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%blue%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'),
      |per AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS qty
      |  FROM li96 GROUP BY 1, 2),
      |tot AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS tqty
      |  FROM li96 GROUP BY 1)
      |SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM per JOIN tot USING (l_partkey)
      |    WHERE qty > 0.3 * tqty)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- Q21
  /** Suppliers who kept orders waiting (commitdate/receiptdate absent —
    * "late" = shipped more than 60 days after the order date): NATION_19
    * suppliers that were the SOLE late supplier on a multi-supplier 'F'
    * order. The exists / not-exists pair compiles to per-order distinct
    * counts (nsupp > 1, nlate = 1) — one shuffle on l_orderkey instead of
    * two correlated subquery scans. */
  private def q21(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l1 = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS")).as("late"))
    val perOrder = l1.groupBy($"l_orderkey".as("ok"))
      .agg(countDistinct($"l_suppkey").as("nsupp"),
        countDistinct(when($"late", $"l_suppkey")).as("nlate"))
    l1.filter($"late").select($"l_orderkey", $"l_suppkey").distinct()
      .join(perOrder, $"l_orderkey" === $"ok")
      .filter($"nsupp" > 1 && $"nlate" === 1)
      .join(broadcast(Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir).filter($"n_name" === "NATION_19")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  private val q21Sql =
    """WITH l1 AS MATERIALIZED (
      |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F')
      |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM l1
      |      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY) w
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_19'
      |  AND EXISTS (SELECT 1 FROM l1 x
      |    WHERE x.l_orderkey = w.l_orderkey AND x.l_suppkey <> w.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM l1 y
      |    WHERE y.l_orderkey = w.l_orderkey AND y.l_suppkey <> w.l_suppkey
      |      AND y.l_shipdate > y.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // ----------------------------------------------------------- unpivot
  /** UNPIVOT (wide → long) via `stack` — the complement of
    * rel_pivot_status: the four lineitem measures melted into
    * (measure, value) rows and re-aggregated. stack() is a generator
    * inside whole-stage codegen — the melt never materializes wider than
    * the source scan; the oracle is the explicit UNION ALL the operator
    * abbreviates. */
  private def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(expr("stack(4, " +
        "'discount', l_discount, 'extendedprice', l_extendedprice, " +
        "'quantity', l_quantity, 'tax', l_tax) AS (measure, v)"))
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), dsum(col("v")).as("sum_value"))
      .orderBy(col("measure"))

  private val unpivotMeasuresSql =
    """WITH m AS (
      |  SELECT 'discount' AS measure, l_discount AS v FROM lineitem
      |  UNION ALL
      |  SELECT 'extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT 'quantity', l_quantity FROM lineitem
      |  UNION ALL
      |  SELECT 'tax', l_tax FROM lineitem)
      |SELECT measure, count(*) AS n,
      |  CAST(SUM(CAST(v AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |FROM m GROUP BY measure ORDER BY measure""".stripMargin

  // ----------------------------------------------------------- skyline
  /** 2-D skyline (Pareto frontier) over part (minimize size AND retail
    * price): a part is dominated iff some part is no larger on both
    * dimensions and strictly better on one. The block-nested-loop
    * formulation is quadratic; this is the distributed two-phase plan —
    * (1) per-x min(y) (one shuffle, output bounded by the x DOMAIN, not
    * the row count), (2) strict-prefix min over that domain-bounded
    * table (the only unpartitioned window, ≤|x| rows), (3) broadcast the
    * frontier thresholds back to the fact scan. Survivors: y equals its
    * x-group min AND beats every strictly-smaller-x group's min; equal
    * points don't dominate each other, so exact duplicates co-survive. */
  private def skyline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir)
      .select($"p_partkey", $"p_size".cast("long").as("p_size"),
        $"p_retailprice")
    val perSize = p.groupBy($"p_size").agg(min($"p_retailprice").as("ymin"))
    val prefix = perSize.withColumn("min_y_lt",
      min($"ymin").over(Window.orderBy($"p_size")
        .rowsBetween(Window.unboundedPreceding, -1)))
    p.join(broadcast(prefix), Seq("p_size"))
      .filter($"p_retailprice" === $"ymin" &&
        ($"min_y_lt".isNull || $"p_retailprice" < $"min_y_lt"))
      .select($"p_partkey", $"p_size", $"p_retailprice")
      .orderBy($"p_size", $"p_partkey")
  }

  private val skylineSql =
    """WITH per_size AS (
      |  SELECT CAST(p_size AS BIGINT) AS p_size,
      |    min(p_retailprice) AS ymin
      |  FROM part GROUP BY 1
      |), prefix AS (
      |  SELECT p_size, ymin,
      |    min(ymin) OVER (ORDER BY p_size
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS min_y_lt
      |  FROM per_size)
      |SELECT p.p_partkey, pr.p_size, p.p_retailprice
      |FROM part p JOIN prefix pr ON CAST(p.p_size AS BIGINT) = pr.p_size
      |WHERE p.p_retailprice = pr.ymin
      |  AND (pr.min_y_lt IS NULL OR p.p_retailprice < pr.min_y_lt)
      |ORDER BY pr.p_size, p.p_partkey""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_q07_volume_shipping" -> (q07 _),
    "rel_q08_market_share" -> (q08 _),
    "rel_q09_product_profit" -> (q09 _),
    "rel_q11_important_stock" -> (q11 _),
    "rel_q16_supplier_counts" -> (q16 _),
    "rel_q20_excess_stock" -> (q20 _),
    "rel_q21_waiting_supplier" -> (q21 _),
    "rel_q14_type_share" -> (q14 _),
    "rel_q15_top_supplier" -> (q15 _),
    "rel_q17_small_quantity" -> (q17 _),
    "rel_q18_large_orders" -> (q18 _),
    "rel_q19_disjunctive" -> (q19 _),
    "rel_q22_idle_customers" -> (q22 _),
    "rel_skyline" -> (skyline _),
    "rel_unpivot" -> (unpivotMeasures _))

  override def oracles: Map[String, String] = Map(
    "rel_q07_volume_shipping" -> q07Sql,
    "rel_q08_market_share" -> q08Sql,
    "rel_q09_product_profit" -> q09Sql,
    "rel_q11_important_stock" -> q11Sql,
    "rel_q16_supplier_counts" -> q16Sql,
    "rel_q20_excess_stock" -> q20Sql,
    "rel_q21_waiting_supplier" -> q21Sql,
    "rel_q14_type_share" -> q14Sql,
    "rel_q15_top_supplier" -> q15Sql,
    "rel_q17_small_quantity" -> q17Sql,
    "rel_q18_large_orders" -> q18Sql,
    "rel_q19_disjunctive" -> q19Sql,
    "rel_q22_idle_customers" -> q22Sql,
    "rel_skyline" -> skylineSql,
    "rel_unpivot" -> unpivotMeasuresSql)
}
