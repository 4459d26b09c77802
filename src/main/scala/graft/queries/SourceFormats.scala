package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Exact._

/** Additional relational shapes + multi-format source support:
  * TPC-H Q6 (single-scan predicate aggregate) and Q12 (shipmode priority
  * classes), plus CSV and JSON source roundtrips — the engine writes the
  * events through the text format and reads it back with an explicit
  * schema, and the oracle checks the aggregate over the original parquet
  * (roundtrip identity proves the format path preserves the data). */
object SourceFormats extends QueryModule {

  /** TPC-H Q6: revenue from discounted small-quantity lineitems. */
  private def q06(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24.0)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
           count(lit(1)).as("n_items"))
  }

  private val q06Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24.0""".stripMargin

  /** TPC-H Q12 shape: priority classes per order date year. */
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("year",
        expr("unix_millis(cast(o_orderdate as timestamp)) div 31557600000"))
      .groupBy($"year")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .as("high_priority"),
        sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .as("low_priority"))
      .orderBy($"year")
  }

  private val q12Sql =
    """SELECT epoch_ms(o_orderdate) // 31557600000 AS year,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_priority
      |FROM orders GROUP BY year ORDER BY year""".stripMargin

  /** Roundtrip the events through a text format and aggregate; the oracle
    * aggregates the original parquet — equality proves format fidelity. */
  private def roundtrip(spark: SparkSession, dir: String, format: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), epochMs(col("ts")).as("ems"))
    // scratch roundtrip dir on the tmpfs ephemeral root (round 14)
    val tmp = graft.core.EphemeralDirs.tempDir(s"graft_${format}_rt_").toString
    e.write.mode(SaveMode.Overwrite).format(format)
      .option("header", "true").save(tmp)
    val schema = e.schema
    val back = spark.read.format(format).schema(schema)
      .option("header", "true").load(tmp)
    back.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        min(col("ems")).as("min_ems"), max(col("ems")).as("max_ems"))
      .orderBy(col("event_type"))
  }

  private val roundtripSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
      |  MIN(epoch_ms(ts)) AS min_ems, MAX(epoch_ms(ts)) AS max_ems
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** ROLLUP hierarchy totals (OLAP surface): per (returnflag, linestatus),
    * per returnflag subtotal, and grand total in one pass. Grouping-null
    * markers are coalesced to 'ALL' so cross-engine null ordering never
    * matters. */
  private def rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n", $"sum_qty")
      .orderBy($"returnflag", $"linestatus")
  }

  private val rollupSql =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** CUBE totals (completes the grouping-sets family next to ROLLUP):
    * all four grouping combinations of (priority, status) in one pass —
    * Catalyst expands the cube into a single Expand + one aggregation
    * (rows ×4 pre-aggregation, map-side partials apply), not four scans.
    * Grouping nulls are coalesced to 'ALL' as in rel_rollup_totals. */
  private def cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .cube($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
      .select(coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        $"n", $"sum_price")
      .orderBy($"priority", $"status")
  }

  private val cubeSql =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COALESCE(o_orderstatus, 'ALL') AS status,
      |  count(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  /** Window ranking family over suppliers by shipped quantity: rank,
    * dense_rank, percent_rank, ntile(4). Exact-decimal totals keep the
    * ordering cross-engine deterministic. Ranked via the two-phase
    * distributed construction (graft.operators.RankedWindow) — no
    * single-partition global sort even when the dimension grows 100×. */
  private def windowRanks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perSupp = Tables.lineitem(spark, dir)
      .groupBy($"l_suppkey")
      .agg(dsum($"l_quantity").as("sum_qty"))
    graft.operators.RankedWindow
      .rankDesc(perSupp, $"sum_qty", $"l_suppkey", tiles = 4)
      .orderBy($"rnk")
  }

  private val windowRanksSql =
    """WITH per_supp AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT l_suppkey, sum_qty,
      |  CAST(rank() OVER w AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER w AS BIGINT) AS dense_rnk,
      |  percent_rank() OVER w AS pct_rank,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM per_supp
      |WINDOW w AS (ORDER BY sum_qty DESC, l_suppkey)
      |ORDER BY rnk""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_rollup_totals" -> (rollup _),
    "rel_cube_totals" -> (cube _),
    "rel_window_ranks" -> (windowRanks _),
    "rel_q06_predicate_agg" -> (q06 _),
    "rel_q12_priority_classes" -> (q12 _),
    "src_csv_roundtrip" -> ((s: SparkSession, d: String) => roundtrip(s, d, "csv")),
    "src_json_roundtrip" -> ((s: SparkSession, d: String) => roundtrip(s, d, "json")))

  override def oracles: Map[String, String] = Map(
    "rel_rollup_totals" -> rollupSql,
    "rel_cube_totals" -> cubeSql,
    "rel_window_ranks" -> windowRanksSql,
    "rel_q06_predicate_agg" -> q06Sql,
    "rel_q12_priority_classes" -> q12Sql,
    "src_csv_roundtrip" -> roundtripSql,
    "src_json_roundtrip" -> roundtripSql)
}
