package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Exact._

/** Physical-layout operators — the two table-layout techniques a 100 TB
  * deployment leans on hardest (ref: the reference stores features keyed
  * by entity and partitions its offline parquet by date —
  * feature_repo/feature_store.yaml entity keys + the date-partitioned
  * offline store layout):
  *
  *   - '''Bucketed sort-merge join''' (`rel_bucketed_join`): both join
  *     sides are written `bucketBy(8, custkey) sortBy(custkey)` and the
  *     fact-dim join then runs with ZERO Exchange — bucket layout IS the
  *     shuffle, paid once at write time and amortized over every
  *     subsequent join. `LayoutSpec` asserts the executed plan has a
  *     SortMergeJoin and no Exchange below the aggregation. At 100 TB
  *     this is the difference between re-shuffling 100 TB per join and
  *     reading co-located buckets at scan speed.
  *   - '''Partition-pruned scan''' (`src_partition_pruning`): events are
  *     written `partitionBy(day)` and read back with a day-literal
  *     filter; the scan lists ONLY the matching directory
  *     (PartitionFilters in the plan — asserted by `LayoutSpec`), so a
  *     one-day query over a year of data touches 1/365th of the files.
  *
  * Correctness: results are layout-independent (a join is a join), so
  * the DuckDB oracles run the logical query on the raw tables; the hash
  * match proves the layout machinery changes the PLAN, not the answer.
  * Value sums quantize to exact integer micro-units (events.value
  * carries full double precision — a DECIMAL(25,6) cast would round and
  * the engines tie-break differently; the FLOOR(x*1e6+0.5) quantization
  * is the same exact integer in both).
  */
object LayoutOps extends QueryModule {

  /** Stable per-dataset tag so table names don't collide when one session
    * runs several scale factors (ScaleCheck does). */
  private def tag(dir: String): String =
    math.abs(dir.hashCode).toString

  /** Writes the two join sides bucketed+sorted on the join key and
    * returns the JOIN-ONLY frame (pre-aggregation) — exposed separately
    * so LayoutSpec can assert the join subplan is Exchange-free without
    * the downstream groupBy's own (correct, tiny) shuffle muddying the
    * assertion. */
  private[graft] def bucketedJoinPair(
      spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = tag(dir)
    val ct = s"graft_bkt_customer_$t"
    val ot = s"graft_bkt_orders_$t"
    // rebuild the layout only once per (session, dataset): the write cost
    // is the amortized one-time shuffle, not part of the join
    if (!spark.catalog.tableExists(ct) || !spark.catalog.tableExists(ot)) {
      val base = graft.core.EphemeralDirs.tempDir("graft_bkt_").toString
      Tables.customer(spark, dir)
        .select($"c_custkey", $"c_mktsegment")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$base/customer").mode("overwrite").saveAsTable(ct)
      Tables.orders(spark, dir)
        .select($"o_custkey", $"o_totalprice")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$base/orders").mode("overwrite").saveAsTable(ot)
    }
    val c = spark.table(ct)
    val o = spark.table(ot)
    // hint("merge") keeps the small side from broadcasting at test scale —
    // the point is the SMB plan a 100 TB fact-fact join would use
    c.hint("merge").join(o.hint("merge"), c("c_custkey") === o("o_custkey"))
  }

  /** Revenue per market segment off the bucketed layout. Money stays in
    * exact cents (o_totalprice has 2 decimals). */
  private def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bucketedJoinPair(spark, dir)
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(floor($"o_totalprice" * 100.0 + 0.5).cast("long"))
          .cast("long").as("revenue_cents"))
      .orderBy($"c_mktsegment")
  }

  private val bucketedJoinSql =
    """SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
      |    AS BIGINT) AS revenue_cents
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin

  /** The partitioned layout + the pruned read frame (pre-aggregation),
    * exposed for LayoutSpec's PartitionFilters assertion. Filters to the
    * dataset's FIRST day — a data-derived literal, so the pruning is
    * static (plan-time), the strongest form. */
  private[graft] def prunedDayScan(
      spark: SparkSession, dir: String): (DataFrame, Long) = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .withColumn("ems", epochMs($"ts"))
      .withColumn("d", expr("ems div 86400000"))
      .withColumn("micro", floor($"value" * 1000000.0 + 0.5).cast("long"))
    val t = tag(dir)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_part_$t"
    if (!new java.io.File(s"$base/_SUCCESS").exists()) {
      ev.select($"event_type", $"micro", $"d")
        .write.partitionBy("d").mode("overwrite").parquet(base)
    }
    // bounded driver-side literal: one MIN over the day column
    val d0 = ev.agg(min($"d")).head().getLong(0)
    (spark.read.parquet(base).filter($"d" === d0), d0)
  }

  /** Per-type profile of the first day, answered from the date-partitioned
    * layout with the scan pruned to that one day's directory. */
  private def partitionPruning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (day, _) = prunedDayScan(spark, dir)
    day.groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"micro").cast("long").as("micro_sum"))
      .orderBy($"event_type")
  }

  private val partitionPruningSql =
    """WITH ev AS (
      |  SELECT event_type, epoch_ms(ts) // 86400000 AS d,
      |    CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS micro
      |  FROM events
      |), m AS (SELECT MIN(d) AS d0 FROM ev)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(micro) AS BIGINT) AS micro_sum
      |FROM ev, m WHERE ev.d = m.d0
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Parquet schema evolution on read: generation 1 of the layout lacks
    * the `day` column, generation 2 (odd event_ids — a deterministic
    * split standing in for "files written after the schema change") adds
    * it; `mergeSchema` unifies on read with NULL back-fill, and the
    * aggregation counts exactly which rows carry the new column. The
    * file-format twin of the Avro v1→v2 reader (`evt_schema_evolution`).
    * Oracle recomputes from the raw events — the layout must change the
    * files, not the answer. */
  private def schemaMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .withColumn("ems", epochMs($"ts"))
      .withColumn("micro", floor($"value" * 1000000.0 + 0.5).cast("long"))
      .withColumn("gen2", pmod($"event_id", lit(2L)) === 1L)
    val t = tag(dir)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_merge_$t"
    // guard on BOTH generations' _SUCCESS (r8 advice: a gen1-ok/gen2-failed
    // partial write must rebuild, not silently serve a one-generation layout)
    if (!new java.io.File(s"$base/gen1/_SUCCESS").exists() ||
        !new java.io.File(s"$base/gen2/_SUCCESS").exists()) {
      ev.filter(!$"gen2").select($"event_type", $"micro")
        .write.mode("overwrite").parquet(s"$base/gen1")
      ev.filter($"gen2")
        .select($"event_type", $"micro", expr("ems div 86400000").as("day"))
        .write.mode("overwrite").parquet(s"$base/gen2")
    }
    spark.read.option("mergeSchema", "true")
      .parquet(s"$base/gen1", s"$base/gen2")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        count($"day").as("n_evolved"),
        sum($"micro").cast("long").as("micro_sum"),
        sum(when($"day".isNotNull, $"micro")).cast("long")
          .as("micro_sum_evolved"))
      .orderBy($"event_type")
  }

  private val schemaMergeSql =
    """WITH ev AS (
      |  SELECT event_type,
      |    CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS micro,
      |    (event_id % 2 = 1) AS gen2
      |  FROM events
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN gen2 THEN 1 ELSE 0 END) AS BIGINT) AS n_evolved,
      |  CAST(SUM(micro) AS BIGINT) AS micro_sum,
      |  CAST(SUM(CASE WHEN gen2 THEN micro END) AS BIGINT)
      |    AS micro_sum_evolved
      |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------- Z-order clustering
  /** Morton-interleaved z-value of (user_id, day): bit i of each 16-bit
    * coordinate lands at output bits 2i / 2i+1, so sorting by z gives
    * every file a NARROW range in BOTH dimensions — the multi-dimensional
    * file-skipping layout Delta/Iceberg ship as OPTIMIZE ZORDER BY. A
    * single-dimension sort localizes only its own column: a day-sorted
    * layout answers day predicates from 1-2 files but scans EVERY file
    * for a user predicate (each file spans all users); the z-curve
    * answers both from ~sqrt-shaped file subsets. 16-bit coordinates
    * cover this corpus (150 users, 30 days); a production table
    * interleaves 32+32 into a 64-bit z the same way (radix widening,
    * like the winnowing position radix). Pure integer bit arithmetic —
    * deterministic, and the graded result is layout-independent so the
    * oracle runs the logical query on the raw table: the hash match
    * proves the layout changed the FILES, not the answer (LayoutSpec
    * measures the actual per-file min/max skipping, both dimensions). */
  private[graft] val zExpr =
    """aggregate(sequence(0, 15), 0L, (acc, i) ->
      |  acc
      |  | shiftleft(shiftright(pmod(user_id, 65536), cast(i as int)) & 1,
      |      cast(2 * i as int))
      |  | shiftleft(shiftright(pmod(d, 65536), cast(i as int)) & 1,
      |      cast(2 * i + 1 as int)))""".stripMargin

  /** Writes the z-ordered layout once per (session, dataset); 16 files
    * via range-partition on z + in-file z sort, so parquet min/max
    * stats (file-level here; row-group-level on production block sizes)
    * are tight in both user_id and d. */
  private[graft] def zorderLayout(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val t = tag(dir)
    // pid-namespaced like StreamingPipelines.ckptRoot: two concurrent
    // forked JVMs (sbt test + Verify) must not race the first-time write,
    // and a stale layout from a previous binary must not survive a code
    // change to the written columns (round-10 advice).
    val pid = ProcessHandle.current().pid()
    val base =
      s"${System.getProperty("java.io.tmpdir")}/graft_zorder_p${pid}_$t"
    if (!new java.io.File(s"$base/_SUCCESS").exists()) {
      Tables.events(spark, dir)
        .withColumn("ems", epochMs($"ts"))
        .withColumn("d", expr("ems div 86400000"))
        .withColumn("micro", floor($"value" * 1000000.0 + 0.5).cast("long"))
        .select($"event_id", $"event_type", $"user_id", $"d", $"micro")
        .withColumn("z", expr(zExpr))
        .repartitionByRange(16, $"z")
        .sortWithinPartitions($"z")
        .write.mode("overwrite").parquet(base)
    }
    base
  }

  /** 2-D point profile (the first event's user and day — data-derived, so
    * at least one row exists) answered off the z-ordered layout; both
    * predicate columns reach the parquet reader as pushed filters over
    * tight per-file stats. */
  private def zorderScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = zorderLayout(spark, dir)
    val first = Tables.events(spark, dir)
      .withColumn("ems", epochMs($"ts"))
      .orderBy($"event_id")
      .select($"user_id", expr("ems div 86400000").as("d"))
      .head()
    val (u0, d0) = (first.getLong(0), first.getLong(1))
    spark.read.parquet(base)
      .filter($"user_id" === u0 && $"d" === d0)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"micro").cast("long").as("micro_sum"))
      .orderBy($"event_type")
  }

  private val zorderScanSql =
    """WITH ev AS (
      |  SELECT event_id, event_type, user_id,
      |    epoch_ms(ts) // 86400000 AS d,
      |    CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS micro
      |  FROM events
      |), m AS (
      |  SELECT user_id AS u0, d AS d0 FROM ev ORDER BY event_id LIMIT 1
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(micro) AS BIGINT) AS micro_sum
      |FROM ev, m WHERE user_id = u0 AND d = d0
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_bucketed_join" -> (bucketedJoin _),
    "src_partition_pruning" -> (partitionPruning _),
    "src_schema_merge" -> (schemaMerge _),
    "src_zorder_scan" -> (zorderScan _))

  override def oracles: Map[String, String] = Map(
    "rel_bucketed_join" -> bucketedJoinSql,
    "src_partition_pruning" -> partitionPruningSql,
    "src_schema_merge" -> schemaMergeSql,
    "src_zorder_scan" -> zorderScanSql)
}
