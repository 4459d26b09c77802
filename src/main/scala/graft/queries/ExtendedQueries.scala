package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.AvroCodec
import Exact._

/** Remaining SURVEY.md §2 inventory items, each under the oracle gate:
  * O7 rolling last-N gauges, J3 cross-entity features, §1.2 schema
  * evolution (v1/v2 superset read), S3/S4 Avro encode/decode roundtrip,
  * §2.7 validation/coalesce defaults, and additional relational breadth
  * (HAVING, returned-revenue top-k). */
object ExtendedQueries extends QueryModule {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).withColumn("ems", epochMs(col("ts")))

  // ------------------------------------------------------------------- O7
  /** Rolling last-100-events gauges per user (the fraud-rate/accuracy ring
    * buffer, ref streaming/core/fraud_detector.py:241-265, 419-443):
    * ROWS-frame windows keep running partials, not buffered rows. */
  private def rollingGauges(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ems"), col("event_id")).rowsBetween(-99, 0)
    ev(spark, dir).select(
      col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("n_last100"),
      (sum(when(col("event_type") === "error", 1).otherwise(0)).over(w) /
        count(lit(1)).over(w)).as("error_rate_last100"),
      max(col("value")).over(w).as("max_value_last100"))
      .orderBy(col("event_id"))
  }

  private val rollingGaugesSql =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS n_last100,
      |  SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER w
      |    / count(*) OVER w AS error_rate_last100,
      |  MAX(value) OVER w AS max_value_last100
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
      |             ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------- J3
  /** Cross-entity (user x pseudo-device) feature view (ref
    * feast/feature_views.py:187-205): composite-key aggregation plus the
    * per-user device-diversity rollup. Pseudo-device = props.k mod 5. */
  private def crossEntity(spark: SparkSession, dir: String): DataFrame = {
    val withDev = ev(spark, dir)
      .withColumn("device_id",
        pmod(get_json_object(col("props"), "$.k").cast("long"), lit(5L)))
    val perPair = withDev.groupBy(col("user_id"), col("device_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    val perUser = Window.partitionBy(col("user_id"))
    perPair
      .withColumn("device_count", count(lit(1)).over(perUser))
      .withColumn("primary_device_ratio",
        max(col("n_events")).over(perUser) / sum(col("n_events")).over(perUser))
      .orderBy(col("user_id"), col("device_id"))
  }

  private val crossEntitySql =
    """WITH pairs AS (
      |  SELECT user_id,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS device_id,
      |    count(*) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |  FROM events GROUP BY user_id, device_id)
      |SELECT user_id, device_id, n_events, sum_value,
      |  count(*) OVER (PARTITION BY user_id) AS device_count,
      |  MAX(n_events) OVER (PARTITION BY user_id)
      |    / SUM(n_events) OVER (PARTITION BY user_id) AS primary_device_ratio
      |FROM pairs ORDER BY user_id, device_id""".stripMargin

  // --------------------------------------------------- §1.2 schema evolution
  /** Schema evolution: v1-shaped rows (no risk_score/payment_method) and
    * v2-shaped rows unioned under the superset schema; nulls filled with
    * the v2 declared defaults (risk_score 0.0 — transactions.v2.avsc),
    * then aggregated per version. */
  private def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val v1 = e.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"), col("value"),
        lit(null).cast("double").as("risk_score"),
        lit(null).cast("string").as("payment_method"),
        lit("v1").as("schema_version"))
    val v2 = e.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("user_id"), col("value"),
        (col("value") / 1000.0).as("risk_score"),
        when(col("event_id") % 3 === 0, "CONTACTLESS").otherwise("CARD_PRESENT")
          .as("payment_method"),
        lit("v2").as("schema_version"))
    v1.unionByName(v2)
      .withColumn("risk_score", coalesce(col("risk_score"), lit(0.0)))
      .withColumn("payment_method",
        coalesce(col("payment_method"), lit("CARD_PRESENT")))
      .groupBy(col("schema_version"), col("payment_method"))
      .agg(count(lit(1)).as("n"), dsum(col("risk_score")).as("sum_risk"))
      .orderBy(col("schema_version"), col("payment_method"))
  }

  private val schemaEvolutionSql =
    """WITH unioned AS (
      |  SELECT event_id, value, CAST(NULL AS DOUBLE) AS risk_score,
      |    CAST(NULL AS VARCHAR) AS payment_method, 'v1' AS schema_version
      |  FROM events WHERE event_id % 2 = 0
      |  UNION ALL
      |  SELECT event_id, value, value / 1000.0 AS risk_score,
      |    CASE WHEN event_id % 3 = 0 THEN 'CONTACTLESS'
      |         ELSE 'CARD_PRESENT' END AS payment_method,
      |    'v2' AS schema_version
      |  FROM events WHERE event_id % 2 = 1
      |), filled AS (
      |  SELECT schema_version,
      |    COALESCE(payment_method, 'CARD_PRESENT') AS payment_method,
      |    COALESCE(risk_score, 0.0) AS risk_score
      |  FROM unioned)
      |SELECT schema_version, payment_method, count(*) AS n,
      |  CAST(SUM(CAST(risk_score AS DECIMAL(25,6))) AS DOUBLE) AS sum_risk
      |FROM filled GROUP BY schema_version, payment_method
      |ORDER BY schema_version, payment_method""".stripMargin

  // -------------------------------------------------------------- S3 / S4
  /** Avro roundtrip under the gate: encode per partition (writer schema
    * v1), decode with the v2 reader schema (evolution defaults), aggregate
    * the surviving typed fields. Oracle = the same aggregation on the raw
    * rows (roundtrip is identity + defaulted v2 fields). */
  private def avroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = ev(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"), col("ems"))
      .as[(Long, Long, Double, Long)]
    val decoded = rows.mapPartitions { it =>
      // schemas parsed once per partition (Schema is not serializable-cheap)
      val v1 = AvroCodec.parse(AvroCodec.txnV1Json)
      val v2 = AvroCodec.parse(AvroCodec.txnV2Json)
      it.map { case (id, uid, v, ems) =>
        val bytes = AvroCodec.encode(v1, Map(
          "txn_id" -> s"txn_$id", "card_id" -> s"card_$uid", "amount" -> v,
          "currency" -> "USD", "mcc" -> "5411", "geo_country" -> null,
          "timestamp" -> ems, "is_fraud" -> false))
        val rec = AvroCodec.decode(v1, v2, bytes)
        (rec.get("card_id").toString, rec.get("amount").asInstanceOf[Double],
         rec.get("risk_score").asInstanceOf[Double],
         bytes.length.toLong)
      }
    }.toDF("card_id", "amount", "risk_score", "n_bytes")
    decoded.groupBy(col("card_id"))
      .agg(count(lit(1)).as("n"), dsum(col("amount")).as("sum_amount"),
        dsum(col("risk_score")).as("sum_risk_defaulted"),
        sum(col("n_bytes")).as("total_bytes"))
      .orderBy(col("card_id"))
  }

  /** Oracle reproduces the Avro binary size arithmetic: zigzag-varint
    * length prefixes for the two strings + enum 0 (1 byte) + mcc(5) +
    * null-union geo (1 byte) + double amount (8) + varint timestamp +
    * boolean (1). Timestamp varint length for the data's epoch-ms range
    * (2024, >= 2^40) is 6 bytes zigzagged -> computed from the value. */
  private val avroRoundtripSql =
    """WITH enc AS (
      |  SELECT 'card_' || user_id AS card_id, value AS amount,
      |    -- txn_id: len prefix(1) + 'txn_'+id; card_id: len prefix(1) + text
      |    1 + length('txn_' || event_id)
      |    + 1 + length('card_' || user_id)
      |    + 8  -- amount double
      |    + 1  -- currency enum index varint
      |    + 1 + 4  -- mcc len prefix + '5411'
      |    + 1  -- geo_country union null branch
      |    + CAST(CEIL((FLOOR(LOG2(epoch_ms(ts) * 2 + 1)) + 1) / 7.0) AS BIGINT)
      |    + 1  -- is_fraud
      |    AS n_bytes
      |  FROM events)
      |SELECT card_id, count(*) AS n,
      |  CAST(SUM(CAST(amount AS DECIMAL(25,6))) AS DOUBLE) AS sum_amount,
      |  CAST(SUM(CAST(0.0 AS DECIMAL(25,6))) AS DOUBLE) AS sum_risk_defaulted,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
      |FROM enc GROUP BY card_id ORDER BY card_id""".stripMargin

  // ------------------------------------------------- §2.7 validation funcs
  /** Validation / default handling (ref inference/features.py:423-460):
    * NaN/Inf -> default, null -> per-feature default, clamp to bounds. */
  private def validation(spark: SparkSession, dir: String): DataFrame = {
    val raw = ev(spark, dir).select(
      col("event_id"),
      // synthesize pathological values deterministically
      when(col("event_id") % 7 === 0, lit(Double.NaN))
        .when(col("event_id") % 11 === 0, lit(null).cast("double"))
        .otherwise(col("value")).as("raw_value"))
    raw.select(
      col("event_id"),
      coalesce(nanvl(col("raw_value"), lit(null).cast("double")), lit(25.0))
        .as("cleaned"),
      least(greatest(
        coalesce(nanvl(col("raw_value"), lit(null).cast("double")), lit(25.0)),
        lit(0.0)), lit(500.0)).as("clamped"),
      (isnan(col("raw_value")) || col("raw_value").isNull).as("was_invalid"))
      .orderBy(col("event_id"))
  }

  private val validationSql =
    """WITH raw AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 7 = 0 THEN CAST('nan' AS DOUBLE)
      |         WHEN event_id % 11 = 0 THEN CAST(NULL AS DOUBLE)
      |         ELSE value END AS raw_value
      |  FROM events)
      |SELECT event_id,
      |  COALESCE(CASE WHEN isnan(raw_value) THEN NULL ELSE raw_value END, 25.0)
      |    AS cleaned,
      |  LEAST(GREATEST(
      |    COALESCE(CASE WHEN isnan(raw_value) THEN NULL ELSE raw_value END, 25.0),
      |    0.0), 500.0) AS clamped,
      |  (isnan(raw_value) OR raw_value IS NULL) AS was_invalid
      |FROM raw ORDER BY event_id""".stripMargin

  // ------------------------------------------------------ relational extras
  /** HAVING-style post-aggregation filter: suppliers shipping more than
    * 400 items (group filter after agg). */
  private def having(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("n_items") > 400)
      .orderBy(col("l_suppkey"))

  private val havingSql =
    """SELECT l_suppkey, count(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_suppkey
      |HAVING count(*) > 400
      |ORDER BY l_suppkey""".stripMargin

  /** TPC-H Q10 shape: top-20 customers by returned-item revenue. */
  private def returned(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    li.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val returnedSql =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Entity resolution / fuzzy record linkage over part names: distinct
    * names are paired within a blocking key (the noun token) and matched
    * by edit distance <= 3 via Spark's THRESHOLDED levenshtein — the
    * banded early-exit form (O(k*n) per pair, returns -1 past the bound)
    * that a 100 TB similarity join needs, vs the full O(n^2) DP the
    * 2-arg builtin runs. Scale design: dedupe-before-pair (64 distinct
    * names stand for 2000 parts — pair weight = multiplicity product),
    * block-bounded candidates, never corpus x corpus. */
  private def fuzzyParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val names = Tables.part(spark, dir)
      .groupBy($"p_name").agg(count(lit(1)).as("n_parts"))
      .withColumn("noun", split($"p_name", " ").getItem(1))
    val a = names.select($"p_name".as("name_a"), $"noun", $"n_parts".as("na"))
    val b = names.select($"p_name".as("name_b"), $"noun".as("noun_b"),
      $"n_parts".as("nb"))
    a.join(b, $"noun" === $"noun_b" && $"name_a" < $"name_b")
      .withColumn("dist", levenshtein($"name_a", $"name_b", 3))
      .filter($"dist" >= 0)
      .select($"name_a", $"name_b", $"dist".cast("long").as("dist"),
        ($"na" * $"nb").as("n_pairs"))
      .orderBy($"name_a", $"name_b")
  }

  private val fuzzyPartsSql =
    """WITH names AS (
      |  SELECT p_name, split_part(p_name, ' ', 2) AS noun,
      |    CAST(COUNT(*) AS BIGINT) AS n_parts
      |  FROM part GROUP BY 1, 2)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
      |  a.n_parts * b.n_parts AS n_pairs
      |FROM names a JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 3
      |ORDER BY name_a, name_b""".stripMargin

  /** Top-N per group (the "group-limit" shape): top-3 parts by revenue
    * within each supplier nation — row_number over a per-group window on
    * the PRE-AGGREGATED (nation, part) rollup, so the window input is
    * dimension-bounded (nations x parts), never the fact table; ties
    * break on partkey. At 100 TB the rollup shuffles once on its own
    * group key and the window adds no extra exchange (same partitioning). */
  private def topnPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val snation = Tables.nation(spark, dir)
      .select($"n_nationkey".as("sk"), $"n_name".as("nation"))
    val rev = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(snation), $"s_nationkey" === $"sk")
      .groupBy($"nation", $"l_partkey")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
    val w = Window.partitionBy($"nation")
      .orderBy($"revenue".desc, $"l_partkey")
    rev.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3)
      .select($"nation", $"rnk", $"l_partkey", $"revenue")
      .orderBy($"nation", $"rnk")
  }

  private val topnPerGroupSql =
    """WITH rev AS (
      |  SELECT n_name AS nation, l_partkey,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |rk AS (
      |  SELECT nation, l_partkey, revenue,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY nation
      |      ORDER BY revenue DESC, l_partkey) AS BIGINT) AS rnk
      |  FROM rev)
      |SELECT nation, rnk, l_partkey, revenue FROM rk WHERE rnk <= 3
      |ORDER BY nation, rnk""".stripMargin

  /** PageRank on the bidirectional supplier<->customer trade graph
    * (Brin/Page with the 1/N-normalized teleport, 5 synchronous rounds):
    * FIXED-POINT trillionths arithmetic with integer `div` at every
    * division so both engines walk the identical trajectory (float
    * PageRank would drift in the last ulps; same discipline as the
    * TextRank word graph). Per round: one shuffle on dst for the inflow
    * sum; ranks localCheckpoint'd so the plan doesn't nest; dangling
    * mass is dropped (documented standard simplification — here the
    * symmetrized graph has none). The node/edge tables are bounded by
    * the dimension sizes (suppliers x customers), so the driver-side
    * count(N) is bounded too. */
  private def pagerankTrade(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Scale = 1000000000000L
    // shared session-cached edge base (round 14, TradeGraph); the
    // derived node and out-degree frames are localCheckpoint'd — NOT
    // persist()'d — so the 5 iteration rounds replan against a leaf,
    // not the nested build tree (the round-10 pinned-matrix rule)
    val ed = TradeGraph.symEdges(spark, dir)
    val nodes = ed.select($"src".as("id")).distinct().localCheckpoint(true)
    val e = ed.join(
        ed.groupBy($"src".as("osrc")).agg(count(lit(1)).as("odeg")),
        $"src" === $"osrc")
      .select($"src", $"dst", $"odeg").localCheckpoint(true)
    val n = nodes.count()
    val r0 = Scale / n
    val base = (15L * r0) / 100L
    var s = nodes.select($"id", lit(r0).as("sc")).localCheckpoint(true)
    for (_ <- 1 to 5) {
      val inflow = e.join(s, e("src") === s("id"))
        .select($"dst", expr("sc div odeg").as("ct"))
        .groupBy($"dst").agg(sum($"ct").as("isum"))
      s = nodes.join(inflow, nodes("id") === inflow("dst"), "left")
        .select($"id",
          expr(s"$base + (85 * coalesce(isum, 0L)) div 100").as("sc"))
        .localCheckpoint(true)
    }
    s.select(
        row_number().over(Window.orderBy($"sc".desc, $"id"))
          .cast("long").as("rank"),
        $"id", $"sc".as("score"))
      .orderBy($"rank").limit(20)
  }

  private val pagerankTradeSql = {
    val rounds = (1 to 5).map { r =>
      s"""s$r AS MATERIALIZED (
         |  SELECT n.id AS id,
         |    base + (85 * COALESCE(CAST(SUM(s.sc // e.odeg) AS BIGINT), 0)) // 100 AS sc
         |  FROM nodes n
         |  CROSS JOIN params
         |  LEFT JOIN e ON e.dst = n.id
         |  LEFT JOIN s${r - 1} s ON s.id = e.src
         |  GROUP BY n.id, base
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH rel AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey * 2 AS sid, o_custkey * 2 + 1 AS cid
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |ed AS MATERIALIZED (
       |  SELECT sid AS src, cid AS dst FROM rel
       |  UNION ALL SELECT cid AS src, sid AS dst FROM rel),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM ed),
       |od AS MATERIALIZED (
       |  SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg FROM ed GROUP BY src),
       |e AS MATERIALIZED (
       |  SELECT ed.src, ed.dst, od.odeg FROM ed JOIN od USING (src)),
       |params AS MATERIALIZED (
       |  SELECT CAST(1000000000000 // COUNT(*) AS BIGINT) AS r0,
       |    CAST((15 * (1000000000000 // COUNT(*))) // 100 AS BIGINT) AS base
       |  FROM nodes),
       |s0 AS MATERIALIZED (
       |  SELECT id, r0 AS sc FROM nodes CROSS JOIN params),
       |$rounds
       |SELECT CAST(row_number() OVER (ORDER BY sc DESC, id) AS BIGINT) AS rank,
       |  id, sc AS score
       |FROM s5 ORDER BY rank LIMIT 20""".stripMargin
  }

  /** BFS hop profile from a seed supplier over the symmetrized trade
    * graph (the recursive-CTE / shortest-unweighted-path shape done as
    * synchronous frontier expansion): 4 rounds of frontier-join +
    * visited anti-join, per-round localCheckpoint. All-integer, so the
    * hop assignment is exact; the output is the per-hop reachability
    * profile. Frontiers and the visited set are node-table-bounded. */
  private def bfsHops(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seedId = 2L // supplier s_suppkey = 1
    // shared session-cached symmetric edges (round 14, TradeGraph)
    val e = TradeGraph.symEdges(spark, dir)
    var visited = Seq((seedId, 0L)).toDF("id", "hop").localCheckpoint(true)
    var frontier = visited.select($"id")
    for (h <- 1 to 4) {
      val next = e.join(frontier.withColumnRenamed("id", "fid"),
          $"src" === $"fid")
        .select($"dst".as("id")).distinct()
        .join(visited.select($"id".as("vid")), $"id" === $"vid", "left_anti")
        .localCheckpoint(true)
      visited = visited.union(next.withColumn("hop", lit(h.toLong)))
        .localCheckpoint(true)
      frontier = next
    }
    visited.groupBy($"hop")
      .agg(count(lit(1)).as("n_nodes"), min($"id").as("min_id"),
        max($"id").as("max_id"))
      .orderBy($"hop")
  }

  private val bfsHopsSql = {
    val rounds = (1 to 4).map { h =>
      s"""f$h AS MATERIALIZED (
         |  SELECT DISTINCT e.dst AS id FROM e JOIN f${h - 1} f ON e.src = f.id
         |  WHERE e.dst NOT IN (SELECT id FROM v${h - 1})
         |), v$h AS MATERIALIZED (
         |  SELECT id, hop FROM v${h - 1}
         |  UNION ALL SELECT id, CAST($h AS BIGINT) AS hop FROM f$h
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH rel AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey * 2 AS sid, o_custkey * 2 + 1 AS cid
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS MATERIALIZED (
       |  SELECT sid AS src, cid AS dst FROM rel
       |  UNION ALL SELECT cid AS src, sid AS dst FROM rel),
       |f0 AS MATERIALIZED (SELECT CAST(2 AS BIGINT) AS id),
       |v0 AS MATERIALIZED (
       |  SELECT CAST(2 AS BIGINT) AS id, CAST(0 AS BIGINT) AS hop),
       |$rounds
       |SELECT hop, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  MIN(id) AS min_id, MAX(id) AS max_id
       |FROM v4 GROUP BY hop ORDER BY hop""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_fuzzy_parts" -> (fuzzyParts _),
    "rel_topn_per_group" -> (topnPerGroup _),
    "graph_pagerank_trade" -> (pagerankTrade _),
    "graph_bfs_hops" -> (bfsHops _),
    "evt_rolling_gauges" -> (rollingGauges _),
    "evt_cross_entity" -> (crossEntity _),
    "evt_schema_evolution" -> (schemaEvolution _),
    "avro_roundtrip" -> (avroRoundtrip _),
    "evt_validation_defaults" -> (validation _),
    "rel_having" -> (having _),
    "rel_q10_returned_topk" -> (returned _))

  override def oracles: Map[String, String] = Map(
    "er_fuzzy_parts" -> fuzzyPartsSql,
    "rel_topn_per_group" -> topnPerGroupSql,
    "graph_pagerank_trade" -> pagerankTradeSql,
    "graph_bfs_hops" -> bfsHopsSql,
    "evt_rolling_gauges" -> rollingGaugesSql,
    "evt_cross_entity" -> crossEntitySql,
    "evt_schema_evolution" -> schemaEvolutionSql,
    "avro_roundtrip" -> avroRoundtripSql,
    "evt_validation_defaults" -> validationSql,
    "rel_having" -> havingSql,
    "rel_q10_returned_topk" -> returnedSql)
}
