package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The supplier↔customer trade-graph BASE FRAMES, built once per
  * (session, dataset) and shared by every graph query that walks this
  * graph (`graph_kcore`, `graph_pagerank_trade`, `graph_bfs_hops`,
  * `graph_shortest_cost`, `graph_hits`, `graph_link_prediction`) — the
  * lshEdges / funnelFlags pattern (round 14). Before this, each of the
  * six rebuilt the identical lineitem⋈orders DISTINCT pair table per
  * invocation (one shuffle join + one distinct each) and pinned its
  * per-query edge table with `persist()` — which re-enters every
  * iteration round's logical plan UN-truncated, so Catalyst re-optimized
  * the whole nested tree once per round (the round-10 pinned-matrix
  * lesson, emb_pca edition). The frames here are `localCheckpoint`'d:
  * lineage-truncated, ContextCleaner-managed, plan-stable under
  * iteration.
  *
  * Derivations are pure projections of one another, so every query's
  * row set is bit-identical to its previous private build; the oracles
  * are untouched.
  */
object TradeGraph {

  private val cache =
    new scala.collection.concurrent.TrieMap[String, DataFrame]()

  private def cached(spark: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame =
    cache.getOrElseUpdate(
      s"$tag:${graft.core.SessionKeys.of(spark)}@$dir",
      build.localCheckpoint(true))

  /** DISTINCT (sid = s·2, cid = c·2+1, n_ord) — the pair table with the
    * per-pair distinct-order count (n_ord counts DISTINCT orders, the
    * `shortest_cost` weight base; projecting (sid, cid) alone gives the
    * plain distinct pair set the unweighted graphs use). */
  def pairCounts(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "paircnt") {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey".as("ok"), ($"l_suppkey" * 2).as("sid"),
          ($"o_custkey" * 2 + 1).as("cid"))
        .distinct()
        .groupBy($"sid", $"cid").agg(count(lit(1)).as("n_ord"))
    }

  /** The SYMMETRIZED unweighted edge table (src, dst) — union of the
    * distinct pairs and their swaps (kcore / pagerank / bfs shape). */
  def symEdges(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "sym") {
      val rel = pairCounts(spark, dir).select(col("sid"), col("cid"))
      rel.select(col("sid").as("src"), col("cid").as("dst"))
        .union(rel.select(col("cid").as("src"), col("sid").as("dst")))
    }

  /** Symmetrized weighted edges (src, dst, w = 1 + 100 div n_ord) — the
    * `graph_shortest_cost` edge table. */
  def symWeighted(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "symw") {
      val rel = pairCounts(spark, dir)
        .select(col("sid"), col("cid"),
          (lit(1L) + expr("100L div n_ord")).as("w"))
      rel.select(col("sid").as("src"), col("cid").as("dst"), col("w"))
        .union(rel.select(col("cid").as("src"), col("sid").as("dst"),
          col("w")))
    }

  /** The raw DIRECTED (s, c) pair set (`graph_hits`,
    * `graph_link_prediction`): inverse of the node-id disambiguation —
    * sid = s·2 and cid = c·2+1 exactly, so the division recovers the
    * original keys bit-for-bit. */
  def rawPairs(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "raw") {
      pairCounts(spark, dir)
        .select(expr("sid div 2").as("s"), expr("(cid - 1) div 2").as("c"))
    }
}
