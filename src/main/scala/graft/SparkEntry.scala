package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by domain modules (each a [[QueryModule]]); this
  * object just concatenates them. Every query name present in [[queries]]
  * with a matching entry in [[oracleSql]] is hash-checked against DuckDB by
  * the driver at sf0.01; names without an oracle get a rows-only check.
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    Relational, RelationalPlus, EventFeatures, EventAnalytics, DriftQuality, TextAnalysis,
    Embeddings, StreamingQueries, FeatureStoreQueries, ServingQueries,
    MultimodalQueries, ExtendedQueries, SourceFormats, CorpusPipeline,
    Sketches, SkewQueries, AnalyticsOps, FeatureOps, AdvancedOps, MetricOps,
    LayoutOps, SignalOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the end-to-end fraud pipeline (anchored features -> score -> risk
    * bands/action). */
  def entry(spark: SparkSession): DataFrame =
    queries("evt_fraud_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries)
    val dups = all.groupBy(_._1).filter(_._2.size > 1).keys
    // toMap would silently last-win, potentially pairing one module's
    // query with another module's oracle
    require(dups.isEmpty, s"duplicate query names across modules: $dups")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
