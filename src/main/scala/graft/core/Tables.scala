package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries take a `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * TPC-H-ish star schema plus the `events` stream stand-in and the
  * `documents`/`embeddings` tables used by the LLM-pipeline operators.
  *
  * Scale note: at 100 TB these reads become partitioned-parquet/Delta scans;
  * everything downstream only assumes a DataFrame with this schema, so the
  * swap is a one-line change per source. Filters/projections applied by
  * callers push down to the parquet scan (verify via .explain: PushedFilters).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark rejects
    * by default; read nanos as long and truncate to a microsecond
    * TimestampType (NTZ-free), the same instant DuckDB's epoch_ms sees.
    * Shared by the batch and streaming read paths so the normalization can
    * never diverge between twins that share an oracle. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df

  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, sfDir, "events"))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
