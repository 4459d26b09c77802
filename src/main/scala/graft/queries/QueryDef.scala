package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named query over the driver testdata plus (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Cross-engine exactness discipline (so the driver's hash compare is
  * deterministic, independent of float-summation order):
  *   - sums/avgs of doubles go through exact DECIMAL accumulation
  *     ([[Exact.dsum]]) and are cast back to DOUBLE at the end — both engines
  *     produce the bit-identical double;
  *   - counts are BIGINT in both engines;
  *   - timestamps are returned as epoch milliseconds (BIGINT);
  *   - any residual double arithmetic is written with the same operation
  *     order in the Spark plan and the oracle SQL.
  */
trait QueryModule {
  /** name -> (spark, sfDir) => result */
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** name -> DuckDB oracle SQL over tables named region/nation/.../events. */
  def oracles: Map[String, String]
}

/** Exact cross-engine numeric helpers. */
object Exact {
  /** Exact sum of a double column: accumulate as DECIMAL(25,6), emit DOUBLE.
    * Scale 6 matters: source values carry at most 6 true decimal digits
    * (2-decimal money × 2-decimal rate × 2-decimal rate), so the cast never
    * rounds — Spark (shortest-string HALF_UP) and DuckDB (binary-value
    * nearest) would tie-break differently on exact half values at a coarser
    * scale. Oracle SQL twin: CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(25, 6))).cast("double")

  /** Exact mean: decimal sum divided by count, both engines do the same
    * double division. Oracle twin: dsum / COUNT(x). */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(25, 6))).cast("double") / count(c)).cast("double")

  /** Epoch milliseconds of a timestamp column (BIGINT both engines).
    * Driver parquet timestamps surface as TIMESTAMP_NTZ in Spark 4; with a
    * UTC session the cast to TIMESTAMP reads the same instant DuckDB's
    * epoch_ms sees on the naive value. Oracle twin: epoch_ms(ts). */
  def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))
}
