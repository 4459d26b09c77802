package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Salted two-phase aggregation for skewed keys (SURVEY.md §4 / Phase 5:
  * the reference's generator deliberately concentrates 40% of fraud on the
  * top-200 cards, txgen.py:117-123 — a hot-key pattern that dies on a
  * plain groupBy at scale because one reducer owns the hot key).
  *
  * Phase 1 shuffles on (key, salt) — the hot key spreads over `salts`
  * reducers computing partial aggregates; phase 2 shuffles the tiny
  * partial-row set on the key alone. Works for any decomposable aggregate
  * (here: count/sum/min/max; avg = sum/count at the end).
  *
  * AQE's skew-join handling covers JOIN skew automatically; aggregation
  * skew still wants the explicit salt when a single group's input is too
  * big for one task. The salt is derived from a row hash, so replays are
  * deterministic.
  */
object SkewedAggregate {

  case class Agg(name: String, of: String)

  /** Supported: count, sum, min, max (+ derived avg via sum/count). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                aggs: Seq[Agg]): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col): _*), lit(salts)))
    val partialExprs = aggs.zipWithIndex.map { case (a, i) =>
      val c = s"_p$i"
      a.name match {
        case "count" => count(lit(1)).as(c)
        case "sum" if df.schema(a.of).dataType == DoubleType =>
          // decimal accumulation: a two-phase double sum would depend on
          // the salt-induced addition order (CLAUDE.md numeric discipline)
          sum(col(a.of).cast(DecimalType(25, 6))).as(c)
        case "sum" => sum(col(a.of)).as(c)
        case "min" => min(col(a.of)).as(c)
        case "max" => max(col(a.of)).as(c)
        case other => throw new IllegalArgumentException(
          s"non-decomposable aggregate $other")
      }
    }
    val partial = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
    val finalExprs = aggs.zipWithIndex.map { case (a, i) =>
      val c = col(s"_p$i")
      val out = s"${a.name}${if (a.of.nonEmpty) "_" + a.of else ""}"
      a.name match {
        case "count" => sum(c).as(out)
        case "sum" if df.schema(a.of).dataType == DoubleType =>
          sum(c).cast("double").as(out)
        case "sum" => sum(c).as(out)
        case "min" => min(c).as(out)
        case "max" => max(c).as(out)
      }
    }
    partial.groupBy(keys.map(col): _*)
      .agg(finalExprs.head, finalExprs.tail: _*)
  }

  /** Plain one-phase groupBy with the same output names/types as
    * saltedAgg (the two are interchangeable execution strategies). */
  def plainAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Agg]): DataFrame = {
    val exprs = aggs.map { a =>
      val out = s"${a.name}${if (a.of.nonEmpty) "_" + a.of else ""}"
      a.name match {
        case "count" => count(lit(1)).as(out)
        case "sum" if df.schema(a.of).dataType == DoubleType =>
          sum(col(a.of).cast(DecimalType(25, 6))).cast("double").as(out)
        case "sum" => sum(col(a.of)).as(out)
        case "min" => min(col(a.of)).as(out)
        case "max" => max(col(a.of)).as(out)
        case other => throw new IllegalArgumentException(
          s"non-decomposable aggregate $other")
      }
    }
    df.groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Salts only when a cheap sampled probe sees a hot key above
    * `threshold` fraction of rows — the automatic wiring for hot-key
    * query paths (the generator's top-card concentration, txgen.py:
    * 117-123, is the motivating shape). The output is IDENTICAL either
    * way; salting is an execution strategy, so the probe's sampling only
    * decides plan shape, never results. */
  def aggWithSkewGuard(df: DataFrame, keys: Seq[String], aggs: Seq[Agg],
      salts: Int = 8, threshold: Double = 0.05,
      sampleFraction: Double = 0.01): DataFrame = {
    val probe = df.sample(withReplacement = false, sampleFraction, seed = 7)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("hot"), sum(col("n")).as("tot"))
      .head()
    val skewed = !probe.isNullAt(1) && probe.getAs[Long]("tot") > 0 &&
      probe.getAs[Long]("hot").toDouble / probe.getAs[Long]("tot") >= threshold
    if (skewed) saltedAgg(df, keys, salts, aggs)
    else plainAgg(df, keys, aggs)
  }
}
