package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row, attach the latest right
  * row with `rightTs <= leftTs` for the same key — the Feast
  * `get_historical_features` semantics (ref: /root/reference/feast/
  * feature_utils.py:151-232, test_feast_integration.py:259-320).
  *
  * Implementation is the scalable union-sort form, NOT the naive
  * join-then-rank: tag both sides, hash-partition by key, sort by
  * (ts, side, tieBreak) within the key, and carry the latest right row
  * forward with last(_, ignoreNulls). One shuffle on the key, no
  * intermediate row explosion (the naive left-join emits |matches| rows
  * per left row before ranking — quadratic on hot keys; this emits
  * |left| + |right| rows total, which is what survives a 100 TB join of a
  * large entity table against a large feature history).
  *
  * Right rows sort before left rows at equal ts, so a feature row stamped
  * exactly at the query timestamp is visible (<=, matching the reference's
  * PIT tolerance check). Ties among right rows at the same ts resolve to
  * the greatest `tieBreak` value.
  */
object AsOfJoin {

  /** @param left      query side (entity_df)
    * @param right     feature-history side
    * @param keys      equi-join key column names (present on both sides)
    * @param leftTs    event-time column on `left` (numeric or timestamp)
    * @param rightTs   event-time column on `right`
    * @param rightCols right columns to attach (null when no row qualifies)
    * @param tieBreak  right column resolving equal-ts ties (greatest wins)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftOut = left.columns.toSeq
    val payloadCols = (rightCols :+ tieBreak).distinct
    val payloadType = StructType(
      payloadCols.map(c => StructField(c, right.schema(c).dataType, nullable = true)))
    val payload = struct(payloadCols.map(col): _*)

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(tieBreak).dataType))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")
        :+ col(tieBreak).as("__tie") :+ payload.as("__payload")): _*)

    val unioned = l.select(
      (keys.map(col) ++ Seq(col("__ts"), col("__side"), col("__tie"), col("__payload"))
        ++ leftOut.filterNot(keys.contains).map(col)): _*)
      .unionByName(r.withColumns(
        leftOut.filterNot(keys.contains).map(c =>
          c -> lit(null).cast(left.schema(c).dataType)).toMap))

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftOut.map(col) ++
        rightCols.map(c => col(s"__matched.$c").as(c)): _*)
  }

  /** FORWARD as-of join (round 9): for each left row, attach the EARLIEST
    * right row with `rightTs >= leftTs` for the same key — the
    * pandas-merge_asof(direction='forward') semantics (exact-timestamp
    * matches allowed), the time-mirror of [[asOf]]. Same union-sort shape
    * — one shuffle on the key, |left| + |right| rows total, no per-left
    * match explosion — with the window flipped to
    * (currentRow, unboundedFollowing) and `first(_, ignoreNulls)`.
    *
    * Evaluated as the DESC mirror of [[asOf]]'s running frame: sort by
    * (ts DESC, side DESC, tie DESC) and take `last(_, ignoreNulls)` over
    * (unboundedPreceding, currentRow). Spark computes a running frame in
    * O(k) per key, while a (currentRow, unboundedFollowing) frame
    * re-accumulates from each row to the partition end — O(k²) on a hot
    * key (round-9 advice). In DESC order an equal-ts right row (side 1)
    * sorts BEFORE the left row (side 0), so `>=` holds; among equal-ts
    * right rows, tie DESC puts the SMALLEST `tieBreak` nearest the
    * current row, and the running `last` picks it. Tolerance windows
    * (match only within Δt) apply downstream: the payload carries
    * `rightTs`, so the caller null-gates on `matchedTs - leftTs <= Δt` —
    * a projection, not a second join. */
  def forwardAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftOut = left.columns.toSeq
    val payloadCols = (rightCols :+ tieBreak).distinct
    val payloadType = StructType(
      payloadCols.map(c => StructField(c, right.schema(c).dataType, nullable = true)))
    val payload = struct(payloadCols.map(col): _*)

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0))
      .withColumn("__tie", lit(null).cast(right.schema(tieBreak).dataType))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("__ts") :+ lit(1).as("__side")
        :+ col(tieBreak).as("__tie") :+ payload.as("__payload")): _*)

    val unioned = l.select(
      (keys.map(col) ++ Seq(col("__ts"), col("__side"), col("__tie"), col("__payload"))
        ++ leftOut.filterNot(keys.contains).map(col)): _*)
      .unionByName(r.withColumns(
        leftOut.filterNot(keys.contains).map(c =>
          c -> lit(null).cast(left.schema(c).dataType)).toMap))

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side").desc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftOut.map(col) ++
        rightCols.map(c => col(s"__matched.$c").as(c)): _*)
  }

  /** NEAREST as-of join (round 11) — completes the pandas merge_asof
    * direction trio (backward [[asOf]], forward [[forwardAsOf]],
    * nearest): for each left row, attach the right row whose `rightTs`
    * is CLOSEST to `leftTs` in either direction; ties between an equal
    * backward and forward gap resolve BACKWARD (pandas' documented
    * behavior). Both directional candidates come from ONE union-sort
    * pass: the tagged union is hash-partitioned by key once, and the two
    * running ignoreNulls windows (ascending = backward carry, descending
    * = forward carry) are consecutive Sorts over the SAME Exchange — one
    * shuffle, |left| + |right| rows total, no per-left match explosion.
    * The payload carries `rightTs`, so tolerance windows apply downstream
    * as a projection (|matchedTs − leftTs| ≤ Δt), like [[forwardAsOf]].
    *
    * Backward side-tag convention matches [[asOf]] (right sorts before
    * left at equal ts ⇒ `<=` holds ascending); in the descending window
    * the side stays ASC so an equal-ts right row still precedes the left
    * row ⇒ `>=` holds, with tie DESC picking the smallest tieBreak among
    * equal-ts right rows — forwardAsOf's discipline. */
  def nearestAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftOut = left.columns.toSeq
    val payloadCols = (rightCols :+ tieBreak :+ rightTs).distinct
    val payloadType = StructType(
      payloadCols.map(c => StructField(c, right.schema(c).dataType, nullable = true)))
    val payload = struct(payloadCols.map(col): _*)

    // side tags as in asOf: right = 0, left = 1 ascending (right first at
    // equal ts); the descending mirror flips them implicitly via .desc
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(tieBreak).dataType))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")
        :+ col(tieBreak).as("__tie") :+ payload.as("__payload")): _*)

    val unioned = l.select(
      (keys.map(col) ++ Seq(col("__ts"), col("__side"), col("__tie"), col("__payload"))
        ++ leftOut.filterNot(keys.contains).map(col)): _*)
      .unionByName(r.withColumns(
        leftOut.filterNot(keys.contains).map(c =>
          c -> lit(null).cast(left.schema(c).dataType)).toMap))

    val wB = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ts DESC but side ASC: at equal ts the right row (side 0) must still
    // sort BEFORE the left row (side 1) so `>=` holds in the forward carry
    val wF = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side").asc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val both = unioned
      .withColumn("__mb", last(col("__payload"), ignoreNulls = true).over(wB))
      .withColumn("__mf", last(col("__payload"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
    val bTs = col(s"__mb.$rightTs")
    val fTs = col(s"__mf.$rightTs")
    val nearest = when(col("__mb").isNull, col("__mf"))
      .when(col("__mf").isNull, col("__mb"))
      .when(col("__ts") - bTs <= fTs - col("__ts"), col("__mb"))
      .otherwise(col("__mf"))
    both
      .withColumn("__mn", nearest)
      .select(leftOut.map(col) ++
        rightCols.map(c => col(s"__mn.$c").as(c)): _*)
  }
}
