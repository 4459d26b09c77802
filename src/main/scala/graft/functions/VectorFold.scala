package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: the sequential-fold dot product
  * Σᵢ (double)a[i] · (double)b[i] over two equal-length FLOAT/DOUBLE
  * arrays — bit-identical to the interpreted
  * `aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as
  * double)), 0D, (acc, x) -> acc + x)` (same ascending-index order, same
  * multiply-then-add IEEE sequence, 0.0 seed, no FMA in either path) and
  * to the DuckDB `list_reduce(list_prepend(0.0, list_transform(...)))`
  * mirror, so swapping it under any cosine/norm expression cannot move a
  * single ulp.
  *
  * Why it exists (round 14): higher-order functions run INTERPRETED in
  * Spark — every brute-force eval pass in the embedding family (the
  * recall-gating ground truth, the kNN label-vote evals, the nprobe
  * sweep) burned its time in `aggregate`/`zip_with` interpretation, not
  * arithmetic. This is preference order (b) from the build rules: a
  * custom codegen Expression where the built-in form genuinely can't
  * perform — the generated code is a tight primitive loop inside
  * whole-stage codegen.
  *
  * Contract: both arrays non-null per row with EQUAL lengths (the fold
  * runs over the shorter length; `zip_with` would null-pad the longer —
  * callers in this repo only compare fixed-dimension vectors) and no
  * null elements.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fdot expects ARRAY<FLOAT|DOUBLE> on both sides, got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc = acc + xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getX =
        if (elemType(left) == FloatType) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getY =
        if (elemType(right) == FloatType) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = $acc + $getX * $getY;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: the sequential-fold squared-L2 distance
  * Σᵢ ((double)a[off+i] − (double)b[i])² between a window of `a` starting
  * at 0-based `off` and the whole of `b` — bit-identical to the
  * interpreted
  * `aggregate(zip_with(slice(a, off+1, len(b)), b, (x, y) ->
  * (cast(x as double) - cast(y as double)) * (...same...)), 0D,
  * (acc, x) -> acc + x)` (same ascending order, subtract-square-add IEEE
  * sequence, 0.0 seed, no FMA) and to the DuckDB `list_reduce` mirror,
  * so swapping it under any distance expression cannot move an ulp.
  *
  * Why it exists (round 14): [[FloatDot]] removed HOF interpretation
  * from the cosine paths, but every PQ/IVF coding and recall-truth pass
  * still folded squared distances interpreted — `assignCell` evaluates
  * k folds per vector, `pqCode` pqM×pqK sub-folds per vector, the recall
  * graders one 64-dim fold per (query, corpus) pair. The offset operand
  * additionally replaces the per-code `slice(...)` array copy in the PQ
  * sub-distance with an index shift inside the generated loop.
  *
  * Contract: arrays non-null per row, no null elements, `off` a
  * non-negative foldable INT with off + len(b) <= len(a) (callers pass
  * literal subspace offsets; the loop runs over
  * min(len(a) − off, len(b)) like the zip_with form over equal windows).
  */
case class FloatSqDist(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(first.dataType) && ok(second.dataType) &&
        third.dataType == org.apache.spark.sql.types.IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fsq expects (ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>, INT), got " +
          s"(${first.dataType.sql}, ${second.dataType.sql}, " +
          s"${third.dataType.sql})")
  }

  override protected def nullSafeEval(a: Any, b: Any, o: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val off = o.asInstanceOf[Int]
    val lf = elemType(first) == FloatType
    val rf = elemType(second) == FloatType
    val n = math.min(x.numElements() - off, y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(off + i).toDouble else x.getDouble(off + i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc = acc + d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, o) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val getX =
        if (elemType(first) == FloatType) s"(double) $a.getFloat($o + $i)"
        else s"$a.getDouble($o + $i)"
      val getY =
        if (elemType(second) == FloatType) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements() - $o, $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $getX - $getY;
         |  $acc = $acc + $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VectorFold {

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, s"fdot expects 2 args, got ${exprs.size}")
    FloatDot(exprs(0), exprs(1))
  }

  val sqBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 3, s"fsq expects 3 args, got ${exprs.size}")
    FloatSqDist(exprs(0), exprs(1), exprs(2))
  }

  /** SQL registration: `SELECT fdot(a, b)`, `SELECT fsq(a, b, off)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fdot", builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fsq", sqBuilder, "built-in")
  }

  /** Column form (requires register() on the session first). */
  def fdot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("fdot", a, b)
  }

  /** Column form of the windowed squared distance (register() first). */
  def fsq(a: Column, b: Column, off: Column): Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("fsq", a, b, off)
  }
}
