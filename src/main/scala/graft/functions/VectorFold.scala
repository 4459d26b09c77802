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

object VectorFold {

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, s"fdot expects 2 args, got ${exprs.size}")
    FloatDot(exprs(0), exprs(1))
  }

  /** SQL registration: `SELECT fdot(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fdot", builder, "built-in")

  /** Column form (requires register() on the session first). */
  def fdot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("fdot", a, b)
  }
}
