package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: |A ∩ B| for two ASCENDING-SORTED arrays
  * (string or bigint elements) via a two-pointer merge — no per-row
  * hash-set allocation.
  *
  * The n-gram Jaccard candidate scorer (TextAnalysis.ngramJaccard) runs an
  * intersection per candidate PAIR, the hot loop of the near-dup pass:
  * `array_intersect` builds a hash set for every invocation, while this
  * merge walks both arrays once. Sorting happens once per DOCUMENT
  * (array_sort at shingle build), then every pair comparison is
  * O(|A|+|B|) comparisons with zero allocation — 8-byte primitive
  * compares when the caller pre-hashes elements to bigints.
  *
  * Both inputs MUST be duplicate-free and ascending (binary UTF8 order
  * for strings); the caller owns that invariant
  * (array_sort(array_distinct(...))).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count expects two ARRAY<STRING> or two " +
            s"ARRAY<BIGINT>, got (${l.sql}, ${r.sql})")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val strings = elementType == StringType
    while (i < x.numElements() && j < y.numElements()) {
      val c =
        if (strings) x.getUTF8String(i).compareTo(y.getUTF8String(j))
        else java.lang.Long.compare(x.getLong(i), y.getLong(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val cmp =
        if (elementType == StringType)
          s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
        else
          s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $c = $cmp;
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Single builder shared by the temp-function registration and
    * GraftExtensions — arity errors surface as analysis errors. */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2,
      s"sorted_intersect_count expects 2 args, got ${exprs.size}")
    SortedIntersectCount(exprs(0), exprs(1))
  }

  /** SQL registration: `SELECT sorted_intersect_count(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", builder, "built-in")

  /** Column form (requires register() on the session first). */
  def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("sorted_intersect_count", a, b)
  }
}
