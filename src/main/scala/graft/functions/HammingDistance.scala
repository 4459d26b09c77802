package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: Hamming distance between two 64-bit hash
  * signatures — popcount of the XOR. The SimHash near-dup test
  * ("signatures within k bits") runs this over every candidate pair, so
  * it sits squarely in the hot loop: a codegen'd expression keeps the
  * comparison inside whole-stage codegen as a single
  * `java.lang.Long.bitCount(a ^ b)`, where a Scala UDF would break the
  * codegen span and box both operands per row.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hamming_distance expects (BIGINT, BIGINT), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {

  /** Single builder shared by the temp-function registration and
    * GraftExtensions — arity errors surface as analysis errors. */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, s"hamming_distance expects 2 args, got ${exprs.size}")
    HammingDistance(exprs(0), exprs(1))
  }

  /** SQL registration: `SELECT hamming_distance(a, b)`. (Spark 4 keeps
    * Column<->Expression conversion internal, so the function is exposed
    * through the registry and used via expr()/SQL — still fully
    * codegen'd.) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming_distance", builder, "built-in")

  /** Column form (requires register() on the session first). */
  def hammingDistance(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("hamming_distance", a, b)
  }
}
