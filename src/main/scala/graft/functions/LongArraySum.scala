package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native element sum of an `array<bigint>` column — [[LongArrayDot]]'s
  * unary sibling (a dot with the ones vector, without materializing the
  * ones). The `aggregate(col, 0L, _ + _)` formulation is semantically
  * identical but runs interpreted (higher-order functions are
  * CodegenFallback) and re-enters the lambda per element; this
  * expression is one tight primitive loop inside WholeStageCodegen.
  * Used by the per-row coordinate sums of
  * [[graft.ann.PcaPowerStep]]'s O(n·d) covariance-times-ones pass.
  */
case class LongArraySum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    ExprChecks.requireLongArray(child.dataType, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_sum"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
