package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native dot product of two `array<bigint>` columns.
  *
  * The `aggregate(zip_with(...))` formulation is semantically identical
  * but runs interpreted (Catalyst higher-order functions are
  * CodegenFallback) and allocates a zipped array per row — in the
  * all-pairs similarity join that lambda eval dominates the stage. This
  * expression generates a tight primitive loop inside WholeStageCodegen:
  * no allocation, no virtual calls, vectorizable by the JIT.
  *
  * Sum is over min(len(a), len(b)) elements, matching `zip_with`'s
  * null-padding-then-drop semantics for equal-length vectors (the only
  * shape the callers produce).
  */
case class LongArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  // ExpectsInputTypes' members are private[sql]; validate directly so a
  // wrong-typed SQL call (the expression is registry-exposed) fails
  // analysis instead of reading garbage through getLong
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = ExprChecks.requireLongArray(left.dataType, prettyName)
    if (l.isFailure) l else ExprChecks.requireLongArray(right.dataType, prettyName)
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
