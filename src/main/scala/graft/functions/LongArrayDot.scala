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
  * Default mode sums over min(len(a), len(b)) elements, matching
  * `zip_with`'s null-padding-then-drop semantics for equal-length
  * vectors (the only shape the engine's callers produce). With
  * `nullAware = true` the loop ALSO reproduces the HOF form's edge
  * semantics bit-for-bit — NULL when the lengths differ (zip_with's
  * null padding poisons the sum) or when any element is null — still
  * one compiled primitive pass; [[graft.plans.RewriteDotProduct]] uses
  * this mode so the optimizer rewrite is safe on file-sourced arrays
  * whose schema cannot prove null-freedom.
  */
case class LongArrayDot(left: Expression, right: Expression,
                        nullAware: Boolean = false)
  extends BinaryExpression {

  // ExpectsInputTypes' members are private[sql]; validate directly so a
  // wrong-typed SQL call (the expression is registry-exposed) fails
  // analysis instead of reading garbage through getLong
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = ExprChecks.requireLongArray(left.dataType, prettyName)
    if (l.isFailure) l else ExprChecks.requireLongArray(right.dataType, prettyName)
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = nullAware || super.nullable
  override def prettyName: String = "long_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (nullAware) {
      if (x.numElements() != y.numElements()) return null
      var i = 0
      val n = x.numElements()
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        i += 1
      }
    }
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  /** `nullSafeCodeGen`'s non-nullable branch never DECLARES `ev.isNull`
    * (it swaps a `false` literal into the returned ExprCode), so a
    * result template may only reference `ev.isNull` when `nullable` is
    * true — otherwise janino sees an undeclared name and the whole
    * stage falls back to the interpreter (the exact regression
    * `CodegenOnlySpec` pins: `long_array_dot(v, v)` over a
    * non-nullable column). `nullAware` implies nullable by
    * construction, so the guard branch is always safe to emit. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val guard = if (nullAware)
        s"""
           |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
           |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
           |}
         """.stripMargin
      else ""
      val loopGuard = if (nullAware) s"!${ev.isNull}" else "true"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |$guard
         |long $s = 0L;
         |if ($loopGuard) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
