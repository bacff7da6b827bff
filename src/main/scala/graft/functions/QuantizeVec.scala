package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Integer quantization of a float/double embedding column:
  * `floor(x·1000)` per component, optionally of the L2-normalized vector
  * (`unit = true` — milli-units of the unit vector, the space where
  * integer L2 is a monotone proxy for cosine).
  *
  * Replaces the `transform`/`aggregate` higher-order-function
  * formulations in [[VectorFunctions]]: Catalyst HOFs evaluate
  * interpreted (CodegenFallback) and re-enter the lambda per element,
  * and these quantizations run once per corpus row in EVERY ann/dedup
  * path — at 100 TB that interpreted per-element overhead is a full
  * extra scan's worth of CPU. The arithmetic here is bit-identical to
  * the HOF version (left-to-right IEEE double sum, multiply before
  * divide, `math.floor`), so every hash-gated oracle result is
  * unchanged.
  */
case class QuantizeVec(child: Expression, unit: Boolean)
  extends UnaryExpression {

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = if (unit) "quantize_unit" else "quantize"

  /** Parquet-read arrays carry containsNull=true even when no element is
    * null, so element nullability can't be rejected at analysis time.
    * A vector that DOES hold a null component has no meaningful
    * quantization — the HOF form this replaces propagated the null
    * through the norm aggregate and nulled every component — so here the
    * whole result is null, which downstream joins/aggregates drop. */
  @transient private lazy val elementsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull
  override def nullable: Boolean = child.nullable || elementsNullable

  override protected def nullSafeEval(input: Any): Any =
    QuantizeVec.compute(input.asInstanceOf[ArrayData], isFloat, unit)

  /** When `nullable` is false, `nullSafeCodeGen` never declares
    * `ev.isNull`, so the template must not mention it (janino would
    * fail on the undeclared name and drop the stage to interpreted) —
    * and in that regime `compute` cannot return null anyway
    * (containsNull=false means no null elements to poison the norm). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("quantized")
      val assign =
        if (nullable)
          s"if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }"
        else s"${ev.value} = $r;"
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.QuantizeVec.compute($c, $isFloat, $unit);
         |$assign
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeVec {
  /** Returns null (row-level) when any element is null — see the
    * nullability note on the expression. */
  def compute(v: ArrayData, isFloat: Boolean, unit: Boolean): ArrayData = {
    val n = v.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      xs(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    var norm = 1.0
    if (unit) {
      var acc = 0.0
      i = 0
      while (i < n) { acc += xs(i) * xs(i); i += 1 }
      norm = math.sqrt(acc)
      if (norm < 1e-12) norm = 1e-12
    }
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(xs(i) * 1000 / norm).toLong
      i += 1
    }
    new GenericArrayData(out)
  }
}
