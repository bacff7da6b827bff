package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence LENGTH of two `array<string>` columns —
  * the kernel of ROUGE-L (Lin 2004: LCS-based recall/precision; the
  * reference's rouge_scorer exposes rougeL through the same interface
  * its rouge1/2 gates already re-express).
  *
  * A higher-order-function formulation would run the O(|a|·|b|) DP
  * interpreted with an array allocation per fold step; this expression
  * compiles the classic two-row DP into one primitive loop inside
  * WholeStageCodegen (the [[LongArrayDot]] discipline). O(min) extra
  * space; inputs are expected token-capped by the caller (ROUGE-L is
  * an eval metric over bounded summaries, and the gated instance caps
  * both sides — an unbounded corpus-side LCS would be a quadratic
  * operator by nature, declared on the query).
  */
case class LcsLength(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string>, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "lcs_length"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LcsLength.lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.LcsLength.lcs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsLength {
  /** Two-row DP; null elements never match anything (SQL semantics:
    * NULL = NULL is unknown, so a null token cannot extend a
    * subsequence). */
  def lcs(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    // materialize b once; a streams
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j)
      j += 1
    }
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    var i = 0
    while (i < n) {
      val ai = if (a.isNullAt(i)) null else a.getUTF8String(i)
      j = 0
      while (j < m) {
        val matches = ai != null && bs(j) != null && ai.equals(bs(j))
        cur(j + 1) =
          if (matches) prev(j) + 1L
          else math.max(cur(j), prev(j + 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}
