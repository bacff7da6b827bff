package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native two-round affine-mod-(2⁶¹−1) xorshift mixer — the codegen'd
  * form of the hash pipeline [[Hll]], [[graft.operators.Bootstrap]],
  * and [[graft.operators.DpRelease]] share with their DuckDB oracles.
  *
  * The column formulation (`pmod(decimal(38) × …)`) is exact but runs
  * the 122-bit products through Decimal allocation per row — on the
  * bootstrap's 32×-exploded stream that dominates the stage. This
  * expression does the same arithmetic in primitive longs:
  * `Math.multiplyHigh` gives the 128-bit product, and reduction mod
  * the MERSENNE prime needs no division at all — 2⁶⁴ ≡ 8 (mod 2⁶¹−1),
  * so the product folds as (hi·8 + top bits) + low 61 bits, twice,
  * then one conditional subtract. Bit-identical to the decimal chain
  * for the non-negative keys every caller feeds (pmod ≡ mod there);
  * the swap is verified by the unchanged DuckDB hash gates.
  */
case class MixMod61(child: Expression) extends UnaryExpression {
  import MixMod61._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "mix_mod61"

  override protected def nullSafeEval(input: Any): Any =
    mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MixMod61.mix($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MixMod61 {
  val P = 2305843009213693951L // 2^61 − 1

  /** (a·x) mod P via 128-bit multiply + Mersenne folding; a, x ≥ 0. */
  @inline private def mulMod(a: Long, x: Long): Long = {
    val hi = Math.multiplyHigh(a, x)
    val lo = a * x
    // value = hi·2^64 + lo ≡ (value >> 61) + (value & P)  (2^61 ≡ 1)
    var r = ((hi << 3) | (lo >>> 61)) + (lo & P)
    r = (r >>> 61) + (r & P)
    if (r >= P) r - P else r
  }

  @inline private def addMod(a: Long, b: Long): Long = {
    val s = a + b // both < P < 2^61: no overflow
    if (s >= P) s - P else s
  }

  /** The full pipeline: h₁ = (A·x + B) mod P, xorshift 30, ·A2 mod P,
    * xorshift 27 — constants are [[Hll]]'s, the single source both
    * engines already share. */
  def mix(x: Long): Long = {
    val h1 = addMod(mulMod(Hll.A, x), Hll.B)
    val m1 = h1 ^ (h1 >>> 30)
    val h2 = mulMod(Hll.A2, m1)
    h2 ^ (h2 >>> 27)
  }
}
