package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns. Every per-row
  * kernel is a native codegen'd Catalyst expression ([[QuantizeVec]],
  * [[LongArrayDot]]) — not an interpreted higher-order lambda — so the
  * hot path stays inside WholeStageCodegen.
  *
  * Cross-engine determinism: similarity that must hash-match a DuckDB
  * oracle goes through integer quantization (floor(x·1000)) so dot
  * products and norms are exact integer arithmetic — float-sum
  * association order can never flap a result hash.
  */
object VectorFunctions {

  /** floor(x·1000) integer quantization of a float-array column. */
  def quantize(vec: Column): Column =
    Native.call("graft_quantize",
      exprs => QuantizeVec(exprs.head, unit = false), vec)

  /** Quantization of the L2-NORMALIZED vector (milli-units of the unit
    * vector): makes integer L2 distance a monotone proxy for cosine,
    * which is what a distance-table scan (PQ/IVF) needs when the final
    * metric is cosine. */
  def quantizeUnit(vec: Column): Column =
    Native.call("graft_quantize_unit",
      exprs => QuantizeVec(exprs.head, unit = true), vec)

  /** Exact integer dot product of two quantized vectors — the native
    * codegen'd [[LongArrayDot]]. */
  def dotQ(a: Column, b: Column): Column =
    Native.call("graft_long_array_dot",
      exprs => LongArrayDot(exprs(0), exprs(1)), a, b)

  /** Exact integer element sum of a quantized vector — the native
    * codegen'd [[LongArraySum]]. */
  def sumQ(a: Column): Column =
    Native.call("graft_long_array_sum",
      exprs => LongArraySum(exprs.head), a)

  /** Cosine similarity from quantized vectors (deterministic doubles). */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

}
