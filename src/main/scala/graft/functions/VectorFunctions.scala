package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * codegen'd `functions._` expressions (`transform`/`zip_with`/`aggregate`)
  * — no UDFs, so the hot path stays inside WholeStageCodegen.
  *
  * Cross-engine determinism: similarity that must hash-match a DuckDB
  * oracle goes through integer quantization (floor(x·1000)) so dot
  * products and norms are exact integer arithmetic — float-sum
  * association order can never flap a result hash.
  */
object VectorFunctions {

  /** floor(x·1000) integer quantization of a float-array column. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000).cast("long"))

  /** Quantization of the L2-NORMALIZED vector (milli-units of the unit
    * vector): makes integer L2 distance a monotone proxy for cosine,
    * which is what a distance-table scan (PQ/IVF) needs when the final
    * metric is cosine. The norm is computed once per row via a
    * single-element `transform` binding (a bare reference inside the
    * per-element lambda would re-evaluate it per component). */
  def quantizeUnit(vec: Column): Column =
    element_at(
      transform(
        array(struct(vec.as("v"),
          greatest(sqrt(aggregate(vec, lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double"))), lit(1e-12)).as("n"))),
        s => transform(s.getField("v"),
          x => floor(x.cast("double") * 1000 / s.getField("n")).cast("long"))),
      1)

  /** Exact integer dot product of two quantized vectors — a native
    * codegen'd [[LongArrayDot]], not an interpreted higher-order lambda.
    * The expression is registered on the active session's function
    * registry (idempotent) and invoked through the public
    * `call_function` surface. */
  def dotQ(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_long_array_dot",
        exprs => LongArrayDot(exprs(0), exprs(1)), "built-in")
    call_function("graft_long_array_dot", a, b)
  }

  /** Cosine similarity from quantized vectors (deterministic doubles). */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

}
