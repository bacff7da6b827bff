package graft

import org.apache.spark.sql.SparkSession
import graft.functions.{AdcSum, LongArrayDot, MinHashSignature, PolyFingerprint, QuantizeVec, SimHash64}

/** SQL-surface registration for graft's native Catalyst expressions, so
  * `spark.sql(...)` users get them alongside the Column API:
  *
  *   - `graft_long_array_dot(array<bigint>, array<bigint>) -> bigint`
  *   - `graft_poly_fingerprint(string) -> bigint`
  *   - `graft_simhash64(array<bigint>) -> bigint`
  *   - `graft_minhash_signature(array<bigint>) -> array<bigint>` (32 slots)
  *   - `graft_quantize(array<float|double>) -> array<bigint>`
  *   - `graft_quantize_unit(array<float|double>) -> array<bigint>`
  *   - `graft_adc_sum(array<array<bigint>>, array<int>) -> bigint`
  *
  * (The codebook/centroid-carrying expressions — PqAssign, PqDistTables,
  * NearestCentroids, ResidualQ — register per codebook under
  * content-hashed names via [[graft.functions.Native]] and have no
  * data-free SQL form.)
  *
  * The Column-API entry points ([[graft.functions.VectorFunctions.dotQ]],
  * [[graft.functions.TextFunctions.fingerprint]]) self-register
  * idempotently on the active session; call this once per session to make
  * the names available to pure-SQL callers up front.
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_long_array_dot",
      exprs => LongArrayDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_poly_fingerprint",
      exprs => PolyFingerprint(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_signature",
      exprs => MinHashSignature(exprs.head, graft.dedup.MinHashLsh.SigLen), "built-in")
    reg.createOrReplaceTempFunction("graft_quantize",
      exprs => QuantizeVec(exprs.head, unit = false), "built-in")
    reg.createOrReplaceTempFunction("graft_quantize_unit",
      exprs => QuantizeVec(exprs.head, unit = true), "built-in")
    reg.createOrReplaceTempFunction("graft_adc_sum",
      exprs => AdcSum(exprs(0), exprs(1)), "built-in")
  }
}
