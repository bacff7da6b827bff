package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The shared splitmix64 finalizer — one implementation for every
  * deterministic hash stream in the library (LSH hyperplanes, MinHash
  * slot mixing, the stub embedding encoder), so a constant can't drift
  * in one copy and silently change recalls. */
object Mix64 {
  final val Golden = 0x9E3779B97F4A7C15L

  @inline def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** Input-type validation for the SQL-registered native expressions —
  * without it, a wrong-typed SQL argument (e.g. array<int>) would read
  * garbage through getLong instead of failing analysis. */
object ExprChecks {
  def requireLongArray(dt: DataType, fn: String): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<bigint>, got ${other.catalogString}")
  }
}
