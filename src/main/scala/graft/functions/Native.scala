package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

/** Single entry point for invoking graft's native Catalyst expressions
  * through the public Column API: registers the builder on the active
  * session's function registry ONCE (idempotent — a re-register per
  * call spammed `SimpleFunctionRegistry ... replaced` warnings into
  * every bench/test log and re-resolved the builder needlessly), then
  * routes through `call_function`.
  *
  * Expressions whose constructor carries data (PQ codebooks, IVF
  * centroids) embed a content hash in `name`, so one session can hold
  * plans over different codebooks concurrently and each name always
  * resolves to its own builder.
  */
object Native {
  def call(name: String, builder: Seq[Expression] => Expression, args: Column*): Column = {
    val reg = SparkSession.active.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name))) {
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    call_function(name, args: _*)
  }
}
