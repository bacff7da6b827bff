package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge: `SparkContext.listenerBus` is private[spark]; specs
  * that count task metrics need to drain the async bus deterministically
  * instead of sleeping (ForecastPredictSpec). */
object BusDrain {
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
