package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.ForecastIntervals

/** Split-conformal intervals: exact-forecastable series get zero-width
  * intervals with total coverage; noisy series must reach the 1−α
  * marginal coverage guarantee in aggregate. */
class ForecastIntervalsSpec extends SparkSpec {
  import spark.implicits._

  private val day0 = Date.valueOf("2024-01-01").toLocalDate

  test("pure periodic series: qhat = 0 and coverage = 1") {
    val pattern = Array(0L, 2500L, 5000L, 1500L, -3000L, -4500L, 1000L)
    val series = (0 until 42).map { t =>
      (1L, Date.valueOf(day0.plusDays(t)), 10000L + pattern(t % 7))
    }.toDF("key", "day", "cents")
    val m = ForecastIntervals.conformalBacktest(series, "key", "day", "cents", 7, 7)
      .head()
    assert(m.getAs[Long]("qhat_cents") == 0L,
      "exactly-forecastable calibration window must give a zero-width interval")
    assert(m.getAs[Double]("coverage") == 1.0)
  }

  test("gated instance: aggregate coverage clears the conformal floor") {
    val out = ForecastIntervals.forecastIntervalsEvents(spark, sfDir)
      .localCheckpoint()
    assert(out.count() > 0)
    val agg = out.agg(
      sum("n_covered").cast("double") / sum("n_eval"),
      min("qhat_cents")).head()
    // alpha = 0.25; marginal coverage holds in aggregate (finite-sample
    // slack for per-key n = 7)
    assert(agg.getDouble(0) >= 0.70, s"aggregate coverage too low: $agg")
    assert(agg.getLong(1) >= 0L, "negative interval width")
  }
}
