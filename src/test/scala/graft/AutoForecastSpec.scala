package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.{AutoForecast, Forecast, HoltWinters}

/** Model selection must pick the right model per series shape:
  * seasonal-naive is unbeatable on a pure periodic series (it forecasts
  * it exactly), Holt-Winters wins once a trend is present. */
class AutoForecastSpec extends SparkSpec {
  import spark.implicits._

  private val day0 = Date.valueOf("2024-01-01").toLocalDate
  private val pattern = Array(0L, 2500L, 5000L, 1500L, -3000L, -4500L, 1000L)

  /** key 1: pure weekly periodic (SN exact). key 2: periodic + trend. */
  private def series = (0 until 42).flatMap { t =>
    Seq(
      (1L, Date.valueOf(day0.plusDays(t)), 10000L + pattern(t % 7)),
      (2L, Date.valueOf(day0.plusDays(t)), 10000L + 200L * t + pattern(t % 7)))
  }.toDF("key", "day", "cents")

  test("trend goes to holt-winters strictly; pure periodicity is a zero-error tie") {
    val asEvents = series.select(col("key"),
      col("day").cast("timestamp").as("ts"),
      (col("cents").cast("double") / 100.0).as("value"))
    val sn = Forecast.seasonalNaiveBacktest(asEvents, "key", "ts", "value", 7, 7)
    val hw = HoltWinters.backtest(series, "key", "day", "cents", 7, 7)
    val rows = AutoForecast.leaderboard(sn, hw, "key")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getString(3), r.getDouble(4))).toMap
    // key 2 trends: seasonal-naive is systematically a week of slope
    // behind (7·200 = 1400 cents/day); HW must win STRICTLY
    val (sn2, hw2, best2, _) = rows(2L)
    assert(hw2 < sn2 && best2 == "holt_winters",
      s"trending series must go to holt-winters strictly: $rows")
    assert(sn2 >= 1000, s"SN should carry ~the weekly trend gap: $sn2")
    // key 1 is purely periodic: BOTH models forecast it exactly — the
    // documented tie-break sends exact ties to holt_winters
    val (sn1, hw1, best1, bm1) = rows(1L)
    assert(sn1 == 0.0 && hw1 == 0.0 && bm1 == 0.0,
      s"pure periodicity must be exactly forecastable by both: $rows")
    assert(best1 == "holt_winters", "exact tie must follow the documented tie-break")
  }

  test("best_mae is the winner's mae and the gate instance covers all users") {
    val out = AutoForecast.autoForecastEvents(spark, sfDir).localCheckpoint()
    assert(out.count() > 0)
    val bad = out.filter(
      col("best_mae_cents") =!= least(col("mae_sn_cents"), col("mae_hw_cents")) ||
      (col("best_model") === "holt_winters" &&
        col("mae_hw_cents") > col("mae_sn_cents"))).count()
    assert(bad == 0)
  }
}
