package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.{AutoForecast, Forecast, HoltWinters, Theta}

/** Model selection must pick the right model per series shape:
  * seasonal-naive is unbeatable on a pure periodic series (it forecasts
  * it exactly), Holt-Winters wins once seasonality + trend are present,
  * and Theta (SES + drift, no seasonal state) wins on aperiodic noise,
  * where HW's forced weekly seasonal state and SN's lag-7 copy both
  * chase structure that isn't there. */
class AutoForecastSpec extends SparkSpec {
  import spark.implicits._

  private val day0 = Date.valueOf("2024-01-01").toLocalDate
  private val pattern = Array(0L, 2500L, 5000L, 1500L, -3000L, -4500L, 1000L)

  /** Deterministic hash step in [−500, 500] (splitmix-style). */
  private def step(t: Long): Long = {
    var z = t + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) % 501L + 501L) % 1001L - 500L
  }

  /** key 1: pure weekly periodic (SN exact). key 2: periodic + trend.
    * key 3: aperiodic random walk (Theta's home turf — tracking the
    * recent level beats copying the level from 7 days ago, √7 of walk
    * variance away, and beats HW's phantom weekly seasons). */
  private def series = (0 until 42).flatMap { t =>
    val walk = (0 to t).map(i => step(i.toLong)).sum
    Seq(
      (1L, Date.valueOf(day0.plusDays(t)), 10000L + pattern(t % 7)),
      (2L, Date.valueOf(day0.plusDays(t)), 10000L + 200L * t + pattern(t % 7)),
      (3L, Date.valueOf(day0.plusDays(t)), 10000L + walk))
  }.toDF("key", "day", "cents")

  test("each series shape goes to the right model; ties follow the documented order") {
    val asEvents = series.select(col("key"),
      col("day").cast("timestamp").as("ts"),
      (col("cents").cast("double") / 100.0).as("value"))
    val sn = Forecast.seasonalNaiveBacktest(asEvents, "key", "ts", "value", 7, 7)
    val hw = HoltWinters.backtest(series, "key", "day", "cents", 7, 7)
    val th = Theta.backtest(series, "key", "day", "cents", 7)
    val rows = AutoForecast.leaderboard(sn, hw, th, "key")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getString(4),
          r.getDouble(5))).toMap
    // key 2 trends + seasons: SN is a week of slope behind (1400
    // cents/day) and Theta has no seasonal state; HW must win STRICTLY
    val (sn2, hw2, th2, best2, _) = rows(2L)
    assert(hw2 < sn2 && hw2 < th2 && best2 == "holt_winters",
      s"trending seasonal series must go to holt-winters strictly: $rows")
    assert(sn2 >= 1000, s"SN should carry ~the weekly trend gap: $sn2")
    // key 3 is an aperiodic walk: SN forecasts the level from 7 days
    // ago, HW fits phantom weekly seasons from walk noise; theta's
    // smoothed current level must win
    val (sn3, hw3, th3, best3, bm3) = rows(3L)
    assert(th3 < sn3 && th3 < hw3 && best3 == "theta" && bm3 == th3,
      s"aperiodic walk must go to theta: $rows")
    // key 1 is purely periodic: SN and HW forecast it exactly — the
    // documented tie-break sends exact ties to holt_winters
    val (sn1, hw1, _, best1, bm1) = rows(1L)
    assert(sn1 == 0.0 && hw1 == 0.0 && bm1 == 0.0,
      s"pure periodicity must be exactly forecastable: $rows")
    assert(best1 == "holt_winters", "exact tie must follow the documented tie-break")
  }

  test("theta drops series shorter than 2 train points on both engines") {
    val tiny = Seq((9L, Date.valueOf(day0), 100L),
      (9L, Date.valueOf(day0.plusDays(1)), 200L)).toDF("key", "day", "cents")
    // holdback 1 leaves a 1-point train span -> no slope -> key dropped
    assert(Theta.forecastFrame(tiny, "key", "day", "cents",
      horizon = 1, holdback = 1).count() == 0)
  }

  test("best_mae is the winner's mae and the gate instance covers all users") {
    val out = AutoForecast.autoForecastEvents(spark, sfDir).localCheckpoint()
    assert(out.count() > 0)
    val bad = out.filter(
      col("best_mae_cents") =!= least(col("mae_sn_cents"), col("mae_hw_cents"),
        col("mae_theta_cents")) ||
      (col("best_model") === "holt_winters" &&
        (col("mae_hw_cents") > col("mae_sn_cents") ||
         col("mae_hw_cents") > col("mae_theta_cents"))) ||
      (col("best_model") === "theta" &&
        col("mae_theta_cents") > col("mae_sn_cents"))).count()
    assert(bad == 0)
  }

  test("four-candidate leaderboard: AR(2) wins its home turf, absents never win") {
    // key 4: strong 2-day oscillation around a level — AR(2) fits
    // x_t = -x_{t-1} deviations exactly; SN copies the lag-7 phase
    // (also exact here: 7 is odd -> antiphase!), so use an asymmetric
    // 2-cycle (+a, -b) that a weekly copy misses: pattern period 2
    // with amplitudes (4000, -2000): lag-7 lands on the OPPOSITE
    // element; HW's weekly season also misfits; theta smooths to the
    // mean and eats the full swing
    val osc = (0 until 42).map { t =>
      val dev = if (t % 2 == 0) 4000L else -2000L
      (4L, Date.valueOf(day0.plusDays(t)), 10000L + dev)
    }.toDF("key", "day", "cents")
    val asEvents = osc.select(col("key"),
      col("day").cast("timestamp").as("ts"),
      (col("cents").cast("double") / 100.0).as("value"))
    val sn = Forecast.seasonalNaiveBacktest(asEvents, "key", "ts", "value", 7, 7)
    val hw = HoltWinters.backtest(osc, "key", "day", "cents", 7, 7)
    val th = Theta.backtest(osc, "key", "day", "cents", 7)
    val ar = graft.operators.YuleWalker.backtest(osc, "key", "day", "cents", 7)
    val row = AutoForecast.leaderboard4(sn, hw, th, ar, "key").collect()(0)
    assert(row.getString(5) === "ar2",
      s"asymmetric 2-cycle must go to AR(2): $row")
    // a constant series is DROPPED by AR(2); the 4-way leaderboard must
    // still rank it among the remaining three (never null-win)
    val const = (0 until 42).map(t =>
      (5L, Date.valueOf(day0.plusDays(t)), 10000L)).toDF("key", "day", "cents")
    val constEvents = const.select(col("key"),
      col("day").cast("timestamp").as("ts"),
      (col("cents").cast("double") / 100.0).as("value"))
    val r5 = AutoForecast.leaderboard4(
      Forecast.seasonalNaiveBacktest(constEvents, "key", "ts", "value", 7, 7),
      HoltWinters.backtest(const, "key", "day", "cents", 7, 7),
      Theta.backtest(const, "key", "day", "cents", 7),
      graft.operators.YuleWalker.backtest(const, "key", "day", "cents", 7),
      "key").collect()(0)
    assert(r5.isNullAt(4), "AR(2) declines the constant series")
    assert(r5.getString(5) !== "ar2")
    assert(r5.getDouble(6) === 0.0, "the others forecast a constant exactly")
  }
}
