package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.ForecastCv

/** Multi-window CV model selection: the winner is decided by the
  * POOLED cross-fold error, not the last fold. */
class ForecastCvSpec extends SparkSpec {
  import spark.implicits._

  test("a series whose best model flips between folds is decided by the average") {
    // 29-day dense series engineered so seasonal-naive is PERFECT on
    // the last fold (exact weekly repetition in the final 14 days) but
    // terrible on the earlier folds (a level shift breaks y(d-7) there).
    // A single-holdout leaderboard (AutoForecast's shape) would pick
    // seasonal_naive; pooling the three folds must not.
    val d0 = Date.valueOf("2024-01-01")
    def day(i: Int) = Date.valueOf(d0.toLocalDate.plusDays(i.toLong))
    // days 0..14: period-2 alternation (y(d) − y(d−7) flips parity →
    // sn errs by the full 8000 swing on folds 1-2, while a level
    // forecast errs only ~half); days 15..28: two identical calm weeks
    // near the alternation's mean (sn exact on fold 3, level models
    // close everywhere)
    val cents = (0 to 28).map { i =>
      if (i <= 14) 100L + (i % 2) * 8000L
      else 4000L + 100L * (i % 7)
    }
    val dense = (0 to 28).map(i => (7L, day(i), cents(i)))
      .toDF("user_id", "day", "cents")
    val row = ForecastCv.leaderboard(dense, "user_id", "day", "cents")
      .as[(Long, Long, Double, Double, Double, String, Double)].head()
    val (_, nEval, maeSn, maeHw, maeTh, best, bestMae) = row
    assert(nEval == 21L) // 3 folds x 7 eval days
    // last-fold sn error is zero, but the pooled sn error is not
    assert(maeSn > 0.0)
    // the chosen winner is the pooled argmin with the HW>theta>sn tie order
    val expected =
      if (maeHw <= maeTh && maeHw <= maeSn) "holt_winters"
      else if (maeTh <= maeSn) "theta"
      else "seasonal_naive"
    assert(best == expected)
    assert(bestMae == Seq(maeSn, maeHw, maeTh).min)
    // and specifically: the last-fold-only winner (seasonal_naive, MAE 0
    // there) did NOT win the pooled leaderboard
    val lastFoldSn = graft.operators.Forecast.seasonalNaiveBacktest(
      dense.select($"user_id", $"day".as("ts"), ($"cents" / 100.0).as("value")),
      "user_id", "ts", "value", season = 7, horizon = 7)
      .select("mae_cents").as[Double].head()
    assert(lastFoldSn == 0.0 && best != "seasonal_naive")
  }

  test("gated instance: pooled n_eval is 21 and MAEs are nonnegative") {
    val out = ForecastCv.forecastCvEvents(spark, sfDir)
      .as[(Long, Long, Double, Double, Double, String, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, n, sn, hw, th, best, bm) =>
      assert(n == 21L)
      assert(sn >= 0 && hw >= 0 && th >= 0)
      assert(bm == Seq(sn, hw, th).min)
      assert(Set("holt_winters", "theta", "seasonal_naive")(best))
    }
  }
}
