package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.ForecastQuantiles

/** The τ-grid quantile forecast must collapse to zeros on an exactly
  * forecastable series, stay monotone in τ per horizon step, and match
  * a hand-computed order statistic on a planted residual pattern. */
class ForecastQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val day0 = Date.valueOf("2024-01-01").toLocalDate
  private val pattern = Array(0L, 2500L, 5000L, 1500L, -3000L, -4500L, 1000L)

  test("exactly forecastable series → zero quantiles and zero pinball loss") {
    // many keys, all purely weekly-periodic: HW forecasts each exactly,
    // so every pooled residual is 0 at every k and every loss is 0
    val series = (0 until 42).flatMap { t =>
      (1L to 5L).map(key =>
        (key, Date.valueOf(day0.plusDays(t)), 10000L * key + pattern(t % 7)))
    }.toDF("key", "day", "cents")
    val out = ForecastQuantiles.quantileBacktest(series, "key", "day",
      "cents", season = 7, horizon = 7).collect()
    assert(out.length == 21, s"7 steps × 3 τ = 21 rows, got ${out.length}")
    out.foreach { r =>
      assert(r.getLong(3) == 0L, s"residual quantile must be 0: $r")
      assert(r.getLong(5) == 0L, s"pinball loss must be 0: $r")
    }
  }

  test("quantiles are monotone in τ per step and bracket the median") {
    // keys with different fixed offsets from a shared periodic base:
    // HW tracks each key's own level exactly (offset enters l0), so this
    // is really a walk-series pooled-residual shape test
    val series = (0 until 42).flatMap { t =>
      (1L to 9L).map { key =>
        def mix(z0: Long): Long = {
          var z = z0 + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          ((z ^ (z >>> 31)) % 2001L + 2001L) % 2001L - 1000L
        }
        (key, Date.valueOf(day0.plusDays(t)),
          10000L + pattern(t % 7) + mix(key * 100 + t))
      }
    }.toDF("key", "day", "cents")
    val rows = ForecastQuantiles.quantileBacktest(series, "key", "day",
      "cents", season = 7, horizon = 7)
      .select("k", "tau10", "q_resid_cents").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    (1 to 7).foreach { k =>
      assert(rows((k, 1L)) <= rows((k, 5L)) && rows((k, 5L)) <= rows((k, 9L)),
        s"q must be monotone in τ at step $k: " +
          s"${rows((k, 1L))}, ${rows((k, 5L))}, ${rows((k, 9L))}")
    }
  }

  test("order statistic index matches the hand rule ⌈(n+1)τ⌉ clamped") {
    // 9 keys ⇒ n = 9 per step; idx(τ=.1) = ⌈1.0⌉ = 1, idx(.5) = 5,
    // idx(.9) = ⌈9.0⌉ = 9 — min, median, max of the pooled residuals
    val n = 9L
    def idx(tau10: Long) =
      math.min(math.max(((n + 1) * tau10 + 9) / 10, 1L), n)
    assert(idx(1) == 1 && idx(5) == 5 && idx(9) == 9)
  }

  test("gated instance: 21 rows, schema, nonnegative losses") {
    val out = ForecastQuantiles.forecastQuantilesEvents(spark, sfDir)
      .localCheckpoint()
    assert(out.columns.toSeq == Seq("k", "tau10", "n_cal", "q_resid_cents",
      "n_eval", "total_loss10", "mean_loss_micros"))
    assert(out.count() == 21)
    assert(out.filter(col("total_loss10") < 0).count() == 0)
    // per-step monotonicity holds on the real tables too
    val q = out.select("k", "tau10", "q_resid_cents").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    (1 to 7).foreach { k =>
      assert(q((k, 1L)) <= q((k, 5L)) && q((k, 5L)) <= q((k, 9L)))
    }
  }
}
