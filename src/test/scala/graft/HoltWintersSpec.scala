package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import graft.operators.{Forecast, HoltWinters}

/** Holt-Winters must EARN its place next to the seasonal-naive
  * baseline: on a planted trend+seasonality series the smoothed model
  * has to beat seasonal-naive (which cannot see trend — its forecast
  * for day d is the actual of d−7, systematically behind by 7·slope).
  * Plus the degeneracy/robustness edges of the integer recursion. */
class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  private val day0 = Date.valueOf("2024-01-01").toLocalDate

  /** 6 weeks of trend + weekly pattern (+ small deterministic jitter),
    * two keys. cents(t) = 100_00 + 150·t + pattern[t%7] + jitter. */
  private def planted = {
    val pattern = Array(0L, 2500L, 5000L, 1500L, -3000L, -4500L, 1000L)
    (0 until 42).flatMap { t =>
      Seq(1L, 2L).map { k =>
        val jitter = ((t * 2654435761L + k) % 97) - 48
        (k, Date.valueOf(day0.plusDays(t)),
          10000L + 150L * t + pattern(t % 7) * k + jitter)
      }
    }.toDF("key", "day", "cents")
  }

  test("beats seasonal-naive on a planted trend+seasonal series") {
    val hw = HoltWinters.backtest(planted, "key", "day", "cents",
        season = 7, horizon = 7)
      .agg(avg("mae_cents")).head().getDouble(0)
    // seasonal-naive over the same series: feed it (ts, value) rows
    val asEvents = planted.select(col("key"),
      col("day").cast("timestamp").as("ts"),
      (col("cents").cast("double") / 100.0).as("value"))
    val sn = Forecast.seasonalNaiveBacktest(asEvents, "key", "ts", "value",
        season = 7, horizon = 7)
      .agg(avg("mae_cents")).head().getDouble(0)
    assert(hw < sn, s"Holt-Winters ($hw) must beat seasonal-naive ($sn) " +
      "on a trending seasonal series")
    // and it must actually track: MAE well under one seasonal amplitude
    assert(hw < 2000, s"HW MAE too loose: $hw")
  }

  test("constant series forecasts itself exactly") {
    val const = (0 until 28).map { t =>
      (1L, Date.valueOf(day0.plusDays(t)), 5000L)
    }.toDF("key", "day", "cents")
    val m = HoltWinters.backtest(const, "key", "day", "cents", 7, 7)
      .head()
    assert(m.getAs[Long]("n_eval") == 7)
    assert(m.getAs[Double]("mae_cents") == 0.0,
      "constant series must backtest with zero error")
  }

  test("key shorter than one season is dropped, not errored") {
    // The guard's contract: a key whose observed day span is shorter
    // than one season cannot seed the seasonal state, so BOTH engines
    // drop it — the oracle's dense spine joins back to fit rows that
    // survive the same size(__ys) >= season cut, and the Spark side
    // filters before the recursion. Keys with enough history are
    // unaffected by the short key's presence.
    val short = (0 until 4).map { t => // 4 days < season 7
      (3L, Date.valueOf(day0.plusDays(t)), 7000L + 10L * t)
    }.toDF("key", "day", "cents")
    val withShort = HoltWinters.backtest(planted.union(short),
        "key", "day", "cents", season = 7, horizon = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!withShort.contains(3L), "short key must be dropped")
    val without = HoltWinters.backtest(planted,
        "key", "day", "cents", season = 7, horizon = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(withShort == without,
      "short key must not perturb surviving keys")
  }

  test("gated instance is deterministic and covers every user") {
    val a = HoltWinters.holtWintersEvents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val b = HoltWinters.holtWintersEvents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(a == b, "nondeterministic backtest")
    assert(a.nonEmpty)
  }
}
