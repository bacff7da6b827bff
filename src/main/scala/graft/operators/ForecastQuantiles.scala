package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-horizon quantile forecasts — the probabilistic-forecast layer of
  * the reference's production path
  * (/root/reference/MachineLearning/TimeSeries/darts_single_runs_ensemble_stats.py:
  * 279-282 draws num_samples=1000 from the predictive distribution and
  * grades quantiles; statsforecast `level=` intervals are the same
  * contract). [[ForecastIntervals]] covers ONE symmetric band (split
  * conformal at a single α); this operator emits a τ-GRID of per-step
  * quantile forecasts whose width grows with horizon distance — the
  * "fan chart" a downstream consumer actually plots.
  *
  * Construction (all exact integers): fit [[HoltWinters]] at holdback
  * 2h and take SIGNED calibration residuals r = y − ŷ per (series,
  * step k). Pool residuals ACROSS series per step k (the per-horizon
  * error distribution; per-series-per-step there is only one residual,
  * so pooling is what makes "per-horizon" estimable), and take the
  * exact order statistic q̂(k,τ) = the ⌈(n_k+1)·τ⌉-th smallest (clamped
  * to [1, n_k]) under the total order (residual, series-id) — a window
  * rank, never a collected corpus array. The quantile forecast on the
  * TEST window (fit at holdback h) is ŷ_τ(s,k) = ŷ(s,k) + q̂(k,τ),
  * graded by exact ×10-scaled pinball loss per (k, τ) — the
  * [[Forecast.pinballLoss]] discipline, which punishes a τ=0.9 forecast
  * 9× harder for under-forecasting.
  *
  * Scale shape: two forecastFrame passes (each: one corpus daily-agg +
  * calendar-bounded per-key recursion); the quantile is a distributed
  * window sort over |series|·h residual rows partitioned by k (h
  * partitions of |series| rows — sort-based, no driver collect); the
  * grading join broadcasts the (h × |τ|)-row quantile table.
  */
object ForecastQuantiles {

  /** τ grid in tenths — {0.1, 0.5, 0.9}; exact pinball needs integer τ. */
  private val tau10s = Seq(1L, 5L, 9L)

  /** Per-(k, τ) quantile forecasts + pinball grade over DENSE per-key
    * daily series. Returns (k, tau10, n_cal, q_resid_cents, n_eval,
    * total_loss10, mean_loss_micros). */
  def quantileBacktest(dense: DataFrame, keyCol: String, dayCol: String,
                       centsCol: String, season: Int,
                       horizon: Int): DataFrame = {
    val spark = dense.sparkSession
    import spark.implicits._
    val h = horizon
    // signed calibration residuals per (series, k)
    val cal = HoltWinters.forecastFrame(dense, keyCol, dayCol, centsCol,
        season, h, holdback = 2 * h)
      .select(col("__key"), col("__k"),
        (col("__actual") - col("__yhat")).as("__r"))
    // per-k exact order statistics under the total order (resid, key)
    val byK = Window.partitionBy(col("__k"))
    val ranked = cal
      .withColumn("__rn",
        row_number().over(byK.orderBy(col("__r"), col("__key"))))
      .withColumn("__cnt", count(lit(1)).over(byK))
    val taus = tau10s.toDF("tau10")
    val q = ranked.crossJoin(broadcast(taus))
      .filter(col("__rn") ===
        least(greatest(expr("((__cnt + 1) * tau10 + 9) div 10"), lit(1L)),
          col("__cnt")))
      .select(col("__k").as("k"), col("tau10"),
        col("__cnt").as("n_cal"), col("__r").as("q_resid_cents"))

    // test-window point forecasts, shifted by q̂(k, τ), graded by pinball
    val test = HoltWinters.forecastFrame(dense, keyCol, dayCol, centsCol,
        season, h, holdback = h)
    test.join(broadcast(q), test("__k") === q("k"))
      .withColumn("__d",
        col("__actual") - (col("__yhat") + col("q_resid_cents")))
      .withColumn("__loss10", expr(
        "CASE WHEN __d >= 0 THEN tau10 * __d ELSE (10 - tau10) * (-__d) END"))
      .groupBy(col("k"), col("tau10"))
      .agg(
        first(col("n_cal")).as("n_cal"),
        first(col("q_resid_cents")).as("q_resid_cents"),
        count(lit(1)).as("n_eval"),
        sum(col("__loss10")).as("total_loss10"))
      .withColumn("mean_loss_micros", expr(
        "(CAST(100000 AS DECIMAL(38,0)) * total_loss10) div n_eval"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-user daily cents on the zero-filled dense
    * spine, weekly season, 7-day calibration + 7-day test, τ ∈
    * {0.1, 0.5, 0.9} — 21 output rows. */
  def forecastQuantilesEvents(spark: SparkSession, dir: String): DataFrame = {
    val dense = Resample
      .dailySpineFill(Tables.events(spark, dir), "user_id", "ts", "value")
      .select(col("key").as("user_id"), col("day"), col("cents"))
      .localCheckpoint() // both forecastFrame passes share one corpus scan
    quantileBacktest(dense, "user_id", "day", "cents",
      season = 7, horizon = 7)
  }

  /** Composed oracle: two Holt-Winters CTE chains (calibration `c`,
    * test `t`), the per-k ROW_NUMBER order statistic under the same
    * (residual, user_id) total order, and the exact pinball grade. */
  def oracleSql: String = {
    val h = 7
    s"""WITH RECURSIVE
       |${HoltWinters.oracleCtePrefix(holdback = 2 * h, sfx = "c", horizon = h)},
       |${HoltWinters.oracleCtePrefix(holdback = h, sfx = "t", horizon = h)},
       |resc AS (
       |  SELECT e.user_id, e.k, e.cents - p.yhat AS r
       |  FROM evc e JOIN predsc p ON p.user_id = e.user_id AND p.k = e.k),
       |ranked AS (
       |  SELECT k, r,
       |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY r, user_id) AS rn,
       |    count(*) OVER (PARTITION BY k) AS cnt
       |  FROM resc),
       |taus(tau10) AS (VALUES (1), (5), (9)),
       |q AS (
       |  SELECT k, tau10, cnt AS n_cal, r AS q_resid_cents
       |  FROM ranked, taus
       |  WHERE rn = least(greatest(((cnt + 1) * tau10 + 9) // 10, 1), cnt)),
       |scored AS (
       |  SELECT q.k, q.tau10, q.n_cal, q.q_resid_cents,
       |    e.cents - (p.yhat + q.q_resid_cents) AS d
       |  FROM evt e
       |  JOIN predst p ON p.user_id = e.user_id AND p.k = e.k
       |  JOIN q ON q.k = e.k)
       |SELECT k, CAST(tau10 AS BIGINT) AS tau10,
       |  CAST(max(n_cal) AS BIGINT) AS n_cal,
       |  CAST(max(q_resid_cents) AS BIGINT) AS q_resid_cents,
       |  count(*) AS n_eval,
       |  CAST(sum(CASE WHEN d >= 0 THEN tau10 * d
       |                ELSE (10 - tau10) * (-d) END) AS BIGINT) AS total_loss10,
       |  CAST((100000 * CAST(sum(CASE WHEN d >= 0 THEN tau10 * d
       |                ELSE (10 - tau10) * (-d) END) AS HUGEINT)) // count(*)
       |    AS BIGINT) AS mean_loss_micros
       |FROM scored GROUP BY k, tau10""".stripMargin
  }
}
