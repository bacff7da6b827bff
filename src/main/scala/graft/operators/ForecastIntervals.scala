package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Split-conformal prediction intervals around the Holt-Winters
  * forecast — the interval layer of the reference's forecasting stack
  * (/root/reference/MachineLearning/Ray/ray_air_data_tune_conformal_demo.py:
  * 280-330 calibrates a conformal quantile on held-out residuals and
  * reports empirical coverage; stats_forecast predictions ship with
  * intervals). Composition of two already-gated exact components:
  * [[HoltWinters.forecastFrame]] supplies integer forecasts on TWO
  * windows, [[graft.operators.Conformal]]'s order-statistic discipline
  * supplies the threshold.
  *
  * Per key: fit on days ≤ hi−2h, forecast the CALIBRATION window
  * (hi−2h, hi−h], take absolute integer residuals; q̂ = the
  * ⌈(n+1)(1−α)⌉-th smallest calibration residual (n = h = 7, α = 0.25 ⇒
  * the 6th of 7 — an exact integer order statistic over a
  * horizon-bounded array, never a corpus-sized sort). Then fit on days
  * ≤ hi−h, forecast the TEST window, and count |y − ŷ| ≤ q̂. Split
  * conformal guarantees P(covered) ≥ 1−α when residuals are
  * exchangeable — the spec checks the empirical aggregate.
  *
  * Scale: two forecastFrame passes (each: one daily-agg shuffle + one
  * per-key bounded recursion) + one per-key array sort of h elements +
  * one narrow join. Nothing beyond the backtest's own shape.
  */
object ForecastIntervals {

  /** Returns (key, qhat_cents, n_eval, n_covered, coverage). */
  def conformalBacktest(dense: DataFrame, keyCol: String, dayCol: String,
                        centsCol: String, season: Int,
                        horizon: Int): DataFrame = {
    val h = horizon
    // ceil((n+1)(1-alpha)) with n = h, alpha = 1/4 => (6h+6+7) div 8? Keep
    // it literal: idx = ceil((h+1) * 3 / 4.0) — exact small-int math
    val qIdx = math.ceil((h + 1) * 3 / 4.0).toInt
    val cal = HoltWinters.forecastFrame(dense, keyCol, dayCol, centsCol,
        season, h, holdback = 2 * h)
      .groupBy(col("__key"))
      .agg(sort_array(collect_list(abs(col("__actual") - col("__yhat"))))
        .as("__res"))
      .select(col("__key"),
        element_at(col("__res"), least(lit(qIdx), size(col("__res"))))
          .as("qhat_cents"))
    val test = HoltWinters.forecastFrame(dense, keyCol, dayCol, centsCol,
        season, h, holdback = h)
    test.join(cal, "__key")
      .groupBy(col("__key").as(keyCol))
      .agg(
        first(col("qhat_cents")).as("qhat_cents"),
        count(lit(1)).as("n_eval"),
        sum(when(abs(col("__actual") - col("__yhat")) <= col("qhat_cents"), 1L)
          .otherwise(0L)).as("n_covered"))
      .withColumn("coverage",
        round(col("n_covered").cast("double") / col("n_eval"), 6))
  }

  // ---- query-map entry (hash-gated) ----

  def forecastIntervalsEvents(spark: SparkSession, dir: String): DataFrame =
    conformalBacktest(
      Resample.dailySpineFill(Tables.events(spark, dir), "user_id", "ts", "value")
        .select(col("key").as("user_id"), col("day"), col("cents")),
      "user_id", "day", "cents", season = 7, horizon = 7)
      .select("user_id", "qhat_cents", "n_eval", "n_covered", "coverage")

  /** Two instantiations of the Holt-Winters CTE chain (suffix `c` =
    * fit-for-calibration at holdback 14, suffix `t` = fit-for-test at
    * holdback 7) + the order-statistic threshold + the coverage count. */
  def oracleSql: String =
    s"""WITH RECURSIVE
       |${HoltWinters.oracleCtePrefix(holdback = 14, sfx = "c")},
       |${HoltWinters.oracleCtePrefix(holdback = 7, sfx = "t")},
       |qh AS (
       |  SELECT p.user_id,
       |    (list_sort(list(abs(e.cents - p.yhat))))[6] AS qhat_cents
       |  FROM predsc p JOIN evc e ON e.user_id = p.user_id AND e.k = p.k
       |  GROUP BY p.user_id)
       |SELECT t.user_id, q.qhat_cents,
       |  count(*) AS n_eval,
       |  CAST(sum(CASE WHEN abs(e.cents - t.yhat) <= q.qhat_cents
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       |  round(CAST(sum(CASE WHEN abs(e.cents - t.yhat) <= q.qhat_cents
       |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS coverage
       |FROM predst t
       |JOIN evt e ON e.user_id = t.user_id AND e.k = t.k
       |JOIN qh q ON q.user_id = t.user_id
       |GROUP BY t.user_id, q.qhat_cents""".stripMargin
}
