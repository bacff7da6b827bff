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

  /** The gated instance's horizon — referenced by BOTH the Spark path
    * and [[oracleSql]] so the two cannot de-synchronize. */
  private val gatedHorizon = 7

  /** ⌈(n+1)(1−α)⌉ with n = h, α = 1/4 — the split-conformal order
    * statistic index. SHARED by the Spark path and the oracle: the
    * oracle interpolates this value instead of hardcoding it, so a
    * horizon/alpha change moves both sides together. */
  private def conformalQIdx(h: Int): Int =
    math.ceil((h + 1) * 3 / 4.0).toInt

  /** Returns (key, qhat_cents, n_eval, n_covered, coverage). */
  def conformalBacktest(dense: DataFrame, keyCol: String, dayCol: String,
                        centsCol: String, season: Int,
                        horizon: Int): DataFrame = {
    val h = horizon
    val qIdx = conformalQIdx(h)
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
      "user_id", "day", "cents", season = 7, horizon = gatedHorizon)
      .select("user_id", "qhat_cents", "n_eval", "n_covered", "coverage")

  /** Two instantiations of the Holt-Winters CTE chain (suffix `c` =
    * fit-for-calibration at holdback 2h, suffix `t` = fit-for-test at
    * holdback h) + the order-statistic threshold + the coverage count.
    * The quantile index comes from [[conformalQIdx]] — the same
    * expression the Spark path evaluates — with the same
    * least(idx, n) guard, so the two engines index the residual list
    * identically for ANY gated horizon. */
  def oracleSql: String = {
    val h = gatedHorizon
    val qIdx = conformalQIdx(h)
    s"""WITH RECURSIVE
       |${HoltWinters.oracleCtePrefix(holdback = 2 * h, sfx = "c", horizon = h)},
       |${HoltWinters.oracleCtePrefix(holdback = h, sfx = "t", horizon = h)},
       |qh AS (
       |  SELECT p.user_id,
       |    (list_sort(list(abs(e.cents - p.yhat))))[least($qIdx, CAST(count(*) AS INT))] AS qhat_cents
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
}
