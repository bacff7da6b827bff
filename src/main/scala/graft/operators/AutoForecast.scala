package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-series model selection over the forecast backtests — the
  * evaluation/selection loop of the reference's forecasting stack
  * (/root/reference/MachineLearning/Kubernetes/src/stats_forecast_tune.py:
  * 291-356 `evaluate_models_with_cv` builds the per-series per-model
  * error table and picks the winner; AutoETS itself is "fit candidates,
  * keep the best"). All three candidate models here are EXACT integer
  * pipelines ([[Forecast]] seasonal-naive, [[HoltWinters]] additive
  * ETS, [[Theta]] SES-with-drift — the same trio the reference tunes),
  * so the leaderboard — per-series MAE of each model, the chosen
  * winner, its error — is deterministic and sits inside one DuckDB hash
  * gate, composed from the three models' already-gated oracles.
  *
  * Tie-break is explicit and engine-identical: Holt-Winters beats
  * Theta beats seasonal-naive (all MAEs derive from exact integer
  * sums, so `<=` compares identical doubles on both engines).
  *
  * Scale: one narrow join of two per-key aggregate frames; each input
  * carries the scale shape documented on its own operator.
  */
object AutoForecast {

  /** Join the three backtests per key and pick the winner. Tie order
    * (engine-identical `<=` on exact integer-derived doubles):
    * holt_winters beats theta beats seasonal_naive. */
  def leaderboard(sn: DataFrame, hw: DataFrame, th: DataFrame,
                  keyCol: String): DataFrame =
    hw.select(col(keyCol), col("mae_cents").as("mae_hw_cents"))
      .join(th.select(col(keyCol), col("mae_cents").as("mae_theta_cents")), keyCol)
      .join(sn.select(col(keyCol), col("mae_cents").as("mae_sn_cents")), keyCol)
      .select(col(keyCol), col("mae_sn_cents"), col("mae_hw_cents"),
        col("mae_theta_cents"),
        when(col("mae_hw_cents") <= col("mae_theta_cents") &&
             col("mae_hw_cents") <= col("mae_sn_cents"), lit("holt_winters"))
          .when(col("mae_theta_cents") <= col("mae_sn_cents"), lit("theta"))
          .otherwise(lit("seasonal_naive")).as("best_model"),
        least(col("mae_hw_cents"), col("mae_theta_cents"),
          col("mae_sn_cents")).as("best_mae_cents"))

  /** Four-candidate variant: [[YuleWalker]] AR(2) joins the zoo. AR(2)
    * declines short/degenerate series (T < 4 or zero Cauchy-Schwarz
    * margin), so it enters by LEFT join and an absent MAE never wins
    * (coalesced to 1e18 inside the comparison only; the emitted column
    * stays NULL). Tie order extends the three-model contract:
    * holt_winters ≥ theta ≥ ar2 ≥ seasonal_naive. */
  def leaderboard4(sn: DataFrame, hw: DataFrame, th: DataFrame,
                   ar: DataFrame, keyCol: String): DataFrame = {
    val far = col("__ar")
    hw.select(col(keyCol), col("mae_cents").as("mae_hw_cents"))
      .join(th.select(col(keyCol), col("mae_cents").as("mae_theta_cents")), keyCol)
      .join(sn.select(col(keyCol), col("mae_cents").as("mae_sn_cents")), keyCol)
      .join(ar.select(col(keyCol), col("mae_cents").as("mae_ar2_cents")),
        Seq(keyCol), "left")
      .withColumn("__ar", coalesce(col("mae_ar2_cents"), lit(1e18)))
      .select(col(keyCol), col("mae_sn_cents"), col("mae_hw_cents"),
        col("mae_theta_cents"), col("mae_ar2_cents"),
        when(col("mae_hw_cents") <= col("mae_theta_cents") &&
             col("mae_hw_cents") <= far &&
             col("mae_hw_cents") <= col("mae_sn_cents"), lit("holt_winters"))
          .when(col("mae_theta_cents") <= far &&
                col("mae_theta_cents") <= col("mae_sn_cents"), lit("theta"))
          .when(far <= col("mae_sn_cents"), lit("ar2"))
          .otherwise(lit("seasonal_naive")).as("best_model"),
        least(col("mae_hw_cents"), col("mae_theta_cents"), far,
          col("mae_sn_cents")).as("best_mae_cents"))
  }

  // ---- query-map entry (hash-gated) ----

  def autoForecast4Events(spark: SparkSession, dir: String): DataFrame = {
    val dense = Resample
      .dailySpineFill(Tables.events(spark, dir), "user_id", "ts", "value")
      .select(col("key").as("user_id"), col("day"), col("cents"))
      .localCheckpoint()
    leaderboard4(
      Forecast.forecastBacktestEvents(spark, dir),
      HoltWinters.backtest(dense, "user_id", "day", "cents",
        season = 7, horizon = 7),
      Theta.backtest(dense, "user_id", "day", "cents", horizon = 7),
      YuleWalker.backtest(dense, "user_id", "day", "cents", horizon = 7),
      "user_id")
  }

  def autoForecast4OracleSql: String =
    s"""WITH RECURSIVE
       |${HoltWinters.oracleCtePrefix()},
       |${Theta.oracleCtes()},
       |${YuleWalker.oracleCtes()},
       |$oracleLeaderboardCtes,
       |ar AS (
       |  SELECT p.user_id, CAST(sum(abs(e.cents - p.yhat)) AS DOUBLE) / count(*) AS mae
       |  FROM ywpreds p JOIN ev e ON e.user_id = p.user_id AND e.k = p.k
       |  GROUP BY p.user_id),
       |lb4 AS (
       |  SELECT hw.user_id, sn.mae AS mae_sn_cents, hw.mae AS mae_hw_cents,
       |    th.mae AS mae_theta_cents, ar.mae AS mae_ar2_cents,
       |    coalesce(ar.mae, 1e18) AS fmae
       |  FROM hw JOIN th USING (user_id) JOIN sn USING (user_id)
       |  LEFT JOIN ar USING (user_id))
       |SELECT user_id, mae_sn_cents, mae_hw_cents, mae_theta_cents,
       |  mae_ar2_cents,
       |  CASE WHEN mae_hw_cents <= mae_theta_cents AND mae_hw_cents <= fmae
       |         AND mae_hw_cents <= mae_sn_cents THEN 'holt_winters'
       |       WHEN mae_theta_cents <= fmae
       |         AND mae_theta_cents <= mae_sn_cents THEN 'theta'
       |       WHEN fmae <= mae_sn_cents THEN 'ar2'
       |       ELSE 'seasonal_naive' END AS best_model,
       |  least(mae_hw_cents, mae_theta_cents, fmae, mae_sn_cents)
       |    AS best_mae_cents
       |FROM lb4""".stripMargin

  def autoForecastEvents(spark: SparkSession, dir: String): DataFrame = {
    // HW and Theta fit the same dense spine — build it once and pin it
    // (localCheckpoint, the audienceOverlap discipline) so the corpus
    // scan + daily aggregate run once, not once per candidate model.
    val dense = Resample
      .dailySpineFill(Tables.events(spark, dir), "user_id", "ts", "value")
      .select(col("key").as("user_id"), col("day"), col("cents"))
      .localCheckpoint()
    leaderboard(
      Forecast.forecastBacktestEvents(spark, dir),
      HoltWinters.backtest(dense, "user_id", "day", "cents",
        season = 7, horizon = 7),
      Theta.backtest(dense, "user_id", "day", "cents", horizon = 7),
      "user_id")
  }

  /** Composed oracle: the Holt-Winters recursive CTE chain (the SAME
    * [[HoltWinters.oracleCtePrefix]] its own gate runs on — structural
    * reuse, no string surgery) + [[Theta.oracleCtes]] over the shared
    * series chain + the seasonal-naive backtest rebuilt on the shared
    * sparse daily CTE (`d`), joined per key. */
  /** The three per-model MAE CTEs over the shared HW/Theta chains —
    * exposed so [[RouteForecast]] composes the leaderboard
    * structurally. Requires [[HoltWinters.oracleCtePrefix]] (unsuffixed)
    * and [[Theta.oracleCtes]] (unsuffixed) earlier in the statement. */
  def oracleLeaderboardCtes: String =
    s"""hw AS (
       |  SELECT p.user_id, CAST(sum(abs(e.cents - p.yhat)) AS DOUBLE) / count(*) AS mae
       |  FROM preds p JOIN ev e ON e.user_id = p.user_id AND e.k = p.k
       |  GROUP BY p.user_id),
       |th AS (
       |  SELECT p.user_id, CAST(sum(abs(e.cents - p.yhat)) AS DOUBLE) / count(*) AS mae
       |  FROM tpreds p JOIN ev e ON e.user_id = p.user_id AND e.k = p.k
       |  GROUP BY p.user_id),
       |sn_ev AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day DESC) AS recency
       |  FROM d),
       |sn_j AS (
       |  SELECT e.user_id, e.cents, h.cents AS hcents
       |  FROM sn_ev e JOIN d h ON e.user_id = h.user_id AND e.day = h.day + 7
       |  WHERE e.recency <= 7),
       |sn AS (
       |  SELECT user_id, CAST(sum(abs(cents - hcents)) AS DOUBLE) / count(*) AS mae
       |  FROM sn_j GROUP BY user_id),
       |lb AS (
       |  SELECT hw.user_id, sn.mae AS mae_sn_cents, hw.mae AS mae_hw_cents,
       |    th.mae AS mae_theta_cents,
       |    CASE WHEN hw.mae <= th.mae AND hw.mae <= sn.mae THEN 'holt_winters'
       |         WHEN th.mae <= sn.mae THEN 'theta'
       |         ELSE 'seasonal_naive' END AS best_model,
       |    least(hw.mae, th.mae, sn.mae) AS best_mae_cents
       |  FROM hw JOIN th USING (user_id) JOIN sn USING (user_id))""".stripMargin

  def oracleSql: String =
    s"""WITH RECURSIVE
       |${HoltWinters.oracleCtePrefix()},
       |${Theta.oracleCtes()},
       |$oracleLeaderboardCtes
       |SELECT user_id, mae_sn_cents, mae_hw_cents, mae_theta_cents,
       |  best_model, best_mae_cents
       |FROM lb""".stripMargin
}
