package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Classification-routed model dispatch — the composition that closes
  * the forecasting loop: [[DemandClassify]]'s Syntetos–Boylan quadrant
  * decides the FAMILY (intermittent/lumpy → Croston, whose SES-ratio
  * form is built for zero-heavy series), and inside the smooth/erratic
  * family [[AutoForecast]]'s exact backtest leaderboard picks the
  * member (seasonal-naive / Holt-Winters / Theta). This is the
  * dispatch the reference's per-series tuning loop implies
  * (/root/reference/MachineLearning/Kubernetes/src/stats_forecast_tune.py
  * tunes a statsforecast catalog that spans BOTH families; routing a
  * sparse series into ETS lets averaged zeros drown the level —
  * the classifier prevents exactly that).
  *
  * Pure composition of two gated components over ONE shared dense
  * spine: the classifier aggregates it per key; the leaderboard runs
  * the three model backtests on it. Output per series: the quadrant,
  * the quadrant's statistics, the smooth-family winner and its exact
  * MAE (reported for every key — for routed-to-Croston series it is
  * the smooth-family baseline the router overrode), and the routed
  * model. Keys must survive all three backtests (full-span series
  * always do; the inner join drops the same keys on both engines).
  *
  * Scale: one spine build (corpus touched once), inherited model
  * shapes, plus a per-key aggregate and one narrow join.
  */
object RouteForecast {

  /** (user_id, demand_class, adi_permicro, cv2_permicro, best_model,
    * best_mae_cents, routed_model). */
  def routeForecastEvents(spark: SparkSession, dir: String): DataFrame = {
    val spine = Resample
      .dailySpineFill(Tables.events(spark, dir), "user_id", "ts", "value")
      .localCheckpoint() // classifier aggregate + three backtests
    val dense = spine.select(col("key").as("user_id"), col("day"),
      col("cents"))
    val classes = DemandClassify.classifyDense(spine, "user_id")
      .select("user_id", "demand_class", "adi_permicro", "cv2_permicro")
    val lb = AutoForecast.leaderboard(
      Forecast.seasonalNaiveBacktest(
        Tables.events(spark, dir), "user_id", "ts", "value", 7, 7),
      HoltWinters.backtest(dense, "user_id", "day", "cents", 7, 7),
      Theta.backtest(dense, "user_id", "day", "cents", 7),
      "user_id")
    classes.join(lb, "user_id")
      .select(col("user_id"), col("demand_class"), col("adi_permicro"),
        col("cv2_permicro"), col("best_model"), col("best_mae_cents"),
        when(col("demand_class").isin("intermittent", "lumpy"),
          lit("croston")).otherwise(col("best_model")).as("routed_model"))
  }

  /** Composed oracle: the HW/Theta recursive chains + the exposed
    * leaderboard CTEs (shared `dense`/`d` spine) + the classifier
    * aggregate over the SAME `dense` CTE + the routing CASE. */
  def oracleSql: String =
    s"""WITH RECURSIVE
       |${HoltWinters.oracleCtePrefix()},
       |${Theta.oracleCtes()},
       |${AutoForecast.oracleLeaderboardCtes},
       |dcagg AS (
       |  SELECT user_id,
       |    CAST(count(*) AS BIGINT) AS n_days,
       |    CAST(sum(CASE WHEN cents <> 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_nonzero,
       |    CAST(sum(CASE WHEN cents <> 0 THEN abs(cents) END) AS HUGEINT) AS sx,
       |    CAST(sum(CASE WHEN cents <> 0
       |      THEN CAST(cents AS HUGEINT) * cents END) AS HUGEINT) AS sxx
       |  FROM dense GROUP BY user_id
       |), dcs AS (
       |  SELECT user_id,
       |    CAST((1000000 * CAST(n_days AS HUGEINT)) // n_nonzero AS BIGINT)
       |      AS adi_permicro,
       |    CAST((1000000 * (CAST(n_nonzero AS HUGEINT) * sxx - sx * sx))
       |      // (sx * sx) AS BIGINT) AS cv2_permicro
       |  FROM dcagg WHERE n_nonzero >= 1
       |), dclass AS (
       |  SELECT user_id, adi_permicro, cv2_permicro,
       |    CASE
       |      WHEN adi_permicro >= 1320000 AND cv2_permicro >= 490000 THEN 'lumpy'
       |      WHEN adi_permicro >= 1320000 THEN 'intermittent'
       |      WHEN cv2_permicro >= 490000 THEN 'erratic'
       |      ELSE 'smooth'
       |    END AS demand_class
       |  FROM dcs
       |)
       |SELECT c.user_id, c.demand_class, c.adi_permicro, c.cv2_permicro,
       |  l.best_model, l.best_mae_cents,
       |  CASE WHEN c.demand_class IN ('intermittent', 'lumpy')
       |       THEN 'croston' ELSE l.best_model END AS routed_model
       |FROM dclass c JOIN lb l USING (user_id)""".stripMargin
}
