package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series supervised-learning frame: per-key daily aggregation plus
  * lagged targets and a trailing moving average — the feature/target
  * layout the reference's forecasting stack trains on
  * (/root/reference/MachineLearning/Ray/timeseries/stats_forecast_tune.py
  * and neural_forecast_tune.py consume exactly (unique_id, ds, y) plus
  * history-derived regressors; this builds that frame distributed).
  *
  * Exactness: the daily value is an integer-cent sum (order-proof);
  * lag() moves those integers; the moving average is an integer sum
  * divided by the frame row count — every engine computes the identical
  * double, so the whole frame hash-gates.
  *
  * Scale: one (key, day) aggregation, then windows partitioned BY KEY
  * over the daily rows — each task holds one key's daily history
  * (years × 365 rows), never raw events; the heavy reduction happened in
  * the groupBy with map-side combine.
  */
object LagFeatures {

  /** Daily per-key cent totals with lag-1, lag-7 and 7-day trailing mean. */
  def dailyLagFrame(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("day_cents"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val wMa = w.rowsBetween(-6, 0)
    daily
      .withColumn("lag1_cents", lag("day_cents", 1).over(w))
      .withColumn("lag7_cents", lag("day_cents", 7).over(w))
      .withColumn("ma7_cents", round(avg("day_cents").over(wMa), 4))
  }

  // ---- query-map entry (hash-gated) ----

  def lagFeaturesEvents(spark: SparkSession, dir: String): DataFrame =
    dailyLagFrame(Tables.events(spark, dir), "user_id", "ts", "value")
      .select("user_id", "day", "day_cents", "lag1_cents", "lag7_cents",
        "ma7_cents")

  def oracleSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS day_cents
      |  FROM events GROUP BY user_id, CAST(ts AS DATE))
      |SELECT user_id, day, day_cents,
      |  lag(day_cents, 1) OVER w AS lag1_cents,
      |  lag(day_cents, 7) OVER w AS lag7_cents,
      |  round(avg(day_cents) OVER (PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7_cents
      |FROM daily
      |WINDOW w AS (PARTITION BY user_id ORDER BY day)""".stripMargin
}
