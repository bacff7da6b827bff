package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Seasonal-naive forecast backtest over per-key daily series — the
  * baseline-model evaluation loop of the reference's forecasting stack
  * (/root/reference/MachineLearning/Ray/timeseries/stats_forecast_tune.py:
  * 291-356 `evaluate_models_with_cv` + the horizon holdout at 487-494;
  * seasonal-naive with season_length=7 is the canonical statsforecast
  * baseline the tuned ETS/ARIMA/Theta models are judged against).
  *
  * The reference pulls every unique_id's series into pandas inside Ray
  * tasks; here the whole backtest is three dataframe stages, all keyed
  * by series id:
  *   1. daily aggregation (map-side combine, integer cents);
  *   2. the forecast join ŷ(d) = y(d − season): DATE-ARITHMETIC
  *      self-join, not a row lag — a row lag silently misforecasts
  *      across gaps in the calendar, date equality cannot;
  *   3. per-key horizon selection (last `horizon` observed days via a
  *      per-key window — bounded by each key's day count) and exact
  *      MAE/bias aggregation (integer sums ÷ counts).
  */
object Forecast {

  /** Backtest per key: evaluate seasonal-naive on each key's last
    * `horizon` observed days; eval rows need y(d − season) observed.
    * Returns (key, n_eval, mae_cents, bias_cents). */
  def seasonalNaiveBacktest(df: DataFrame, keyCol: String, tsCol: String,
                            valueCol: String, season: Int,
                            horizon: Int): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("cents"))
    val wDesc = Window.partitionBy(col(keyCol)).orderBy(col("day").desc)
    val eval = daily
      .withColumn("__recency", row_number().over(wDesc))
      .filter(col("__recency") <= horizon)
    val hist = daily.select(col(keyCol), col("day").as("__hday"),
      col("cents").as("__hcents"))
    eval.join(hist,
        eval(keyCol) === hist(keyCol) &&
          eval("day") === date_add(col("__hday"), season))
      .select(eval(keyCol), col("cents"), col("__hcents"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_eval"),
        (sum(abs(col("cents") - col("__hcents"))) / count(lit(1)))
          .as("mae_cents"),
        (sum(col("cents") - col("__hcents")) / count(lit(1)))
          .as("bias_cents"))
  }

  // ---- query-map entry (hash-gated) ----

  def forecastBacktestEvents(spark: SparkSession, dir: String): DataFrame =
    seasonalNaiveBacktest(Tables.events(spark, dir), "user_id", "ts",
      "value", season = 7, horizon = 7)
      .select("user_id", "n_eval", "mae_cents", "bias_cents")

  def oracleSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
      |ev AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |    ORDER BY day DESC) AS recency
      |  FROM daily),
      |j AS (
      |  SELECT e.user_id, e.cents, h.cents AS hcents
      |  FROM ev e JOIN daily h
      |    ON e.user_id = h.user_id AND e.day = h.day + 7
      |  WHERE e.recency <= 7)
      |SELECT user_id, count(*) AS n_eval,
      |  CAST(sum(abs(cents - hcents)) AS DOUBLE) / count(*) AS mae_cents,
      |  CAST(sum(cents - hcents) AS DOUBLE) / count(*) AS bias_cents
      |FROM j GROUP BY user_id""".stripMargin

  /** Pinball (quantile) loss over the seasonal-naive eval frame — the
    * metric that grades a forecast AS A QUANTILE (MAE only grades the
    * median; τ = 0.9 punishes under-forecasting 9× harder than over):
    * pinball_τ(d) with d = actual − forecast, kept exact by the ×10
    * scale (τ10 ∈ {1, 5, 9} ⇒ loss10 = τ10·d if d ≥ 0 else
    * (10−τ10)·(−d), all BIGINT); τ = 0.5 recovers MAE/2 bit-exactly
    * (spec-asserted). One eval-frame pass × a 3-row τ list. */
  def pinballLoss(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val wDesc = Window.partitionBy(col("user_id")).orderBy(col("day").desc)
    val eval = daily
      .withColumn("__recency", row_number().over(wDesc))
      .filter(col("__recency") <= 7)
    val hist = daily.select(col("user_id").as("__hu"), col("day").as("__hday"),
      col("cents").as("__hcents"))
    val diffs = eval.join(hist,
        col("user_id") === col("__hu") &&
          col("day") === date_add(col("__hday"), 7))
      .select((col("cents") - col("__hcents")).as("d"))
    val taus = Seq(1L, 5L, 9L).toDF("tau10")
    diffs.crossJoin(broadcast(taus))
      .withColumn("loss10", expr(
        "CASE WHEN d >= 0 THEN tau10 * d ELSE (10 - tau10) * (-d) END"))
      .groupBy(col("tau10"))
      .agg(count(lit(1)).as("n_eval"), sum(col("loss10")).as("total_loss10"))
      .withColumn("mean_loss_micros", expr("(100000 * total_loss10) div n_eval"))
  }

  def pinballOracleSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2
      |), ev AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY day DESC) AS recency
      |  FROM daily
      |), diffs AS (
      |  SELECT e.cents - h.cents AS d
      |  FROM ev e JOIN daily h
      |    ON e.user_id = h.user_id AND e.day = h.day + INTERVAL 7 DAY
      |  WHERE e.recency <= 7
      |), taus(tau10) AS (VALUES (1), (5), (9)),
      |scored AS (
      |  SELECT t.tau10,
      |    CASE WHEN d >= 0 THEN t.tau10 * d ELSE (10 - t.tau10) * (-d) END
      |      AS loss10
      |  FROM diffs CROSS JOIN taus t
      |)
      |SELECT CAST(tau10 AS BIGINT) AS tau10,
      |  CAST(count(*) AS BIGINT) AS n_eval,
      |  CAST(sum(loss10) AS BIGINT) AS total_loss10,
      |  CAST((100000 * sum(loss10)) // count(*) AS BIGINT) AS mean_loss_micros
      |FROM scored GROUP BY 1""".stripMargin
}
