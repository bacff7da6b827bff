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

  /** MASE — Mean Absolute SCALED Error — of the seasonal-naive model
    * per series: the scale-free forecast grade (Hyndman & Koehler
    * 2006) that MAE lacks — MAE is incomparable across series whose
    * levels differ 1000×, MASE divides by the in-sample MAE of the
    * one-step naive forecast so "1.0" always means "as good as naive"
    * regardless of units or volume. This is the cross-series model
    * ranking number the reference's CV loop reports across unique_ids
    * (stats_forecast_tune.py's evaluate_models_with_cv).
    *
    * Exactness: both error sums are BIGINT cents; MASE =
    * (Σe_m/n_m)/(Σe_n/n_n) is reported as the cross-multiplied single
    * truncation (10⁶·Σe_m·n_n) div (Σe_n·n_m) in DECIMAL(38,0) —
    * products of 10¹⁸-cent sums and 10⁵-day counts stay ≤ 10²⁹. NULL
    * when the naive denominator is 0 (constant series — MASE
    * undefined there by definition).
    *
    * Scale: the daily rollup is the only fact pass; the model errors
    * are a date-arithmetic self-join of the spine (gap-safe, like
    * [[seasonalNaiveBacktest]]) and the naive errors one lag window
    * per key — all on the calendar-bounded spine. */
  def maseSeasonalNaive(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, season: Int): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("cents"))
      .localCheckpoint() // consumed by the model join AND the naive lag
    val hist = daily.select(col(keyCol).as("__hk"), col("day").as("__hday"),
      col("cents").as("__hcents"))
    val model = daily.join(hist,
        daily(keyCol) === col("__hk") &&
          daily("day") === date_add(col("__hday"), season))
      .groupBy(daily(keyCol))
      .agg(count(lit(1)).cast(d38).as("n_model"),
        sum(abs(col("cents") - col("__hcents"))).cast(d38).as("sae_model"))
    val wLag = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val naive = daily
      .withColumn("__prev", lag(col("cents"), 1).over(wLag))
      .filter(col("__prev").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast(d38).as("n_naive"),
        sum(abs(col("cents") - col("__prev"))).cast(d38).as("sae_naive"))
    model.join(naive, Seq(keyCol))
      .select(col(keyCol),
        col("n_model").cast("long").as("n_model"),
        col("sae_model").cast("long").as("sae_model"),
        col("n_naive").cast("long").as("n_naive"),
        col("sae_naive").cast("long").as("sae_naive"),
        expr("""CASE WHEN sae_naive > 0 THEN
                  CAST((CAST(1000000 AS DECIMAL(38,0)) * sae_model * n_naive)
                         div (sae_naive * n_model) AS BIGINT)
                END""").as("mase_permicro"))
  }

  /** Gated instance: MASE of the lag-7 seasonal-naive per event type. */
  def maseEvents(spark: SparkSession, dir: String): DataFrame =
    maseSeasonalNaive(Tables.events(spark, dir), "event_type", "ts",
      "value", season = 7)

  /** Theil's U2 — the SQUARED-error sibling of [[maseSeasonalNaive]]
    * (MASE grades absolute error; U2 grades RMSE, punishing the big
    * misses a squared loss cares about): U2 = √(MSE_model/MSE_naive),
    * < 1 beats the naive walk. Error sums of squares are exact
    * DECIMAL(38,0) (cents² outgrows BIGINT at calendar length ×
    * 10¹⁶-cent days); the final ratio is ONE fixed IEEE scalar
    * expression over those integers rounded once to micros — the
    * [[graft.operators.PartialCorr]] discipline, NULL when the naive
    * denominator is zero. */
  def theilU2(df: DataFrame, keyCol: String, tsCol: String,
              valueCol: String, season: Int): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("cents"))
      .localCheckpoint() // model join AND naive lag
    val hist = daily.select(col(keyCol).as("__hk"), col("day").as("__hday"),
      col("cents").as("__hcents"))
    val model = daily.join(hist,
        daily(keyCol) === col("__hk") &&
          daily("day") === date_add(col("__hday"), season))
      .groupBy(daily(keyCol))
      .agg(count(lit(1)).cast(d38).as("n_model"),
        sum(expr("""CAST(cents - __hcents AS DECIMAL(38,0))
                    * CAST(cents - __hcents AS DECIMAL(38,0))"""))
          .cast(d38).as("sse_model"))
    val wLag = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val naive = daily
      .withColumn("__prev", lag(col("cents"), 1).over(wLag))
      .filter(col("__prev").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast(d38).as("n_naive"),
        sum(expr("""CAST(cents - __prev AS DECIMAL(38,0))
                    * CAST(cents - __prev AS DECIMAL(38,0))"""))
          .cast(d38).as("sse_naive"))
    model.join(naive, Seq(keyCol))
      .select(col(keyCol),
        col("n_model").cast("long").as("n_model"),
        col("sse_model").cast("string").as("sse_model"),
        col("n_naive").cast("long").as("n_naive"),
        col("sse_naive").cast("string").as("sse_naive"),
        when(col("sse_naive") > 0, round(
          sqrt((col("sse_model").cast("double") * col("n_naive").cast("double"))
            / (col("sse_naive").cast("double") * col("n_model").cast("double")))
            * lit(1e6)).cast("long")).as("theil_u2_micros"))
  }

  /** Gated instance: Theil's U2 of the lag-7 seasonal-naive per
    * event type (same eval frame as `mase_eval`). */
  def theilU2Events(spark: SparkSession, dir: String): DataFrame =
    theilU2(Tables.events(spark, dir), "event_type", "ts", "value",
      season = 7)

  def maseOracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2
      |), model AS (
      |  SELECT e.event_type,
      |    CAST(count(*) AS HUGEINT) AS n_model,
      |    CAST(sum(abs(e.cents - h.cents)) AS HUGEINT) AS sae_model
      |  FROM daily e JOIN daily h
      |    ON e.event_type = h.event_type AND e.day = h.day + 7
      |  GROUP BY 1
      |), naive AS (
      |  SELECT event_type,
      |    CAST(count(*) AS HUGEINT) AS n_naive,
      |    CAST(sum(abs(cents - prev)) AS HUGEINT) AS sae_naive
      |  FROM (
      |    SELECT event_type, cents,
      |      lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS prev
      |    FROM daily)
      |  WHERE prev IS NOT NULL
      |  GROUP BY 1
      |)
      |SELECT m.event_type,
      |  CAST(n_model AS BIGINT) AS n_model,
      |  CAST(sae_model AS BIGINT) AS sae_model,
      |  CAST(n_naive AS BIGINT) AS n_naive,
      |  CAST(sae_naive AS BIGINT) AS sae_naive,
      |  CASE WHEN sae_naive > 0 THEN
      |    CAST((1000000 * sae_model * n_naive)
      |           // (sae_naive * n_model) AS BIGINT)
      |  END AS mase_permicro
      |FROM model m JOIN naive n ON m.event_type = n.event_type""".stripMargin

  def theilU2OracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2
      |), model AS (
      |  SELECT e.event_type,
      |    CAST(count(*) AS HUGEINT) AS n_model,
      |    CAST(sum(CAST(e.cents - h.cents AS HUGEINT)
      |             * (e.cents - h.cents)) AS HUGEINT) AS sse_model
      |  FROM daily e JOIN daily h
      |    ON e.event_type = h.event_type AND e.day = h.day + 7
      |  GROUP BY 1
      |), naive AS (
      |  SELECT event_type,
      |    CAST(count(*) AS HUGEINT) AS n_naive,
      |    CAST(sum(CAST(cents - prev AS HUGEINT) * (cents - prev))
      |      AS HUGEINT) AS sse_naive
      |  FROM (
      |    SELECT event_type, cents,
      |      lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS prev
      |    FROM daily)
      |  WHERE prev IS NOT NULL
      |  GROUP BY 1
      |)
      |SELECT m.event_type,
      |  CAST(n_model AS BIGINT) AS n_model,
      |  CAST(sse_model AS VARCHAR) AS sse_model,
      |  CAST(n_naive AS BIGINT) AS n_naive,
      |  CAST(sse_naive AS VARCHAR) AS sse_naive,
      |  CASE WHEN sse_naive > 0 THEN
      |    CAST(round(sqrt((CAST(sse_model AS DOUBLE) * CAST(n_naive AS DOUBLE))
      |      / (CAST(sse_naive AS DOUBLE) * CAST(n_model AS DOUBLE))) * 1e6)
      |      AS BIGINT)
      |  END AS theil_u2_micros
      |FROM model m JOIN naive n ON m.event_type = n.event_type""".stripMargin
}
