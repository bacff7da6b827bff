package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact autocorrelation function (ACF) per grouped time series — the
  * diagnostic that DECIDES the forecasting family's parameters: the
  * reference tunes AutoETS/AutoARIMA/Theta over such series
  * (/root/reference/MachineLearning/Kubernetes/src/stats_forecast_tune.py:47-60),
  * and ACF-at-lag-k is the statistic those tuners read (seasonal lag
  * spikes → seasonal terms; slow decay → differencing). Sits beside
  * [[HoltWinters]]/[[Theta]]/[[AutoForecast]] as the model-SELECTION
  * side of the time-series toolkit.
  *
  * Exactness: with integer series values, the mean-centered ACF is a
  * ratio of integers once multiplied through by n²:
  *   num_k·n² = n²·Σxᵢx_{i+k} − n·S·(H_k+T_k) + (n−k)·S²
  *   den·n²   = n²·Σxᵢ²       − n·S²
  * where S = Σx, H_k/T_k the head/tail partial sums the lag pairing
  * leaves out. Both sides accumulate in DECIMAL(38,0) (oracle: HUGEINT)
  * and the reported acf_permicro is sign·((10⁶·|num|) div den) —
  * truncation toward zero, identical in both engines, no float ever.
  * Headroom: terms peak near n·S·Σx ≈ n·S² — at 10⁹-cent daily sums
  * and 10⁴-point series that is ~10²², 16 orders inside DECIMAL(38).
  *
  * Scale shape: one fact aggregation to (group, series-index) cells
  * (calendar-bounded cardinality), one window pass per lag set over
  * those cells (lead(k) within the group partition), one aggregate per
  * group — nothing after the daily rollup is fact-sized. Lags expand
  * as an inline literal array (≤ maxLag rows per cell), bounded.
  */
object Autocorr {

  /** ACF at lags 1..maxLag for each group's series, where the series is
    * `valueCol` ordered by `idxCol` (a gapless per-group index). Output:
    * (group, lag, n, num_scaled, den_scaled, acf_permicro) with
    * num/den the n²-scaled DECIMAL(38,0) integers above. Series with
    * zero variance emit NULL acf_permicro. */
  def acf(cells: DataFrame, groupCol: String, idxCol: String,
          valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val g = col(groupCol)
    val w = Window.partitionBy(g).orderBy(col(idxCol))
    // per-row: value and each lag partner (lead k), then explode lags
    val lagCols = (1 to maxLag).map(k =>
      struct(lit(k).as("lag"),
        lead(col(valueCol), k).over(w).as("partner")))
    val exploded = cells
      .withColumn("__x", col(valueCol).cast("decimal(38,0)"))
      .withColumn("__pairs", array(lagCols: _*))
      .select(g, col("__x"), explode(col("__pairs")).as("__p"))
      .select(g, col("__x"),
        col("__p.lag").as("lag"),
        col("__p.partner").cast("decimal(38,0)").as("__y"))
    // per (group, lag): the lag-restricted sums; per group: n, S, Q via
    // the lag=1 slice (every row has a lag-1 entry, partner may be null)
    val perLag = exploded.groupBy(g, col("lag"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("nd"),
        sum("__x").cast("decimal(38,0)").as("sd"),
        sum(col("__x") * col("__x")).cast("decimal(38,0)").as("qd"),
        sum(when(col("__y").isNotNull, col("__x") * col("__y"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("pk"),
        sum(when(col("__y").isNotNull, col("__x"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("hk"),
        sum(when(col("__y").isNotNull, col("__y"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("tk"))
    perLag
      .withColumn("num",
        col("nd") * col("nd") * col("pk")
          - col("nd") * col("sd") * (col("hk") + col("tk"))
          + (col("nd") - col("lag")) * col("sd") * col("sd"))
      .withColumn("den",
        col("nd") * col("nd") * col("qd") - col("nd") * col("sd") * col("sd"))
      .select(g, col("lag"),
        col("nd").cast("long").as("n"),
        // n²-scaled integers report as VARCHAR: DECIMAL(38,0) is the
        // internal accumulator; the gate's value-hash canonicalizes
        // decimals engine-specifically, so the digit string is the
        // bit-exact cross-engine contract.
        col("num").cast("string").as("num_scaled"),
        col("den").cast("string").as("den_scaled"),
        // sign split keeps both engines on non-negative truncating
        // division (Spark `div` ≡ DuckDB `//` only then)
        expr("""CASE WHEN den > 0 THEN
                  (CASE WHEN num < 0 THEN -1L ELSE 1L END)
                    * ((1000000 * abs(num)) div den)
                END""").as("acf_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: ACF at lags 1..7 of each event type's daily
    * revenue-cents series (days indexed gaplessly per type in date
    * order — the [[Resample]] discipline). */
  def acfEvents(spark: SparkSession, dir: String): DataFrame = {
    val wIdx = Window.partitionBy("event_type").orderBy("day")
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("idx", row_number().over(wIdx))
    acf(daily, "event_type", "idx", "cents", maxLag = 7)
  }

  def oracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1, 2
      |), cells AS (
      |  SELECT event_type, cents,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS idx
      |  FROM daily
      |), lagged AS (
      |  SELECT c.event_type, l.lag,
      |    CAST(c.cents AS HUGEINT) AS x,
      |    CAST(p.cents AS HUGEINT) AS y
      |  FROM cells c
      |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
      |  LEFT JOIN cells p
      |    ON p.event_type = c.event_type AND p.idx = c.idx + l.lag
      |), per AS (
      |  SELECT event_type, lag,
      |    CAST(count(*) AS HUGEINT) AS nd,
      |    sum(x) AS sd, sum(x * x) AS qd,
      |    sum(CASE WHEN y IS NOT NULL THEN x * y ELSE 0 END) AS pk,
      |    sum(CASE WHEN y IS NOT NULL THEN x ELSE 0 END) AS hk,
      |    sum(CASE WHEN y IS NOT NULL THEN y ELSE 0 END) AS tk
      |  FROM lagged GROUP BY 1, 2
      |), nd2 AS (
      |  SELECT event_type, lag, nd,
      |    nd * nd * pk - nd * sd * (hk + tk) + (nd - lag) * sd * sd AS num,
      |    nd * nd * qd - nd * sd * sd AS den
      |  FROM per
      |)
      |SELECT event_type, CAST(lag AS INT) AS lag, CAST(nd AS BIGINT) AS n,
      |  CAST(num AS VARCHAR) AS num_scaled,
      |  CAST(den AS VARCHAR) AS den_scaled,
      |  CASE WHEN den > 0 THEN CAST(
      |    (CASE WHEN num < 0 THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(num)) // den) AS BIGINT) END AS acf_permicro
      |FROM nd2""".stripMargin
}
