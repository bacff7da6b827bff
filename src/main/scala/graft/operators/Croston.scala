package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Croston's method for INTERMITTENT demand — the forecasting family's
  * answer to series that are mostly zeros (spare parts, long-tail
  * SKUs): seasonal-naive/Holt-Winters average the zeros away to a
  * meaningless level, Croston instead smooths the nonzero DEMAND SIZES
  * and the ARRIVAL INTERVALS separately and forecasts their ratio —
  * demand per period = level(size) / level(interval). The missing
  * member of the [[Forecast]]/[[HoltWinters]]/[[Theta]] baseline set
  * the reference's statsforecast tuning draws from
  * (/root/reference/MachineLearning/Kubernetes/src/stats_forecast_tune.py —
  * CrostonClassic sits in the same statsforecast catalog).
  *
  * Exactness: SES with α = 1/2 is a dyadic rational — over the last
  * n ≤ 17 demand events, s_n = S / 2ⁿ⁻¹ with
  * S = x₁ + Σ_{i≥2} x_i·2^{i−2} an exact integer (weights are long
  * powers of two, i ≤ 17). Both the size level S_d and the interval
  * level S_p carry the SAME 2ⁿ⁻¹ denominator, so the Croston forecast
  * ratio needs NO dyadic division at all:
  * (10⁶·S_d) div S_p. The window cap (last 17 events) is the declared
  * contract — α = 1/2 forgets beyond ~17 points below one micro
  * anyway (2⁻¹⁶ < 10⁻⁴ of the oldest term), so the cap changes
  * nothing a permicro readout can see while keeping the scaled sums
  * inside DECIMAL(38,0) at any demand magnitude.
  *
  * Scale: one fact rollup to the (key, day) spine; demand events and
  * lag intervals are per-key windows over the calendar-bounded spine;
  * the weighted sums aggregate ≤ 17 rows per key.
  */
object Croston {

  private val MaxPoints = 17

  /** Per-key Croston state from the LAST `MaxPoints` demand events:
    * (key, n_points, s_demand, s_interval, demand_level_micro,
    * croston_micro — both digit strings). Keys with < 2 demand events
    * are dropped (no interval exists). */
  def croston(df: DataFrame, keyCol: String, tsCol: String,
              valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("cents"))
      .filter(col("cents") > 0)
    val wKey = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val wDesc = Window.partitionBy(col(keyCol)).orderBy(col("day").desc)
    val events = daily
      .withColumn("__prev", lag(col("day"), 1).over(wKey))
      .withColumn("interval", datediff(col("day"), col("__prev")))
      .filter(col("interval").isNotNull) // first event has no interval
      .withColumn("__recency", row_number().over(wDesc))
      .filter(col("__recency") <= MaxPoints)
    // renumber ascending inside the kept tail: i = n − recency + 1;
    // weight w_i = 1 for i = 1 else 2^(i−2) (exact longs, i ≤ 17)
    val wN = Window.partitionBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events
      .withColumn("__n", count(lit(1)).over(wN))
      .withColumn("__i", col("__n") - col("__recency") + 1)
      .withColumn("__w", expr(
        "CASE WHEN __i = 1 THEN 1L ELSE shiftleft(1L, CAST(__i - 2 AS INT)) END"))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_points"),
        sum(expr("CAST(__w AS DECIMAL(38,0)) * cents")).cast(d38).as("s_demand"),
        sum(expr("CAST(__w AS DECIMAL(38,0)) * interval")).cast(d38)
          .as("s_interval"))
      .select(col(keyCol), col("n_points"),
        col("s_demand").cast("string").as("s_demand"),
        col("s_interval").cast("string").as("s_interval"),
        // level = S_d / 2^(n−1), reported permicro (staged: quotient
        // ≤ 10⁶·max cents — BIGINT-safe only via the % decomposition)
        expr("""CAST(CAST(1000000 AS DECIMAL(38,0))
                  * (s_demand div shiftleft(1L, CAST(n_points - 1 AS INT)))
                + (CAST(1000000 AS DECIMAL(38,0))
                   * (s_demand % shiftleft(1L, CAST(n_points - 1 AS INT))))
                  div shiftleft(1L, CAST(n_points - 1 AS INT))
                AS DECIMAL(38,0))""").cast("string")
          .as("demand_level_micro"),
        // forecast = size level / interval level: the 2^(n−1) scales
        // cancel exactly; staged (the direct 10⁶-scaled product and
        // its BIGINT div quotient both outgrow their types at extreme
        // cent magnitudes), digit-string report
        expr("""CAST(CAST(1000000 AS DECIMAL(38,0)) * (s_demand div s_interval)
                + (CAST(1000000 AS DECIMAL(38,0)) * (s_demand % s_interval))
                  div s_interval AS DECIMAL(38,0))""").cast("string")
          .as("croston_micro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-user purchase-value demand (users buy on
    * scattered days — genuinely intermittent), keys capped to the
    * first 200 user ids so the gate output stays reviewable. */
  def crostonEvents(spark: SparkSession, dir: String): DataFrame =
    croston(
      Tables.events(spark, dir)
        .filter(col("event_type") === "purchase" && col("user_id") < 200),
      "user_id", "ts", "value")

  def oracleSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events
       |  WHERE event_type = 'purchase' AND user_id < 200
       |  GROUP BY 1, 2
       |  HAVING sum(CAST(round(value * 100) AS BIGINT)) > 0
       |), ev AS (
       |  SELECT user_id, cents,
       |    day - lag(day) OVER (PARTITION BY user_id ORDER BY day)
       |      AS interval,
       |    row_number() OVER (PARTITION BY user_id ORDER BY day DESC)
       |      AS recency
       |  FROM daily
       |), tail_ev AS (
       |  SELECT *, count(*) OVER (PARTITION BY user_id) AS n
       |  FROM ev WHERE interval IS NOT NULL AND recency <= $MaxPoints
       |), weighted AS (
       |  SELECT user_id, n, cents, interval,
       |    CASE WHEN n - recency + 1 = 1 THEN CAST(1 AS HUGEINT)
       |         ELSE CAST(1 AS HUGEINT) << (n - recency - 1) END AS w
       |  FROM tail_ev
       |), agg AS (
       |  SELECT user_id, CAST(max(n) AS BIGINT) AS n_points,
       |    CAST(sum(w * cents) AS HUGEINT) AS s_demand,
       |    CAST(sum(w * interval) AS HUGEINT) AS s_interval
       |  FROM weighted GROUP BY user_id
       |)
       |SELECT user_id, n_points,
       |  CAST(s_demand AS VARCHAR) AS s_demand,
       |  CAST(s_interval AS VARCHAR) AS s_interval,
       |  CAST(CAST(1000000 AS HUGEINT)
       |         * (s_demand // (CAST(1 AS HUGEINT) << (n_points - 1)))
       |       + (CAST(1000000 AS HUGEINT)
       |          * (s_demand % (CAST(1 AS HUGEINT) << (n_points - 1))))
       |         // (CAST(1 AS HUGEINT) << (n_points - 1)) AS VARCHAR)
       |    AS demand_level_micro,
       |  CAST(CAST(1000000 AS HUGEINT) * (s_demand // s_interval)
       |       + (CAST(1000000 AS HUGEINT) * (s_demand % s_interval))
       |         // s_interval AS VARCHAR) AS croston_micro
       |FROM agg""".stripMargin
}
