package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Supervised window-tensor prep for the neural forecasters — the data
  * contract of the reference's tune/predict loop ((unique_id, ds, y)
  * long frames sliced into (input[L], horizon[h]) training windows:
  * /root/reference/MachineLearning/Kubernetes/src/
  * neural_forecast_tune.py:392-407 `input_size` grid × `horizon` 90
  * over per-unique_id series, and ffnn_hf_stream.py's window batches):
  * every valid start t of a key's dense daily series yields one
  * supervised frame — input days t..t+L−1, target days t+L..t+L+h−1 —
  * plus the per-window normalization constants the model applies
  * (exact integer sum + day counts; the trainer divides, the data
  * layer must not lose precision to a float mean).
  *
  * Leakage discipline: the target range starts STRICTLY after the
  * input range ends (spec-pinned date arithmetic) — every input index
  * < every target index, the invariant a backtest dies without.
  *
  * Shape: one pass over the [[Resample.dailySpineFill]] spine with
  * per-key ORDER BY day window frames (sliding sums via ROWS BETWEEN,
  * boundaries via lead) — map-side after the spine's (key, day)
  * shuffle, no self-join, no explode; output is windows-per-key =
  * T − L − h + 1 rows, each O(1) wide. Per-key state is bounded by
  * the calendar length T, the same envelope every forecast operator
  * here rides.
  */
object NeuralWindows {

  /** Window frames over a dense (key, day, n_events, cents) spine:
    * (key, window_id, input_start_day, input_end_day,
    * target_start_day, target_end_day, input_sum_cents,
    * input_obs_days, target_sum_cents) — window_id is the 1-based
    * start index in the key's day order. */
  def frames(dense: DataFrame, keyCol: String, dayCol: String,
             centsCol: String, obsCol: String, inputLen: Int,
             horizon: Int): DataFrame = {
    require(inputLen >= 1 && horizon >= 1)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val inFrame = w.rowsBetween(Window.currentRow, inputLen - 1)
    val tgtFrame = w.rowsBetween(inputLen, inputLen + horizon - 1)
    dense
      .withColumn("window_id", row_number().over(w).cast("long"))
      .withColumn("input_end_day", lead(col(dayCol), inputLen - 1).over(w))
      .withColumn("target_start_day", lead(col(dayCol), inputLen).over(w))
      .withColumn("target_end_day",
        lead(col(dayCol), inputLen + horizon - 1).over(w))
      .withColumn("input_sum_cents", sum(col(centsCol)).over(inFrame))
      .withColumn("input_obs_days",
        sum(when(col(obsCol) > 0, 1L).otherwise(0L)).over(inFrame))
      .withColumn("target_sum_cents",
        coalesce(sum(col(centsCol)).over(tgtFrame), lit(0L)))
      // a window exists only when its full horizon is on the calendar
      .filter(col("target_end_day").isNotNull)
      .select(col(keyCol), col("window_id"),
        col(dayCol).as("input_start_day"), col("input_end_day"),
        col("target_start_day"), col("target_end_day"),
        col("input_sum_cents"), col("input_obs_days"),
        col("target_sum_cents"))
  }

  // ---- query-map entry (hash-gated) ----

  val InputLen = 14
  val Horizon = 7

  def neuralWindowsEvents(spark: SparkSession, dir: String): DataFrame =
    frames(
      Resample.dailySpineFill(Tables.events(spark, dir), "user_id", "ts",
          "value")
        .select(col("key").as("user_id"), col("day"), col("n_events"),
          col("cents")),
      "user_id", "day", "cents", "n_events", InputLen, Horizon)

  def oracleSql: String =
    s"""WITH b AS (
       |  SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
       |  FROM events
       |), k AS (SELECT DISTINCT user_id FROM events),
       |spine AS (
       |  SELECT user_id,
       |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM k CROSS JOIN b
       |), d AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2
       |), dense AS (
       |  SELECT s.user_id, s.day, coalesce(d.n, 0) AS n_events,
       |    coalesce(d.cents, 0) AS cents
       |  FROM spine s LEFT JOIN d USING (user_id, day)
       |), wf AS (
       |  SELECT user_id,
       |    CAST(row_number() OVER w AS BIGINT) AS window_id,
       |    day AS input_start_day,
       |    lead(day, ${InputLen - 1}) OVER w AS input_end_day,
       |    lead(day, $InputLen) OVER w AS target_start_day,
       |    lead(day, ${InputLen + Horizon - 1}) OVER w AS target_end_day,
       |    CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND ${InputLen - 1} FOLLOWING)
       |      AS BIGINT) AS input_sum_cents,
       |    CAST(sum(CASE WHEN n_events > 0 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND ${InputLen - 1} FOLLOWING)
       |      AS BIGINT) AS input_obs_days,
       |    CAST(coalesce(sum(cents) OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN $InputLen FOLLOWING
       |      AND ${InputLen + Horizon - 1} FOLLOWING), 0)
       |      AS BIGINT) AS target_sum_cents
       |  FROM dense
       |  WINDOW w AS (PARTITION BY user_id ORDER BY day)
       |)
       |SELECT * FROM wf WHERE target_end_day IS NOT NULL""".stripMargin
}
