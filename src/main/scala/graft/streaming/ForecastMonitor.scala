package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming forecast-error monitor — the third leg of the decoupled
  * forecasting loop (tune: `auto_forecast`/`ensemble_forecast` →
  * predict: [[graft.operators.ForecastPredict]] → MONITOR: this):
  * as live events stream in, each micro-batch's per-series daily
  * actuals are scored against the PERSISTED h-step predictions and the
  * exact integer errors handed to a sink callback. This is the
  * operational check the reference's forecast deployment implies —
  * stats_forecast_predict.py's outputs are consumed by jobs that must
  * notice when reality leaves the forecast corridor
  * (/root/reference/MachineLearning/Kubernetes/src/stats_forecast_predict.py;
  * the streaming side mirrors spark_stream.py's foreachBatch loop).
  *
  * Shape per batch: one aggregate of the micro-batch to (key, day)
  * cents, one BROADCAST join against the O(series·h) prediction frame
  * (k = datediff(day, cutoff) selects the horizon step; days outside
  * 1..h drop out of the inner join), exact BIGINT errors. No state:
  * every report is self-contained and keyed by (batch_id, key, day),
  * so replays are idempotent for any idempotent sink — the
  * [[DriftMonitor]] discipline.
  *
  * At 100 TB the only stream-volume-scaled work is the per-batch daily
  * aggregate; the prediction side is series-bounded and broadcast.
  */
object ForecastMonitor {

  /** Score a STATIC batch of events against predictions
    * (user_id, k, yhat_cents) anchored at `cutoff` (ŷ(k) forecasts day
    * cutoff+k). Exposed for tests and batch backfills. Returns
    * (user_id, day, k, actual_cents, yhat_cents, err_cents,
    * abs_err_cents). */
  def score(batch: DataFrame, predictions: DataFrame,
            cutoff: java.sql.Date, keyCol: String, tsCol: String,
            valueCol: String): DataFrame = {
    val daily = batch
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("actual_cents"))
      .withColumn("k", datediff(col("day"), lit(cutoff)))
    daily.join(broadcast(predictions.select(col(keyCol), col("k"),
        col("yhat_cents"))), Seq(keyCol, "k"))
      .withColumn("err_cents", col("actual_cents") - col("yhat_cents"))
      .withColumn("abs_err_cents", abs(col("err_cents")))
      .select(keyCol, "day", "k", "actual_cents", "yhat_cents",
        "err_cents", "abs_err_cents")
  }

  /** Start monitoring `stream` against the persisted predictions; each
    * micro-batch's error report (with `batch_id`) goes to `onReport`. */
  def start(stream: DataFrame, predictions: DataFrame,
            cutoff: java.sql.Date, keyCol: String, tsCol: String,
            valueCol: String, checkpoint: String)
           (onReport: DataFrame => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val report = score(batch, predictions, cutoff, keyCol, tsCol,
              valueCol)
            .withColumn("batch_id", lit(batchId))
          onReport(report)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
