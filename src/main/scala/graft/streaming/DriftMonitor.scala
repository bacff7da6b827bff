package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Drift

/** Streaming drift monitor: every micro-batch is scored against a STATIC
  * baseline sample with [[graft.operators.Drift.psi]] and the per-bin
  * report handed to a sink callback — the ML-ops loop that watches a
  * live feature feed for distribution shift (the reference's stream,
  * /root/reference/DataEngineering/DataBricks/spark_stream.py, feeding
  * the monitoring a deployed spark_randomforest.py model needs).
  *
  * Shape per batch: the baseline side of the PSI is re-aggregated each
  * batch (bins and bounds must come from the UNION of baseline and
  * batch, so bounds are batch-dependent by design); the batch side is
  * one aggregate over the micro-batch. Both run at bin cardinality
  * after one scan each — bounded work per batch regardless of stream
  * volume. State lives nowhere: each report is self-contained, so
  * replays are idempotent for any idempotent sink.
  */
object DriftMonitor {

  /** Start monitoring `stream` against `baseline` on `valueCol`; each
    * micro-batch's per-bin PSI report (with `batch_id`) goes to
    * `onReport`. */
  def start(stream: DataFrame, baseline: DataFrame, valueCol: String,
            bins: Int, checkpoint: String)
           (onReport: DataFrame => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val report = Drift.psi(baseline, batch, valueCol, bins)
            .withColumn("batch_id", lit(batchId))
          onReport(report)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
