package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation — the streaming twin of the
  * batch `evt_window_agg` operator (same groupBy(window(...)) plan,
  * sourced from a stream instead of parquet; reference anchor:
  * /root/reference/DataEngineering/DataBricks/spark_stream.py's bronze
  * feed, aggregated downstream).
  *
  * The watermark bounds state: windows older than (max event time −
  * watermark) are finalized and evicted, so state size is
  * O(active windows × keys), independent of stream length — the property
  * that lets this run forever on a 100 TB/day feed. Append mode emits
  * each window exactly once, when the watermark closes it.
  */
object WindowedAgg {

  /** Per-(window, key) count/sum with event-time watermarking.
    * Works on streaming and batch frames alike (same logical plan). */
  def hourlyAgg(events: DataFrame, tsCol: String, keyCol: String,
                valueCol: String, windowLen: String = "1 hour",
                watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("n_events"), col("total_value"))
}
