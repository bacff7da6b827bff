package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming exact-dedup — the event-stream twin of
  * `graft.dedup.ExactDedup`: drop re-deliveries of the same key (at-least-
  * once sources re-emit on retry) while holding state only for the
  * watermark horizon.
  *
  * `dropDuplicatesWithinWatermark` keys state on the dedup columns and
  * evicts entries once the watermark passes them — state is
  * O(keys per watermark window), never O(stream history), which is what
  * makes exactly-once-per-key ingestion viable on an unbounded feed.
  * Duplicates arriving within the horizon are dropped even when their
  * event times differ (retries re-stamp); beyond the horizon a re-send is
  * indistinguishable from a new event, which is the documented contract.
  */
object DedupStream {

  /** Deduplicate a watermarked stream on `keyCols`. */
  def dedup(events: DataFrame, tsCol: String, watermark: String,
            keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Convenience: dedup an event stream on its event id. */
  def dedupByEventId(events: DataFrame, tsCol: String = "ts",
                     watermark: String = "1 hour"): DataFrame = {
    require(events.columns.contains("event_id"))
    dedup(events.select(col("*")), tsCol, watermark, Seq("event_id"))
  }
}
