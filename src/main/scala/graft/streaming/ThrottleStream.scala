package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming keep-first throttle — the stateful twin of the batch
  * [[graft.operators.Throttle]]: emit the FIRST event per (key, time
  * bucket), drop the burst behind it, at the source
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py is where
  * such bursts arrive; throttling them in-stream keeps the bronze feed
  * from amplifying downstream merges).
  *
  * Semantics: an event passes iff its bucket is not yet in the key's
  * state — so across micro-batches a bucket admits exactly one event
  * (the first to ARRIVE; the batch operator's (ts, id) tie-break needs
  * the full bucket, which a low-latency stream by design does not
  * wait for — callers needing arrival-order independence run the batch
  * form on the landed data).
  *
  * State per key is the set of open bucket ids, pruned two ways: on
  * every update, buckets the WATERMARK has fully passed are dropped —
  * safe because the watermark filter already discards any later event
  * that could land in them, so a pruned bucket can never re-admit
  * (pruning on a newest−keepBuckets horizon instead would duplicate
  * whenever the watermark delay exceeds keepBuckets·bucketMs); and an
  * event-time timeout removes a key's state entirely once the watermark
  * passes its newest bucket + `keepBuckets`. State per key is therefore
  * O(watermark delay / bucketMs + keepBuckets), never the event backlog.
  */
object ThrottleStream {

  case class Evt(user_id: Long, event_type: String, ts: Timestamp,
                 event_id: Long, value: Double)
  case class Seen(newestBucket: Long, buckets: Set[Long])

  /** Emit first-arrival per ((user, type), bucket); bucket = ts DIV
    * `bucketMs`. `keepBuckets` is the dedup horizon in buckets. */
  def updateState(bucketMs: Long, keepBuckets: Int)(
      key: (Long, String), events: Iterator[Evt],
      state: GroupState[Seen]): Iterator[Evt] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var seen = state.getOption.getOrElse(Seen(Long.MinValue, Set.empty))
      val out = Seq.newBuilder[Evt]
      events.foreach { e =>
        val b = e.ts.getTime / bucketMs
        if (!seen.buckets.contains(b)) {
          out += e
          seen = Seen(math.max(seen.newestBucket, b), seen.buckets + b)
        }
      }
      // Prune ONCE, after the whole batch: a bucket is prunable only
      // when the eviction watermark passed its end, because the NEXT
      // batch's late filter runs at (at least) this watermark and drops
      // any event that could land in it. Pruning inside the loop would
      // drop a just-admitted bucket while later same-batch events for it
      // are still in the iterator (Spark's late filter uses the PREVIOUS
      // batch's watermark — SPARK-40925 — so such events do arrive),
      // re-admitting duplicates.
      val wm = state.getCurrentWatermarkMs()
      state.update(Seen(seen.newestBucket,
        seen.buckets.filter(bk => (bk + 1) * bucketMs > wm)))
      // state dies once the watermark passes the horizon of its newest
      // bucket — clamped above the current watermark: a batch admitting
      // only filter-surviving stragglers can have newest+keepBuckets
      // behind the eviction watermark, and an un-clamped timestamp
      // would throw and kill the query
      state.setTimeoutTimestamp(
        math.max((seen.newestBucket + keepBuckets) * bucketMs, wm + bucketMs))
      out.result().iterator
    }
  }

  /** Wire the throttle onto an event stream (1h buckets by default). */
  def keepFirst(events: Dataset[Evt], bucketMs: Long = 3600 * 1000L,
                keepBuckets: Int = 24,
                watermark: String = "1 hour"): Dataset[Evt] = {
    implicit val ee = Encoders.product[Evt]
    implicit val se = Encoders.product[Seen]
    implicit val ke = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateState(bucketMs, keepBuckets))
  }
}
