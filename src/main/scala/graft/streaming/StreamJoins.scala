package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming joins — the two shapes a streaming bronze feed needs the
  * moment it must be enriched or correlated (reference anchor:
  * /root/reference/DataEngineering/DataBricks/spark_stream.py ingests the
  * raw feed; the downstream Databricks ETL joins it to dims and to other
  * feeds):
  *
  *   - stream ⋈ static dim: every micro-batch joins against the dim
  *     snapshot; the dim is broadcast so the stream side never shuffles —
  *     stateless, no watermark needed.
  *   - stream ⋈ stream within a time bound: both sides buffered in state;
  *     the watermarks plus the event-time range condition let Spark evict
  *     a buffered row once no future match can arrive, so state is
  *     O(rows within the join window), independent of stream length —
  *     the property that keeps a 100 TB/day correlation join alive.
  */
object StreamJoins {

  /** Enrich a stream with a static dimension (broadcast hash join per
    * micro-batch — stateless). Dim columns are prefixed to avoid
    * collisions with stream columns. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    streamKey: String, dimKey: String,
                    dimPrefix: String = "dim_"): DataFrame = {
    val prefixed = dim.columns.foldLeft(dim) { (d, c) =>
      if (c == dimKey) d else d.withColumnRenamed(c, s"$dimPrefix$c")
    }
    stream.join(broadcast(prefixed),
      stream(streamKey) === prefixed(dimKey), "left")
      .drop(prefixed(dimKey))
  }

  /** Event-time-bounded stream-stream inner join: a right-side event
    * matches a left-side event with the same key when it lands within
    * `[left.ts, left.ts + within]`. Both sides carry `watermark` so
    * buffered state is evicted once the bound passes — without BOTH
    * watermarks and the range condition, stream-stream state grows
    * without bound. */
  def joinWithin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 leftTs: String, rightTs: String,
                 watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"))
  }

  /** Event-time-bounded stream-stream LEFT OUTER join: same range
    * condition as [[joinWithin]], but a left event with no in-window
    * match is still emitted (right side null-padded) — ONCE the
    * watermark passes its match horizon, since only then can Spark prove
    * no match is coming. The unmatched-row latency is therefore the
    * watermark delay plus the window, and state stays O(in-horizon
    * rows): this is the "did a confirmation arrive within N minutes, and
    * if not emit the timeout row" correlation shape. */
  def leftJoinWithin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTs: String, rightTs: String,
                     watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"),
      "left_outer")
  }
}
