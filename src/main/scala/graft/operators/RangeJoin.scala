package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Interval (range) join executed as a day-bucketed EQUI-join.
  *
  * A join whose only condition is `key equal AND ts BETWEEN lo AND hi`
  * is fine for Spark's planner — but the classic failure mode is the
  * PURE range join (no equi key) or a low-cardinality key: Catalyst
  * falls back to BroadcastNestedLoopJoin / shuffled cartesian and the
  * cost goes O(|L|·|R|). The standard fix (how Flink and Databricks'
  * range-join hints do it) is binning: pick a bucket width ≥ the
  * maximum interval length, EXPLODE each interval into the buckets it
  * covers (bounded fan-out: ≤ len/width + 1 ≤ 2 buckets here, 7 day
  * rows for a 7-day interval at day grain), and equi-join on
  * (key, bucket) with the exact range predicate kept as a residual
  * filter. The plan becomes a plain shuffle/broadcast hash join —
  * partitionable, AQE-skew-splittable, 100 TB-safe.
  *
  * Reference anchor: the repair-chain lookups of
  * /root/reference/MachineLearning/Ray/recsys/generate_data.py:121-145
  * (events matched to their containing time window per resource) — and
  * every "events within N days of the order" enrichment in the
  * medallion pipelines (merge_generator.py joins on date windows).
  *
  * RangeJoinSpec asserts the physical plan contains NO
  * BroadcastNestedLoopJoin/CartesianProduct, and the gate proves
  * bit-equality with DuckDB's direct range-predicate join.
  */
object RangeJoin {

  /** Join `left` rows (point `leftTs`) to `right` intervals
    * [rightStart, rightStart + days) sharing an equi key — returns the
    * matched pairs with both frames' selected columns. The interval
    * side explodes into its covered day buckets; the point side probes
    * exactly one bucket. */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTs: String, rightStart: String,
                      days: Int): DataFrame = {
    require(days >= 1, "interval length must be >= 1 day")
    // a point with ts in [start, start + days·24h) has its DATE in
    // [date(start), date(start) + days] — days+1 buckets per interval
    // (the interval spans one extra calendar date whenever `start` has a
    // time-of-day component; the residual predicate trims the overshoot)
    val r = right.withColumn("__day",
      explode(sequence(
        to_date(col(rightStart)),
        date_add(to_date(col(rightStart)), days))))
    val l = left.withColumn("__day", to_date(col(leftTs)))
    l.join(r,
      l("__day") === r("__day") &&
        l(leftKey) === r(rightKey) &&
        l(leftTs) >= r(rightStart) &&
        l(leftTs) < r(rightStart) + expr(s"INTERVAL $days DAYS"))
      .drop("__day")
  }

  // ---- query-map entry (hash-gated) ----

  /** Band self-join: each event paired with the SAME user's events in
    * the preceding 24 hours (the chained-repairs neighbour lookup,
    * generate_data.py:121-145, as a join instead of a lag window — the
    * window form only sees adjacent rows; the band join sees ALL
    * neighbours in the interval). Self-pairs excluded; the pair
    * (follower, predecessor) carries the exact second gap. */
  def rangeJoinEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val prior = ev.select(col("event_id").as("b_event_id"),
      col("user_id").as("b_user_id"), col("ts").as("b_ts"))
    pointInInterval(ev, prior, leftKey = "user_id", rightKey = "b_user_id",
      leftTs = "ts", rightStart = "b_ts", days = 1)
      .filter(col("event_id") =!= col("b_event_id"))
      .select(col("event_id"), col("b_event_id"),
        // `div` keeps the arithmetic integral (the diff is non-negative
        // under the residual predicate, so truncation == floor == `//`)
        expr("(unix_micros(ts) - unix_micros(b_ts)) div 1000000")
          .as("secs_after"))
  }

  def oracleSql: String =
    """SELECT a.event_id, b.event_id AS b_event_id,
      |  CAST((epoch_us(a.ts) - epoch_us(b.ts)) // 1000000
      |    AS BIGINT) AS secs_after
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND a.ts >= b.ts
      | AND a.ts < b.ts + INTERVAL 1 DAY
      | AND a.event_id <> b.event_id""".stripMargin
}
