package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Rolling time-range features: for every event, aggregates over the
  * trailing time window of the same key's history — the feature-
  * engineering staple behind the reference's event-stream ETL
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py feeds
  * downstream aggregation; count_target_onehot_encoder_spark.py builds
  * the per-key features this generalizes to the time axis).
  *
  * Implementation is a RANGE window over epoch-microseconds — a frame
  * bounded by TIME, not row count, so bursty keys and sparse keys get the
  * same "last 24 h" semantics. The monetary aggregate accumulates integer
  * cents: windowed double sums would flap low bits with partial-agg
  * order, integer sums are exact and engine-portable.
  *
  * Scale stance: partitioned by key — each task sees one key's history,
  * never the global stream. A pathologically hot key funnels its whole
  * history through one task (inherent to exact per-key rolling windows);
  * the mitigation at 100 TB is the [[SaltedCumSum]] two-phase shape per
  * time-bucket, traded here for the exact windowed form the oracle can
  * check.
  */
object RollingFeatures {

  /** Append `cnt_<name>` and `cents_<name>` columns: count of the key's
    * rows and exact integer-cent sum of `valueCol` within the trailing
    * `windowMicros` (inclusive of the current row's instant). */
  def rollingWindow(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, windowMicros: Long,
                    name: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowMicros, 0)
    df.withColumn(s"cnt_$name", count(lit(1)).over(w))
      .withColumn(s"cents_$name",
        sum(round(col(valueCol) * 100, 0).cast("long")).over(w))
  }

  // ---- query-map entry (hash-gated) ----

  /** Per-user trailing-24h event count and value-cents sum, per event. */
  def rollingUserFeatures(spark: SparkSession, dir: String): DataFrame =
    rollingWindow(
      Tables.events(spark, dir).select("event_id", "user_id", "ts", "value"),
      "user_id", "ts", "value", windowMicros = 86400000000L, name = "24h")
      .select("event_id", "user_id", "cnt_24h", "cents_24h")

  def oracleSql: String =
    """SELECT event_id, user_id,
      |  CAST(count(*) OVER w AS BIGINT) AS cnt_24h,
      |  CAST(sum(CAST(round(value*100, 0) AS BIGINT)) OVER w AS BIGINT) AS cents_24h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)""".stripMargin
}
