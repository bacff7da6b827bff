package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series regularization: resample an event stream onto a dense
  * daily spine with zero-filled gaps — the step between the reference's
  * raw event feed (/root/reference/DataEngineering/DataBricks/
  * spark_stream.py) and anything windowed/forecasting downstream
  * ([[Forecast]], [[LagFeatures]] assume a gapless series; this
  * operator manufactures one).
  *
  * Shape: one aggregate to (key, day), one broadcast of the global
  * 2-value date bounds, one `sequence()`-explode to the spine, one
  * LEFT join back. The spine is |keys| × |days| rows — generated, not
  * shuffled from the fact — and the join key (key, day) is exactly the
  * aggregate's grouping key, so at 100 TB the heavy side is touched
  * once and everything after runs at spine cardinality. Gap rows are
  * zero-filled BIGINTs, so the output stays exact for the hash gate.
  */
object Resample {

  /** Dense (key, day) daily series over the GLOBAL [min, max] event-date
    * range: `n_events` and the exact-cents sum of `valueCol`, both 0 on
    * days where the key is silent. */
  def dailySpineFill(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String): DataFrame = {
    val day: Column = to_date(col(tsCol))
    val daily = df
      .groupBy(col(keyCol).as("key"), day.as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col(valueCol) * 100).cast("long")).as("cents"))
    val bounds = df.agg(min(day).as("__lo"), max(day).as("__hi"))
    val spine = df.select(col(keyCol).as("key")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("key"),
        explode(sequence(col("__lo"), col("__hi"), expr("interval 1 day")))
          .as("day"))
    spine.join(daily, Seq("key", "day"), "left")
      .select(col("key"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("cents"), lit(0L)).as("cents"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-event-type daily counts and value cents with
    * silent days zero-filled. */
  def resampleDailyEvents(spark: SparkSession, dir: String): DataFrame =
    dailySpineFill(Tables.events(spark, dir), "event_type", "ts", "value")
      .withColumnRenamed("key", "event_type")

  def oracleSql: String =
    """WITH b AS (
      |  SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
      |  FROM events
      |), k AS (SELECT DISTINCT event_type FROM events),
      |spine AS (
      |  SELECT event_type,
      |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM k CROSS JOIN b
      |), d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT s.event_type, s.day,
      |  coalesce(d.n, 0) AS n_events, coalesce(d.cents, 0) AS cents
      |FROM spine s LEFT JOIN d USING (event_type, day)""".stripMargin
}
