package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-time operators: gap sessionization + tumbling-window aggregation —
  * the batch twins of the reference's streaming ETL
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py).
  *
  * Scale: both are one shuffle (on user / on window bucket). Session
  * assembly uses the classic flag-then-prefix-sum trick — two window
  * passes over one Exchange, no self-join, no state blowup.
  */
object Sessionize {

  /** Sessions split where the gap to the previous event exceeds
    * `gapSeconds`. Returns one row per session with start/end/size/value. */
  def sessions(df: DataFrame, userCol: String, tsCol: String,
               gapSeconds: Long, tieBreak: Seq[String] = Seq("event_id")): DataFrame = {
    val wOrd = Window.partitionBy(userCol)
      .orderBy((col(tsCol) +: tieBreak.map(col)): _*)
    df.withColumn("__prev", lag(col(tsCol), 1).over(wOrd))
      .withColumn("__newSession",
        when(col("__prev").isNull ||
             unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum("__newSession").over(wOrd))
      .drop("__prev", "__newSession")
  }

  /** Query-map entry: 30-minute-gap sessions over events. */
  def eventsSessions(spark: SparkSession, dir: String): DataFrame =
    sessions(Tables.events(spark, dir), "user_id", "ts", 1800L)
      .groupBy("user_id", "session_seq")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"))

  def sessionsOracleSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM flagged
      |)
      |SELECT user_id, session_seq,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events, round(sum(value), 2) AS session_value
      |FROM numbered GROUP BY user_id, session_seq""".stripMargin

  /** Query-map entry: tumbling 1-hour aggregation keyed on the bucket
    * start — identical semantics to the streaming `window()` agg tested in
    * streaming specs, expressed batch-side for the oracle. */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"),
        countDistinct("user_id").as("n_users"))

  def hourlyAggOracleSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n_events, round(sum(value), 2) AS total_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2""".stripMargin
}
