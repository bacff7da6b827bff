package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-bucketed keep-first throttling: collapse bursts of identical
  * activity to one representative row per (keys, bucket) — the
  * rate-limit / notification-dedup primitive, and the event-stream
  * sibling of [[graft.dedup.ExactDedup]] (same keep-one discipline,
  * keyed in TIME rather than by content hash; the reference's stream
  * bronze feed, /root/reference/DataEngineering/DataBricks/
  * spark_stream.py, is where such bursts arrive from).
  *
  * One shuffle on (keys, bucket), one ordered window pass — rank 1
  * survives, and the survivor carries how many rows it suppressed so
  * downstream aggregates can re-weight. The tie order (ts, then id)
  * is total, so the survivor is deterministic cross-engine.
  */
object Throttle {

  /** First row per (`keyCols`, `bucket(tsCol)`) by (ts, idCol), with
    * `n_suppressed` = how many later rows in the bucket it absorbed. */
  def keepFirst(df: DataFrame, keyCols: Seq[String], tsCol: String,
                idCol: String, bucket: Column => Column): DataFrame = {
    val parts = keyCols.map(col) :+ bucket(col(tsCol)).as("__bucket")
    val w = Window.partitionBy(parts: _*)
      .orderBy(col(tsCol).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("n_suppressed", count(lit(1)).over(
        Window.partitionBy(parts: _*)) - lit(1))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: one event per (user, type, hour); the survivor
    * reports the burst size it suppressed. */
  def eventThrottle(spark: SparkSession, dir: String): DataFrame =
    keepFirst(Tables.events(spark, dir), Seq("user_id", "event_type"),
      "ts", "event_id", date_trunc("hour", _))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("n_suppressed"))

  def oracleSql: String =
    """WITH b AS (
      |  SELECT event_id, user_id, event_type, ts,
      |    count(*) OVER (PARTITION BY user_id, event_type,
      |                   date_trunc('hour', ts)) - 1 AS n_suppressed,
      |    row_number() OVER (PARTITION BY user_id, event_type,
      |                       date_trunc('hour', ts)
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events
      |)
      |SELECT event_id, user_id, event_type, ts,
      |  CAST(n_suppressed AS BIGINT) AS n_suppressed
      |FROM b WHERE rn = 1""".stripMargin
}
