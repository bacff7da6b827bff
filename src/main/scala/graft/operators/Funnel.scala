package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Strict-sequence funnel analysis: for each user, the earliest time of
  * stage k that lands strictly AFTER their stage k-1 time, plus the
  * furthest stage reached. The standard product-analytics query (did
  * view → click → purchase happen in order?) and the batch form of
  * pattern detection over the reference's event stream
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py feeds
  * exactly this kind of per-user ordered-event analysis downstream).
  *
  * Shape: one filtered min-aggregate per stage, each joined to the
  * previous stage's (user, t) frame — every shuffle is keyed on the user
  * column, so a 100 TB event table re-partitions once per stage on the
  * same key (AQE coalesces the tiny per-user aggregates); no windows
  * over the full event stream, no per-user sort. Stage frames shrink
  * monotonically (only users who reached k-1 are probed for k). */
object Funnel {

  /** Per-user stage times + furthest stage. `stages` are the ordered
    * `typeCol` values; output has `t_<stage>` per stage and `stage`
    * (0 = never entered). */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val users = events.select(col(userCol)).distinct()
    // stage 0: earliest entry event per user
    var prev = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as(s"t_${stages.head}"))
    var frames = List(prev)
    for (i <- 1 until stages.size) {
      val pt = s"t_${stages(i - 1)}"
      prev = events.filter(col(typeCol) === stages(i))
        .join(prev.select(col(userCol), col(pt)), userCol)
        .filter(col(tsCol) > col(pt))
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as(s"t_${stages(i)}"))
      frames = prev :: frames
    }
    val joined = frames.reverse.foldLeft(users)(
      (acc, f) => acc.join(f, Seq(userCol), "left"))
    // stage times are monotone-null (t_k set implies t_{k-1} set), so the
    // furthest stage is the count of non-null times
    val stageNo = stages.map(s => when(col(s"t_$s").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    joined.withColumn("stage", stageNo.cast("int"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the view → click → purchase funnel over events. */
  def funnelEvents(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(spark, dir), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))

  def oracleSql: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |s0 AS (SELECT user_id, min(ts) AS t_view FROM events
      |       WHERE event_type = 'view' GROUP BY user_id),
      |s1 AS (SELECT e.user_id, min(e.ts) AS t_click
      |       FROM events e JOIN s0 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > s0.t_view
      |       GROUP BY e.user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t_purchase
      |       FROM events e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > s1.t_click
      |       GROUP BY e.user_id)
      |SELECT u.user_id, s0.t_view, s1.t_click, s2.t_purchase,
      |  CAST(CASE WHEN s2.t_purchase IS NOT NULL THEN 3
      |            WHEN s1.t_click IS NOT NULL THEN 2
      |            WHEN s0.t_view IS NOT NULL THEN 1
      |            ELSE 0 END AS INT) AS stage
      |FROM u LEFT JOIN s0 USING (user_id)
      |       LEFT JOIN s1 USING (user_id)
      |       LEFT JOIN s2 USING (user_id)""".stripMargin
}
