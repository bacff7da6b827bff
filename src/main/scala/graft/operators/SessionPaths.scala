package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral path mining: the distribution of each actor's first-k
  * event-type sequence — the "top user journeys" table behind funnel
  * and Sankey views, and the categorical summary the Markov-transition
  * matrix ([[BehaviorStats.markovEvents]]) marginalizes away (paths keep
  * ORDER ACROSS STEPS; transitions only keep adjacent hops). Same event
  * feed as the reference's streaming ingestion
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py).
  *
  * Determinism discipline: step order is the TOTAL order (ts, event_id)
  * — the unique id breaks timestamp ties, so every engine sees the same
  * first k events. The path string is assembled from an array sorted BY
  * STEP NUMBER (never collect order), and counts are exact.
  *
  * Scale: one shuffle keyed on the actor (per-actor windows, millions
  * of small partitions — the healthy window shape), then one map-side-
  * combined count keyed on the path string. Output cardinality is
  * ≤ |event types|^k, independent of data size.
  */
object SessionPaths {

  /** (path, n_actors, n_full) for each distinct first-`k` event-type
    * path, where `path` joins the types with '>', `n_actors` counts
    * actors following it, and `n_full` counts those with ≥ k events
    * (actors with fewer produce a shorter path string). */
  def firstKPaths(df: DataFrame, actorCol: String, tsCol: String,
                  idCol: String, typeCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(actorCol))
      .orderBy(col(tsCol), col(idCol))
    val steps = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    val perActor = steps
      .groupBy(col(actorCol))
      .agg(count(lit(1)).as("__n_steps"),
        concat_ws(">",
          transform(array_sort(collect_list(struct(col("__rn").as("rn"),
            col(typeCol).as("t")))), s => s.getField("t"))).as("path"))
    perActor.groupBy("path")
      .agg(count(lit(1)).as("n_actors"),
        sum(when(col("__n_steps") === k, 1L).otherwise(0L)).as("n_full"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: first-3 event-type paths per user. */
  def sessionPathsEvents(spark: SparkSession, dir: String): DataFrame =
    firstKPaths(Tables.events(spark, dir), "user_id", "ts", "event_id",
      "event_type", k = 3)

  def oracleSql: String =
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events
      |), p AS (
      |  SELECT user_id, count(*) AS n_steps,
      |    string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM r WHERE rn <= 3 GROUP BY user_id
      |)
      |SELECT path, count(*) AS n_actors,
      |  CAST(sum(CASE WHEN n_steps = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_full
      |FROM p GROUP BY path""".stripMargin
}
