package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Interval concurrency via sweep-line: the peak number of
  * simultaneously-active intervals per key — "max concurrent sessions",
  * the occupancy question behind capacity planning over the reference's
  * event feed (/root/reference/DataEngineering/DataBricks/
  * spark_stream.py's sessions have exactly this shape once dwell is
  * attached).
  *
  * Why sweep-line and not a range join: the naive formulation is a
  * self-range-join (every interval against every overlapping one —
  * O(n²) per key and a non-equi condition Spark can only nested-loop).
  * The sweep decomposes each interval into a +1 start and a −1 end
  * event, ONE shuffle on the key, one ordered window scan computing the
  * running occupancy, and a max — the same cost envelope as
  * sessionization, linear in events at any scale.
  *
  * Determinism: events order by (time, delta) with ends (−1) before
  * starts (+1) at equal timestamps — intervals are half-open [s, e), so
  * a session ending exactly when another starts never overlaps it. Rows
  * tied on (time, delta) are interchangeable under a running SUM (any
  * permutation passes through the same set of partial values), so the
  * per-key max is total-order-free and safe to hash cross-engine.
  */
object Intervals {

  /** (key, peak): maximum number of concurrently-open [start, end)
    * intervals per key. Times are exact BIGINTs (e.g. epoch micros). */
  def peakConcurrency(df: DataFrame, keyCol: String,
                      startCol: String, endCol: String): DataFrame = {
    val starts = df.select(col(keyCol).as("key"),
      col(startCol).as("__t"), lit(1).as("__d"))
    val ends = df.select(col(keyCol).as("key"),
      col(endCol).as("__t"), lit(-1).as("__d"))
    val w = Window.partitionBy("key")
      .orderBy(col("__t").asc, col("__d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.unionByName(ends)
      .withColumn("__open", sum(col("__d")).over(w))
      .groupBy("key")
      .agg(max("__open").as("peak"))
  }

  /** Merge strictly-overlapping [start, end) intervals per key into
    * maximal islands: (key, island_start, island_end, n_intervals) —
    * interval UNION, the other classic sweep question next to
    * [[peakConcurrency]]'s max-occupancy (total covered time, merged
    * availability/blackout windows). Half-open discipline throughout:
    * back-to-back intervals ([0,10) then [10,20)) do NOT merge.
    *
    * Same cost envelope as the peak sweep: one shuffle on the key, one
    * ordered window pass. An island breaks where a row's start clears
    * the running max end of everything before it; rows tied on
    * (start, end) are value-identical, so the break flags — and
    * therefore the island aggregates — are tie-order-free and safe to
    * hash cross-engine. */
  def mergeIslands(df: DataFrame, keyCol: String,
                   startCol: String, endCol: String): DataFrame = {
    val wPrev = Window.partitionBy("key")
      .orderBy(col("__s").asc, col("__e").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("key")
      .orderBy(col("__s").asc, col("__e").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol).as("key"),
        col(startCol).as("__s"), col(endCol).as("__e"))
      .withColumn("__prev_max", max(col("__e")).over(wPrev))
      .withColumn("__brk",
        when(col("__prev_max").isNull || col("__s") >= col("__prev_max"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__brk")).over(wRun))
      .groupBy(col("key"), col("__island"))
      .agg(min("__s").as("island_start"), max("__e").as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

  // ---- query-map entries (hash-gated) ----

  /** Gated instance: each event opens a dwell interval of
    * `round(value·100)` SECONDS (exact cents reread as a duration);
    * peak concurrent open intervals per user. Non-positive dwells are
    * dropped — a zero-length half-open interval is empty. */
  def peakConcurrentEvents(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("__s"),
        round(col("value") * 100).cast("long").as("__dur"))
      .filter(col("__dur") > 0)
      .withColumn("__e", col("__s") + col("__dur") * lit(1000000L))
    peakConcurrency(iv, "user_id", "__s", "__e")
      .withColumnRenamed("key", "user_id")
  }

  def oracleSql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 1000000 AS e
      |  FROM events WHERE round(value * 100) > 0
      |), deltas AS (
      |  SELECT user_id, s AS t, 1 AS d FROM iv
      |  UNION ALL
      |  SELECT user_id, e AS t, -1 AS d FROM iv
      |), run AS (
      |  SELECT user_id,
      |    sum(d) OVER (PARTITION BY user_id ORDER BY t, d
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      |  FROM deltas
      |)
      |SELECT user_id, CAST(max(c) AS BIGINT) AS peak
      |FROM run GROUP BY user_id""".stripMargin

  /** Gated instance: the same dwell intervals as
    * [[peakConcurrentEvents]], merged into maximal busy islands per
    * user — the two sweeps share one interval derivation so the pair
    * (peak occupancy, union coverage) reads off the same feed. */
  def intervalIslandsEvents(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("__s"),
        round(col("value") * 100).cast("long").as("__dur"))
      .filter(col("__dur") > 0)
      .withColumn("__e", col("__s") + col("__dur") * lit(1000000L))
    mergeIslands(iv, "user_id", "__s", "__e")
      .withColumnRenamed("key", "user_id")
  }

  def islandsOracleSql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 1000000 AS e
      |  FROM events WHERE round(value * 100) > 0
      |), flagged AS (
      |  SELECT user_id, s, e,
      |    CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |           OR s >= max(e) OVER (PARTITION BY user_id ORDER BY s, e
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS brk
      |  FROM iv
      |), isl AS (
      |  SELECT user_id, s, e,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM flagged
      |)
      |SELECT user_id, min(s) AS island_start, max(e) AS island_end,
      |  count(*) AS n_intervals
      |FROM isl GROUP BY user_id, island""".stripMargin
}
