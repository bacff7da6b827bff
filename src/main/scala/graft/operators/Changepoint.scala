package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** CUSUM changepoint detection over per-key daily series — the batch
  * form of the level-shift monitoring the reference runs over its
  * ingestion feeds (/root/reference/DataEngineering/DataBricks/
  * spark_stream.py streams into monitored tables; [[graft.streaming.DriftMonitor]]
  * is this repo's streaming screen, and this operator is the exact
  * retrospective locator: WHERE did the level shift).
  *
  * Determinism discipline: the classic CUSUM statistic against the
  * series mean is `S_k = Σ_{i≤k}(x_i − x̄)`, which is fractional. Scaled
  * by n it becomes `n·S_k = n·prefix_k − k·total` — EXACT BIGINT
  * arithmetic end to end (no mean, no division), maximized with a
  * deterministic tie-break (earliest day). The argmax of |n·S_k| is the
  * argmax of |S_k|, so nothing is lost by the scaling. Per-side level
  * summaries are integer-micros divisions of exact sums.
  *
  * Scale: the input collapses to a dense (key, day) spine in ONE
  * aggregate over the fact ([[Resample.dailySpineFill]] — the heavy
  * side is touched once); every window after that runs at spine
  * cardinality, which is calendar-bounded (|keys| × |days|), not
  * data-bounded. Overflow headroom: `n_days · prefix` with a year-long
  * spine needs prefix ≤ 2^63/366 ≈ 2.5e16 events per key — far past
  * 100 TB row counts.
  */
object Changepoint {

  /** Per-key CUSUM changepoint over the daily event-count series:
    * (key, n_days, total_events, cp_day, cp_k, cusum_abs,
    * mean_before_micros, mean_after_micros), where `cp_day` maximizes
    * |n·prefix_k − k·total| (ties → earliest day) and the means are the
    * exact integer-micros event rates on each side of the cut. */
  def cusumDailyCounts(df: DataFrame, keyCol: String,
                       tsCol: String, valueCol: String): DataFrame = {
    val spine = Resample.dailySpineFill(df, keyCol, tsCol, valueCol)
    val wDay = Window.partitionBy("key").orderBy("day")
    val wAll = Window.partitionBy("key")
    val scored = spine
      .withColumn("k", row_number().over(wDay).cast("long"))
      .withColumn("prefix", sum("n_events").over(wDay))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total", sum("n_events").over(wAll))
      .withColumn("cusum_abs",
        abs(col("n_days") * col("prefix") - col("k") * col("total")))
    val wPick = Window.partitionBy("key")
      .orderBy(col("cusum_abs").desc, col("k").asc)
    scored
      .withColumn("__pick", row_number().over(wPick))
      .filter(col("__pick") === 1)
      .select(col("key"), col("n_days"), col("total").as("total_events"),
        col("day").as("cp_day"), col("k").as("cp_k"), col("cusum_abs"),
        expr("(1000000 * prefix) div k").as("mean_before_micros"),
        when(col("k") < col("n_days"),
          expr("(1000000 * (total - prefix)) div (n_days - k)"))
          .as("mean_after_micros"))
  }

  /** Pettitt's nonparametric changepoint test (Pettitt 1979) — the
    * RANK-based locator beside the mean-based CUSUM and the
    * SSE-based [[BinSeg]]: U_k = Σ_{i≤k} Σ_{j>k} sign(x_j − x_i), the
    * Mann-Whitney statistic of every prefix/suffix split, maximized
    * over k. Robust to outliers and any monotone transform of the
    * values — the test practitioners reach for when a level shift must
    * be declared SIGNIFICANT, not just located.
    *
    * The naive U_k is O(n³); this uses the exact identity
    * U_k = Σ_{t≤k} W(x_t) with W(v) = #{j: x_j > v} − #{j: x_j < v} —
    * W comes from the per-key VALUE-CELL table (one cumulative window
    * over distinct values), U_k is then one prefix-sum window over the
    * day order. No pair join anywhere; everything integer-exact.
    * Significance: the standard approximation
    * p ≈ 2·exp(−6U²/(n³+n²)) — ONE transcendental per GROUP row
    * (the pmi_bigrams cell-level discipline), rounded once to micros
    * and clamped to ≤ 10⁶. Argmax ties → earliest day. Series with
    * n < 2 are dropped (no split exists). */
  def pettittDaily(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("cents"))
      .localCheckpoint() // cell table AND the day-ordered prefix
    val wAll = Window.partitionBy("key")
    val wVal = Window.partitionBy("key").orderBy("cents")
    val cells = daily.groupBy(col("key"), col("cents"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__cumle", sum(col("__cnt")).over(wVal))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
      // W(v) = (#above) − (#below) = (n − cum_le) − (cum_le − cnt)
      .select(col("key"), col("cents"),
        ((col("__n") - col("__cumle")) - (col("__cumle") - col("__cnt")))
          .as("__w"))
    val wDay = Window.partitionBy("key").orderBy("day")
    val scored = daily.join(cells, Seq("key", "cents"))
      .withColumn("k", row_number().over(wDay).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("u_k", sum(col("__w")).over(wDay))
      .filter(col("k") < col("n")) // k = n splits nothing
      .withColumn("u_abs", abs(col("u_k")))
    val wPick = Window.partitionBy("key")
      .orderBy(col("u_abs").desc, col("k").asc)
    scored
      .withColumn("__pick", row_number().over(wPick))
      .filter(col("__pick") === 1)
      .select(col("key"), col("n"), col("day").as("cp_day"),
        col("k").as("cp_k"), col("u_abs"),
        least(expr(
          """CAST(round(2000000.0 * exp(
            |  -6.0 * CAST(u_abs AS DOUBLE) * CAST(u_abs AS DOUBLE)
            |  / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)))
            |AS BIGINT)""".stripMargin), lit(1000000L)).as("p_micro"))
  }

  // ---- query-map entries (hash-gated) ----

  /** Gated instance: per-event-type changepoint of the daily count
    * series (the dense spine of [[Resample.resampleDailyEvents]]). */
  def changepointEvents(spark: SparkSession, dir: String): DataFrame =
    cusumDailyCounts(Tables.events(spark, dir), "event_type", "ts", "value")
      .withColumnRenamed("key", "event_type")

  /** Gated instance: Pettitt over per-event-type daily cents (the
    * SPARSE observed-day series — rank tests need no zero fill). */
  def pettittEvents(spark: SparkSession, dir: String): DataFrame =
    pettittDaily(Tables.events(spark, dir), "event_type", "ts", "value")
      .withColumnRenamed("key", "event_type")

  def pettittOracleSql: String =
    """WITH daily AS (
      |  SELECT event_type AS key, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2
      |), cells AS (
      |  SELECT key, cents,
      |    (sum(cnt) OVER (PARTITION BY key)
      |       - sum(cnt) OVER (PARTITION BY key ORDER BY cents
      |                        ROWS UNBOUNDED PRECEDING))
      |    - (sum(cnt) OVER (PARTITION BY key ORDER BY cents
      |                      ROWS UNBOUNDED PRECEDING) - cnt) AS w
      |  FROM (SELECT key, cents, CAST(count(*) AS BIGINT) AS cnt
      |        FROM daily GROUP BY 1, 2)
      |), scored AS (
      |  SELECT d.key, d.day,
      |    CAST(ROW_NUMBER() OVER wd AS BIGINT) AS k,
      |    CAST(count(*) OVER (PARTITION BY d.key) AS BIGINT) AS n,
      |    abs(sum(c.w) OVER wd) AS u_abs
      |  FROM daily d JOIN cells c ON c.key = d.key AND c.cents = d.cents
      |  WINDOW wd AS (PARTITION BY d.key ORDER BY d.day
      |                ROWS UNBOUNDED PRECEDING)
      |), pick AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY key
      |    ORDER BY u_abs DESC, k ASC) AS rn
      |  FROM scored WHERE k < n
      |)
      |SELECT key AS event_type, n, day AS cp_day, k AS cp_k,
      |  CAST(u_abs AS BIGINT) AS u_abs,
      |  least(CAST(round(2000000.0 * exp(
      |    -6.0 * CAST(u_abs AS DOUBLE) * CAST(u_abs AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)))
      |  AS BIGINT), 1000000) AS p_micro
      |FROM pick WHERE rn = 1""".stripMargin

  def oracleSql: String =
    """WITH b AS (
      |  SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
      |  FROM events
      |), ks AS (SELECT DISTINCT event_type FROM events),
      |spine AS (
      |  SELECT event_type,
      |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM ks CROSS JOIN b
      |), d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |), series AS (
      |  SELECT s.event_type, s.day, coalesce(d.n, 0) AS n_events
      |  FROM spine s LEFT JOIN d USING (event_type, day)
      |), scored AS (
      |  SELECT event_type, day,
      |    ROW_NUMBER() OVER w AS k,
      |    SUM(n_events) OVER w AS prefix,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n_days,
      |    SUM(n_events) OVER (PARTITION BY event_type) AS total
      |  FROM series
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
      |), cu AS (
      |  SELECT *, abs(n_days * prefix - k * total) AS cusum_abs,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY abs(n_days * prefix - k * total) DESC, k ASC) AS pick
      |  FROM scored
      |)
      |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
      |  CAST(total AS BIGINT) AS total_events, day AS cp_day,
      |  CAST(k AS BIGINT) AS cp_k, CAST(cusum_abs AS BIGINT) AS cusum_abs,
      |  CAST((1000000 * prefix) // k AS BIGINT) AS mean_before_micros,
      |  CASE WHEN k < n_days
      |    THEN CAST((1000000 * (total - prefix)) // (n_days - k) AS BIGINT)
      |  END AS mean_after_micros
      |FROM cu WHERE pick = 1""".stripMargin
}
