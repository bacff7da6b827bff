package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Binary-segmentation changepoint (Scott & Knott 1974; the first
  * split of PELT/BinSeg families) over per-key daily series — the
  * VARIANCE-REDUCTION locator next to [[Changepoint]]'s CUSUM level
  * shift: pick the cut k that maximizes the between-segment sum of
  * squares, i.e. the split a one-node regression tree would make on
  * the time axis.
  *
  * Exactness via the CUSUM identity: with prefix p_k, total T, n days,
  *   betweenSSE(k) = (n·p_k − k·T)² / (n·k·(n−k)) = cusum(k)² / (n·k·(n−k)),
  * so the argmax over k is the argmax of cusum(k)²/(k(n−k)) (n is
  * per-key constant). The sort key is the QUANTIZED integer
  *   gain_q(k) = ⌊ ⌊cusum(k)/n⌋² / (k·(n−k)) ⌋
  * — the inner ÷n normalization keeps the outer `div` quotient inside
  * BIGINT at any corpus magnitude (Spark `div` returns BIGINT; an
  * unnormalized quotient passes 2⁶³ once daily counts reach ~10¹⁰).
  * Both floors are identical in Spark `div` and DuckDB `//` on
  * nonnegative operands; equal-gain_q ties break to the earliest day —
  * argmax deterministic on both engines by construction.
  *
  * Scale: identical to [[Changepoint]] — the fact is touched once by
  * the daily aggregate; every window after that runs at the
  * calendar-bounded spine cardinality. Candidates k = 1..n−1 (k = n
  * leaves an empty right segment and a zero denominator — excluded on
  * both engines).
  */
object BinSeg {

  /** Per-key best binary-segmentation cut of the daily event-count
    * series: (key, n_days, total_events, cut_day, cut_k, gain_q,
    * mean_before_micros, mean_after_micros). */
  def binsegDailyCounts(df: DataFrame, keyCol: String,
                        tsCol: String, valueCol: String): DataFrame = {
    val spine = Resample.dailySpineFill(df, keyCol, tsCol, valueCol)
    val wDay = Window.partitionBy("key").orderBy("day")
    val wAll = Window.partitionBy("key")
    val scored = spine
      .withColumn("k", row_number().over(wDay).cast("long"))
      .withColumn("prefix", sum("n_events").over(wDay))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total", sum("n_events").over(wAll))
      .filter(col("k") < col("n_days"))
      .withColumn("__c",
        abs(col("n_days") * col("prefix") - col("k") * col("total")))
      .withColumn("__cn", expr("__c div n_days"))
      .withColumn("gain_q", expr(
        "(CAST(__cn AS DECIMAL(38,0)) * __cn) div (k * (n_days - k))"))
    val wPick = Window.partitionBy("key")
      .orderBy(col("gain_q").desc, col("k").asc)
    scored
      .withColumn("__pick", row_number().over(wPick))
      .filter(col("__pick") === 1)
      .select(col("key"), col("n_days"), col("total").as("total_events"),
        col("day").as("cut_day"), col("k").as("cut_k"), col("gain_q"),
        expr("(1000000 * prefix) div k").as("mean_before_micros"),
        expr("(1000000 * (total - prefix)) div (n_days - k)")
          .as("mean_after_micros"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-event-type best variance-reduction cut of the
    * daily count series — same spine as `changepoint_cusum`, different
    * objective (a mean-shift CUSUM flags drifts; BinSeg's SSE gain
    * flags the split a segmented-regression fit would take first). */
  def binsegEvents(spark: SparkSession, dir: String): DataFrame =
    binsegDailyCounts(Tables.events(spark, dir), "event_type", "ts", "value")
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
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2
      |), dense AS (
      |  SELECT s.event_type, s.day, coalesce(d.n_events, 0) AS n_events
      |  FROM spine s LEFT JOIN d USING (event_type, day)
      |), scored AS (
      |  SELECT event_type, day,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
      |    sum(n_events) OVER w AS prefix,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
      |    sum(n_events) OVER (PARTITION BY event_type) AS total
      |  FROM dense
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS UNBOUNDED PRECEDING)
      |), gains AS (
      |  SELECT *,
      |    ((abs(n_days * prefix - k * total) // n_days)
      |      * (abs(n_days * prefix - k * total) // n_days))
      |      // (k * (n_days - k)) AS gain_q
      |  FROM scored WHERE k < n_days
      |), pick AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY gain_q DESC, k ASC) AS rn
      |  FROM gains
      |)
      |SELECT event_type, n_days, CAST(total AS BIGINT) AS total_events,
      |  day AS cut_day, k AS cut_k, CAST(gain_q AS BIGINT) AS gain_q,
      |  CAST((1000000 * prefix) // k AS BIGINT) AS mean_before_micros,
      |  CAST((1000000 * (total - prefix)) // (n_days - k) AS BIGINT)
      |    AS mean_after_micros
      |FROM pick WHERE rn = 1""".stripMargin
}
