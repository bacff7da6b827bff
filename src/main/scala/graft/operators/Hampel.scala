package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Hampel filter — rolling-median/MAD outlier flags over a daily
  * series, the robust alternative to the EWMA control chart
  * ([[EwmaChart]]) and the z-score sweep the reference's monitoring
  * notebooks run on pipeline metrics (anchor: the anomaly pass of
  * /root/reference/DataEngineering/DataBricks/merge_generator.py's
  * row-count drift checks): a point is anomalous when it sits more
  * than k·MAD from the median of its ±3-day window, with the classic
  * k = 3·1.4826 (the Gaussian MAD→σ constant).
  *
  * Exactness: the window is 7 integer cents values, so the median is
  * the 4th order statistic — an ELEMENT, no interpolation — and the
  * MAD is the 4th order statistic of the 7 integer absolute
  * deviations. The flag compares 10⁴·dev > 44478·mad, i.e. the
  * threshold constant quantized once at 10⁻⁴ (4.4478 = 3·1.4826);
  * no float crosses the engine boundary. Partial windows at the
  * series edges emit NULL flags (no padded pretend-medians).
  *
  * Scale shape: one fact→(type, day) rollup, then a 7-row sliding
  * window per type over the calendar-bounded spine; the sort/select
  * runs on a 7-element array per row via codegen'd higher-order
  * functions (sort_array/transform/element_at) — no UDF, no shuffle
  * beyond the rollup.
  */
object Hampel {

  /** Per-row window stats + flag over `valueCol` ordered by `ordCol`
    * within `groupCol`: (group, ord, value, med, mad, is_outlier). */
  def filter(cells: DataFrame, groupCol: String, ordCol: String,
             valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(ordCol))
      .rowsBetween(-3, 3)
    cells
      .withColumn("__arr", collect_list(col(valueCol)).over(w))
      .withColumn("med",
        when(size(col("__arr")) === 7,
          element_at(sort_array(col("__arr")), 4)))
      .withColumn("mad",
        when(size(col("__arr")) === 7,
          element_at(sort_array(
            expr(s"transform(__arr, v -> abs(v - med))")), 4)))
      .withColumn("is_outlier",
        when(col("med").isNotNull,
          lit(10000) * abs(col(valueCol) - col("med")) >
            lit(44478) * col("mad")))
      .drop("__arr")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: ±3-day Hampel flags on each event type's daily
    * revenue-cents series. */
  def hampelEvents(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    filter(daily, "event_type", "day", "cents")
  }

  def oracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2
      |), windows AS (
      |  SELECT event_type, day, cents,
      |    list(cents) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS arr
      |  FROM daily
      |), meds AS (
      |  SELECT event_type, day, cents,
      |    CASE WHEN len(arr) = 7 THEN list_sort(arr)[4] END AS med, arr
      |  FROM windows
      |)
      |SELECT event_type, day, cents, med,
      |  CASE WHEN med IS NOT NULL THEN
      |    list_sort(list_transform(arr, v -> abs(v - med)))[4] END AS mad,
      |  CASE WHEN med IS NOT NULL THEN
      |    10000 * abs(cents - med) >
      |      44478 * list_sort(list_transform(arr, v -> abs(v - med)))[4]
      |  END AS is_outlier
      |FROM meds""".stripMargin
}
