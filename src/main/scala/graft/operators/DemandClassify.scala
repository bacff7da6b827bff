package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Syntetos–Boylan–Croston demand classification — the router that
  * decides WHICH forecasting family a series belongs to (Syntetos,
  * Boylan, Croston 2005, "On the categorization of demand patterns"):
  * the reference's statsforecast catalog spans smooth-series models
  * (AutoETS/Theta — [[HoltWinters]]/[[Theta]] here) and
  * intermittent-demand models (Croston — [[Croston]] here), and this
  * quadrant is the standard dispatch between them
  * (/root/reference/MachineLearning/Kubernetes/src/stats_forecast_tune.py
  * tunes the catalog per series; the ADI/CV² screen is what routes a
  * sparse SKU to Croston instead of letting ETS average zeros).
  *
  * Per series over the dense daily spine:
  *   ADI  = n_days / n_nonzero          (average demand interval)
  *   CV²  = Var(x)/Mean(x)² over the NONZERO demand SIZES |cents|
  *        = (n·Σx² − (Σx)²) / (Σx)²     (population variance, exact;
  *          magnitudes — a signed mix could cancel Σx to zero, and
  *          the screen measures dispersion of size, not direction;
  *          Σx² is sign-free by squaring)
  * both reported as truncating permicro integers, classified on the
  * standard cutpoints ADI ⋛ 1.32, CV² ⋛ 0.49 (compared as exact
  * integer permicros — no float ever enters):
  *   smooth (ADI<1.32, CV²<0.49) · erratic (CV²≥0.49) ·
  *   intermittent (ADI≥1.32, CV²<0.49) · lumpy (both ≥).
  * All-zero series have no demand sizes and are DROPPED on both
  * engines (nothing to classify or forecast).
  *
  * Scale shape: the corpus is touched once by the daily aggregate;
  * everything after runs at spine cardinality (calendar-bounded).
  * Overflow: Σx² of 10¹²-cent days over a year ≤ 10²⁷ — DECIMAL(38,0)
  * carried, and both div quotients are ≤ 10⁶·n_days.
  */
object DemandClassify {

  /** (key, n_days, n_nonzero, adi_permicro, cv2_permicro,
    * demand_class). */
  def classify(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String): DataFrame =
    classifyDense(
      Resample.dailySpineFill(df, keyCol, tsCol, valueCol), keyCol)

  /** The same quadrant over a PREBUILT dense spine carrying
    * (key, cents) — lets [[RouteForecast]] share one spine between the
    * classifier and the model backtests. */
  def classifyDense(spine: DataFrame, keyCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    spine.groupBy(col("key").as(keyCol))
      .agg(
        count(lit(1)).as("n_days"),
        sum(when(col("cents") =!= 0L, 1L).otherwise(0L)).as("n_nonzero"),
        sum(when(col("cents") =!= 0L, abs(col("cents")))).cast(d38).as("__sx"),
        sum(when(col("cents") =!= 0L,
          expr(s"CAST(cents AS $d38) * cents"))).cast(d38).as("__sxx"))
      .filter(col("n_nonzero") >= 1)
      .withColumn("adi_permicro",
        expr("(CAST(1000000 AS DECIMAL(38,0)) * n_days) div n_nonzero"))
      .withColumn("cv2_permicro", expr(
        """(CAST(1000000 AS DECIMAL(38,0))
           |  * (CAST(n_nonzero AS DECIMAL(38,0)) * __sxx - __sx * __sx))
           |  div (__sx * __sx)""".stripMargin))
      .withColumn("demand_class", expr(
        """CASE
          |  WHEN adi_permicro >= 1320000 AND cv2_permicro >= 490000 THEN 'lumpy'
          |  WHEN adi_permicro >= 1320000 THEN 'intermittent'
          |  WHEN cv2_permicro >= 490000 THEN 'erratic'
          |  ELSE 'smooth'
          |END""".stripMargin))
      .select(keyCol, "n_days", "n_nonzero", "adi_permicro",
        "cv2_permicro", "demand_class")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-user daily cents demand on the zero-filled
    * spine — the routing screen ahead of the gated forecast family. */
  def demandClassifyEvents(spark: SparkSession, dir: String): DataFrame =
    classify(Tables.events(spark, dir), "user_id", "ts", "value")

  def oracleSql: String =
    """WITH b AS (
      |  SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
      |  FROM events
      |), k AS (SELECT DISTINCT user_id FROM events),
      |spine AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM k CROSS JOIN b
      |), d AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2
      |), dense AS (
      |  SELECT s.user_id, s.day, coalesce(d.cents, 0) AS cents
      |  FROM spine s LEFT JOIN d USING (user_id, day)
      |), agg AS (
      |  SELECT user_id,
      |    CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(CASE WHEN cents <> 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_nonzero,
      |    CAST(sum(CASE WHEN cents <> 0 THEN abs(cents) END) AS HUGEINT) AS sx,
      |    CAST(sum(CASE WHEN cents <> 0
      |      THEN CAST(cents AS HUGEINT) * cents END) AS HUGEINT) AS sxx
      |  FROM dense GROUP BY user_id
      |), scored AS (
      |  SELECT user_id, n_days, n_nonzero,
      |    CAST((1000000 * CAST(n_days AS HUGEINT)) // n_nonzero AS BIGINT)
      |      AS adi_permicro,
      |    CAST((1000000 * (CAST(n_nonzero AS HUGEINT) * sxx - sx * sx))
      |      // (sx * sx) AS BIGINT) AS cv2_permicro
      |  FROM agg WHERE n_nonzero >= 1
      |)
      |SELECT user_id, n_days, n_nonzero, adi_permicro, cv2_permicro,
      |  CASE
      |    WHEN adi_permicro >= 1320000 AND cv2_permicro >= 490000 THEN 'lumpy'
      |    WHEN adi_permicro >= 1320000 THEN 'intermittent'
      |    WHEN cv2_permicro >= 490000 THEN 'erratic'
      |    ELSE 'smooth'
      |  END AS demand_class
      |FROM scored""".stripMargin
}
