package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact confusion-matrix report for a binary classifier — the single
  * table every model-quality review starts from, completing the
  * threshold-free curves ([[RocCurve]], [[ExactAuc]],
  * [[Calibration]]) with the AT-A-THRESHOLD view the reference's
  * evaluator prints after spark_randomforest.py scoring
  * (/root/reference/MachineLearning/SparkML/spark_randomforest.py):
  * TP/FP/TN/FN plus accuracy, precision, recall, F1, and Matthews
  * correlation (the balanced single-number summary that stays honest
  * under class imbalance, unlike accuracy).
  *
  * Exactness: one aggregate to the four counts (BIGINT, associative),
  * then every metric is a staged exact-integer expression shared
  * verbatim by both engines. Accuracy/precision/recall/F1 are single
  * truncating permicro divisions. MCC needs √((TP+FP)(TP+FN)(TN+FP)
  * (TN+FN)): the 4-way product of 10¹²-scale counts passes DECIMAL38,
  * so it is staged as TWO exact integer square roots
  * ([[Allocation.isqrtSql]]) of the 10²⁴-bounded pairwise products and
  * two truncating divisions — `(10⁶·num div √(ab)) div √(cd)` — the
  * same operation order in both engines, so the hash cannot flap.
  * (The staging under-reports |MCC| by < 3e-6 relative; the sign and
  * magnitude ordering are exact.)
  *
  * Scale: the fact table is touched exactly once by a 4-counter
  * aggregate with map-side partials; all metric math runs on the one
  * summary row. Nothing downstream grows with data.
  */
object ConfusionStats {

  /** One-row report (tp, fp, tn, fn, n, accuracy_permicro,
    * precision_permicro, recall_permicro, f1_permicro, mcc_permicro).
    * Ratio columns are NULL when their denominator is 0; MCC is NULL
    * when any margin is empty (the statistic is undefined there). */
  def confusion(df: DataFrame, predCol: Column, labelCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val counts = df
      .select(predCol.cast("boolean").as("__p"),
        labelCol.cast("boolean").as("__y"))
      .agg(
        sum(when(col("__p") && col("__y"), 1L).otherwise(0L))
          .cast(d38).as("tp"),
        sum(when(col("__p") && !col("__y"), 1L).otherwise(0L))
          .cast(d38).as("fp"),
        sum(when(!col("__p") && !col("__y"), 1L).otherwise(0L))
          .cast(d38).as("tn"),
        sum(when(!col("__p") && col("__y"), 1L).otherwise(0L))
          .cast(d38).as("fn"))
    val sqrtAb = Allocation.isqrtSql("((tp + fp) * (tp + fn))")
    val sqrtCd = Allocation.isqrtSql("((tn + fp) * (tn + fn))")
    counts.select(
      col("tp").cast("long").as("tp"), col("fp").cast("long").as("fp"),
      col("tn").cast("long").as("tn"), col("fn").cast("long").as("fn"),
      (col("tp") + col("fp") + col("tn") + col("fn"))
        .cast("long").as("n"),
      expr("""CASE WHEN tp + fp + tn + fn > 0 THEN
                CAST((1000000 * (tp + tn)) div (tp + fp + tn + fn) AS BIGINT)
              END""").as("accuracy_permicro"),
      expr("""CASE WHEN tp + fp > 0 THEN
                CAST((1000000 * tp) div (tp + fp) AS BIGINT)
              END""").as("precision_permicro"),
      expr("""CASE WHEN tp + fn > 0 THEN
                CAST((1000000 * tp) div (tp + fn) AS BIGINT)
              END""").as("recall_permicro"),
      // F1 = 2TP / (2TP + FP + FN): one exact truncation
      expr("""CASE WHEN 2 * tp + fp + fn > 0 THEN
                CAST((2000000 * tp) div (2 * tp + fp + fn) AS BIGINT)
              END""").as("f1_permicro"),
      expr(s"""CASE WHEN (tp + fp) * (tp + fn) > 0
                    AND (tn + fp) * (tn + fn) > 0 THEN
                 CAST(((1000000 * (tp * tn - fp * fn)) div $sqrtAb)
                        div $sqrtCd AS BIGINT)
               END""").as("mcc_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the fixed-threshold classifier "purchase iff
    * value ≥ $50" over the events stream — the at-threshold companion
    * of [[RocCurve.rocEvents]]'s full curve (same score, same label). */
  def confusionEvents(spark: SparkSession, dir: String): DataFrame =
    confusion(
      Tables.events(spark, dir).select(
        (round(col("value") * 100).cast("long") >= 5000L).as("__pred"),
        (col("event_type") === "purchase").as("__lbl")),
      col("__pred"), col("__lbl"))

  def oracleSql: String = {
    val sqrtAb = Allocation.isqrtDuckSql("((tp + fp) * (tp + fn))")
    val sqrtCd = Allocation.isqrtDuckSql("((tn + fp) * (tn + fn))")
    s"""WITH c AS (
       |  SELECT CAST(round(value * 100) AS BIGINT) >= 5000 AS p,
       |    event_type = 'purchase' AS y
       |  FROM events
       |), k AS (
       |  SELECT
       |    CAST(sum(CASE WHEN p AND y THEN 1 ELSE 0 END) AS HUGEINT) AS tp,
       |    CAST(sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) AS HUGEINT) AS fp,
       |    CAST(sum(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END) AS HUGEINT) AS tn,
       |    CAST(sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END) AS HUGEINT) AS fn
       |  FROM c
       |)
       |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |  CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
       |  CAST(tp + fp + tn + fn AS BIGINT) AS n,
       |  CASE WHEN tp + fp + tn + fn > 0 THEN
       |    CAST((1000000 * (tp + tn)) // (tp + fp + tn + fn) AS BIGINT)
       |  END AS accuracy_permicro,
       |  CASE WHEN tp + fp > 0 THEN
       |    CAST((1000000 * tp) // (tp + fp) AS BIGINT)
       |  END AS precision_permicro,
       |  CASE WHEN tp + fn > 0 THEN
       |    CAST((1000000 * tp) // (tp + fn) AS BIGINT)
       |  END AS recall_permicro,
       |  CASE WHEN 2 * tp + fp + fn > 0 THEN
       |    CAST((2000000 * tp) // (2 * tp + fp + fn) AS BIGINT)
       |  END AS f1_permicro,
       |  CASE WHEN (tp + fp) * (tp + fn) > 0
       |        AND (tn + fp) * (tn + fn) > 0 THEN
       |    CAST(((1000000 * (tp * tn - fp * fn)) // $sqrtAb)
       |           // $sqrtCd AS BIGINT)
       |  END AS mcc_permicro
       |FROM k""".stripMargin
  }
}
