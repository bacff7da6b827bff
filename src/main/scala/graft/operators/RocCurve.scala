package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact ROC and precision-recall curve POINTS — the full curves behind
  * [[ExactAuc]]'s scalar (AUC integrates this table) and
  * [[Calibration.liftDeciles]]'s decile view: one row per distinct score
  * threshold with cumulative TP/FP and the permicro TPR/FPR/precision at
  * "predict positive at score ≥ s". What the reference's evaluator
  * plots after spark_randomforest.py scoring.
  *
  * Exactness: thresholds are integer score CELLS (value cents) — the
  * cumulative counts come from HISTOGRAM CUMULATION over the cell
  * table ([[Ranks]]' discipline): one aggregate to (score, n, pos),
  * one window over cells ordered score DESC, truncating permicro
  * ratios (all terms non-negative).
  *
  * Scale: the fact is touched exactly once (cell aggregate); the
  * unpartitioned window runs over the DOMAIN-bounded cell table
  * (score cents ≤ ~10⁵ distinct values here), fixed while data grows
  * 100× — same shape as `rank_transform`/`quantile_normalize`.
  */
object RocCurve {

  /** (score, n, pos, tp, fp, tpr_permicro, fpr_permicro,
    * precision_permicro) per distinct score, ordered semantics
    * "positive iff score ≥ this row's score". Zero-positive or
    * zero-negative inputs yield NULL in the undefined ratios. */
  def rocPoints(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val cells = df
      .select(col(scoreCol).as("score"), col(labelCol).cast("long").as("__y"))
      .groupBy("score")
      .agg(count(lit(1)).as("n"), sum("__y").as("pos"))
    val wCum = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("tp", sum("pos").over(wCum))
      .withColumn("fp", sum(col("n") - col("pos")).over(wCum))
      .withColumn("__p", sum("pos").over(wAll))
      .withColumn("__neg", sum(col("n") - col("pos")).over(wAll))
      .select(col("score"), col("n"), col("pos"), col("tp"), col("fp"),
        expr("CASE WHEN __p > 0 THEN (1000000 * tp) div __p END")
          .as("tpr_permicro"),
        expr("CASE WHEN __neg > 0 THEN (1000000 * fp) div __neg END")
          .as("fpr_permicro"),
        expr("CASE WHEN tp + fp > 0 THEN (1000000 * tp) div (tp + fp) END")
          .as("precision_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the purchase-vs-rest ROC of the value-cents score
    * over the events stream. */
  def rocEvents(spark: SparkSession, dir: String): DataFrame =
    rocPoints(
      Tables.events(spark, dir).select(
        round(col("value") * 100).cast("long").as("cents"),
        (col("event_type") === "purchase").cast("long").as("__lbl")),
      "cents", "__lbl")

  def oracleSql: String =
    """WITH c AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS score,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events
      |), cells AS (
      |  SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
      |  FROM c GROUP BY score
      |), cum AS (
      |  SELECT score, n, pos,
      |    CAST(sum(pos) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
      |    CAST(sum(n - pos) OVER (ORDER BY score DESC) AS BIGINT) AS fp,
      |    CAST(sum(pos) OVER () AS BIGINT) AS p,
      |    CAST(sum(n - pos) OVER () AS BIGINT) AS neg
      |  FROM cells
      |)
      |SELECT score, n, pos, tp, fp,
      |  CASE WHEN p > 0 THEN (1000000 * tp) // p END AS tpr_permicro,
      |  CASE WHEN neg > 0 THEN (1000000 * fp) // neg END AS fpr_permicro,
      |  CASE WHEN tp + fp > 0 THEN (1000000 * tp) // (tp + fp) END
      |    AS precision_permicro
      |FROM cum""".stripMargin
}
