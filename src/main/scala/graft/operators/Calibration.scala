package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Reliability-diagram statistics: equal-frequency score bins with per-bin
  * observed label rates — the calibration companion of [[ExactAuc]] (AUC
  * ranks; calibration asks whether the score's LEVEL is honest), feeding
  * the same model-eval loop as the reference's evaluator
  * (/root/reference/DataEngineering/DataBricks/spark_randomforest.py:66-72).
  *
  * Exactness: bins are [[Ranks.ntileExact]] — bit-identical to SQL
  * `ntile(k)` under a total order (score cents, id tie-break) at any
  * data size — so bin membership is deterministic cross-engine. Per-bin
  * sums are exact BIGINTs; the two micros means are one fixed expression
  * per OUTPUT bin.
  *
  * Scale: the global rank inside ntileExact is the two-phase
  * range-partition form; the bin aggregate has fixed cardinality k.
  */
object Calibration {

  /** (bin, n, pos, mean_label_micros, mean_score_cents_micros) over
    * `bins` equal-frequency score bins. Overflow headroom: the binding
    * sum is Σ score-cents per bin (≤ binRows · maxCents); at 1e12-row
    * bins keep scores under ~1e7 cents or pre-scale — ANSI mode throws
    * rather than wraps, so the failure is loud. */
  def bins(df: DataFrame, idCol: String, scoreCol: String,
           labelCol: String, bins: Int): DataFrame = {
    val cells = df.select(col(idCol).as("__id"),
      round(col(scoreCol) * 100).cast("long").as("__s"),
      col(labelCol).cast("long").as("__y"))
    Ranks.ntileExact(cells, Seq(col("__s"), col("__id")), bins, "bin")
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("pos"),
        sum("__s").as("__ssum"))
      .withColumn("mean_label_micros",
        round(col("pos").cast("double") / col("n") * lit(1e6)).cast("long"))
      .withColumn("mean_score_cents_micros",
        round(col("__ssum").cast("double") / col("n") * lit(1e6)).cast("long"))
      .select("bin", "n", "pos", "mean_label_micros", "mean_score_cents_micros")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: event value deciles against the user-parity label
    * (A/A-style — flat reliability expected; the binning + exact means
    * are what hash-gate). */
  def calibrationEvents(spark: SparkSession, dir: String): DataFrame =
    bins(Tables.events(spark, dir).withColumn("__lbl", expr("user_id % 2")),
      "event_id", "value", "__lbl", bins = 10)

  def oracleSql: String =
    """WITH c AS (
      |  SELECT event_id AS id, CAST(round(value * 100) AS BIGINT) AS s,
      |    user_id % 2 AS y
      |  FROM events
      |), t AS (
      |  SELECT ntile(10) OVER (ORDER BY s, id) AS bin, s, y FROM c
      |)
      |SELECT CAST(bin AS INT) AS bin, count(*) AS n,
      |  CAST(sum(y) AS BIGINT) AS pos,
      |  CAST(round(CAST(sum(y) AS DOUBLE) / count(*) * 1e6) AS BIGINT)
      |    AS mean_label_micros,
      |  CAST(round(CAST(sum(s) AS DOUBLE) / count(*) * 1e6) AS BIGINT)
      |    AS mean_score_cents_micros
      |FROM t GROUP BY bin""".stripMargin
}
