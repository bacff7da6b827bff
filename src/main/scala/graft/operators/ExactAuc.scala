package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact per-group ROC-AUC via the Mann-Whitney U statistic — the
  * distributed, tie-correct form of the evaluator the reference calls
  * on its fitted model (/root/reference/DataEngineering/DataBricks/
  * spark_randomforest.py:66-72, BinaryClassificationEvaluator). MLlib's
  * evaluator approximates on binned thresholds at scale; this computes
  * the EXACT statistic, groupable, from integer arithmetic.
  *
  * Math: with midrank tie handling, AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻)
  * where R⁺ sums positive midranks. Midranks are half-integers, so the
  * whole computation runs in DOUBLED units: a score with `b` rows
  * strictly below and `t` tied rows has doubled-midrank `2b + t + 1`,
  * and S₂ = Σ n⁺(score)·(2b+t+1) stays BIGINT. The single float op is
  * the final per-group ratio (S₂ − n⁺(n⁺+1)) / (2n⁺n⁻), micros-rounded
  * — identical IEEE tree in both engines. Headroom: S₂ ≤ 2·n⁺·N, so
  * BIGINT holds to ~2e9-row groups at 1e9 positives (document-scale
  * groups, not corpus-scale).
  *
  * Scale: one aggregate to (group, score) cells, one window over
  * DISTINCT-score rows per group (cells, not raw rows — the
  * sft_length_stats discipline), one aggregate back to groups. Raw rows
  * are touched exactly once.
  */
object ExactAuc {

  /** (group, n_pos, n_neg, auc_micros) per group: AUC of `scoreCol`
    * (exact cents) against binary `labelCol` (0/1). Degenerate groups
    * (no positives or no negatives) yield NULL auc. */
  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                 labelCol: String): DataFrame = {
    val cells = df
      .select(col(groupCol).as("grp"),
        round(col(scoreCol) * 100).cast("long").as("__s"),
        col(labelCol).cast("long").as("__y"))
      .groupBy("grp", "__s")
      .agg(count(lit(1)).as("__t"), sum("__y").as("__np"))
    val w = Window.partitionBy("grp").orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withBelow = cells
      .withColumn("__b", coalesce(sum(col("__t")).over(w), lit(0L)))
    val agg = withBelow.groupBy("grp").agg(
      sum(col("__np") * (lit(2L) * col("__b") + col("__t") + 1)).as("__s2"),
      sum("__np").as("n_pos"),
      sum(col("__t") - col("__np")).as("n_neg"))
    agg.withColumn("auc_micros",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("__s2") - col("n_pos") * (col("n_pos") + 1)).cast("double")
            / (lit(2.0) * col("n_pos") * col("n_neg")) * lit(1e6)).cast("long")))
      .select("grp", "n_pos", "n_neg", "auc_micros")
  }

  /** (group, n_pos, n_neg, ks_micros): the Kolmogorov-Smirnov statistic
    * max|F⁺(s) − F⁻(s)| per group — the separation companion of
    * [[aucByGroup]] (AUC integrates the separation; KS reports its
    * peak). Exact by cross-multiplication: the compared quantity is
    * |cum⁺·n⁻ − cum⁻·n⁺|, a BIGINT (headroom to ~6e9-row groups), with
    * ONE double ratio per group at the end. Same envelope: cells, one
    * window over distinct scores, one aggregate. */
  def ksByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                labelCol: String): DataFrame = {
    val cells = df
      .select(col(groupCol).as("grp"),
        round(col(scoreCol) * 100).cast("long").as("__s"),
        col(labelCol).cast("long").as("__y"))
      .groupBy("grp", "__s")
      .agg(count(lit(1)).as("__t"), sum("__y").as("__np"))
    val w = Window.partitionBy("grp").orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("__cp", sum(col("__np")).over(w))
      .withColumn("__cn", sum(col("__t") - col("__np")).over(w))
    val tot = cells.groupBy("grp").agg(
      sum("__np").as("n_pos"), sum(col("__t") - col("__np")).as("n_neg"))
    val agg = cum.join(tot, "grp")
      .groupBy("grp", "n_pos", "n_neg")
      .agg(max(abs(col("__cp") * col("n_neg") - col("__cn") * col("n_pos")))
        .as("__d2"))
    agg.withColumn("ks_micros",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__d2").cast("double")
            / (col("n_pos").cast("double") * col("n_neg")) * lit(1e6)).cast("long")))
      .select("grp", "n_pos", "n_neg", "ks_micros")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-event-type AUC of value cents against the
    * deterministic user-parity label — an A/A-style label, so the AUC
    * hovers near 0.5; the tie-correct exact math is what hash-gates. */
  def aucEvents(spark: SparkSession, dir: String): DataFrame =
    aucByGroup(Tables.events(spark, dir), "event_type", "value",
      col("user_id") % 2)
      .withColumnRenamed("grp", "event_type")

  /** Gated instance: per-event-type KS of the same score/label pair. */
  def ksEvents(spark: SparkSession, dir: String): DataFrame =
    ksByGroup(Tables.events(spark, dir)
        .withColumn("__lbl", col("user_id") % 2),
      "event_type", "value", "__lbl")
      .withColumnRenamed("grp", "event_type")

  private def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                         label: org.apache.spark.sql.Column): DataFrame =
    aucByGroup(df.withColumn("__lbl", label), groupCol, scoreCol, "__lbl")

  def oracleSql: String =
    """WITH base AS (
      |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS s,
      |    user_id % 2 AS y
      |  FROM events
      |), cells AS (
      |  SELECT g, s, count(*) AS t, CAST(sum(y) AS BIGINT) AS np
      |  FROM base GROUP BY 1, 2
      |), wb AS (
      |  SELECT g, s, t, np,
      |    coalesce(sum(t) OVER (PARTITION BY g ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
      |  FROM cells
      |), agg AS (
      |  SELECT g, CAST(sum(np * (2 * b + t + 1)) AS BIGINT) AS s2,
      |    CAST(sum(np) AS BIGINT) AS n_pos,
      |    CAST(sum(t - np) AS BIGINT) AS n_neg
      |  FROM wb GROUP BY 1
      |)
      |SELECT g AS event_type, n_pos, n_neg,
      |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |    CAST(round(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
      |      / (2.0 * n_pos * n_neg) * 1e6) AS BIGINT)
      |  END AS auc_micros
      |FROM agg""".stripMargin

  def ksOracleSql: String =
    """WITH base AS (
      |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS s,
      |    user_id % 2 AS y
      |  FROM events
      |), cells AS (
      |  SELECT g, s, count(*) AS t, CAST(sum(y) AS BIGINT) AS np
      |  FROM base GROUP BY 1, 2
      |), cum AS (
      |  SELECT g, s, np, t,
      |    sum(np) OVER (PARTITION BY g ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
      |    sum(t - np) OVER (PARTITION BY g ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
      |  FROM cells
      |), tot AS (
      |  SELECT g, CAST(sum(np) AS BIGINT) AS n_pos,
      |    CAST(sum(t - np) AS BIGINT) AS n_neg
      |  FROM cells GROUP BY 1
      |)
      |SELECT g AS event_type, n_pos, n_neg,
      |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |    CAST(round(CAST(max(abs(cp * n_neg - cn * n_pos)) AS DOUBLE)
      |      / (CAST(n_pos AS DOUBLE) * n_neg) * 1e6) AS BIGINT)
      |  END AS ks_micros
      |FROM cum JOIN tot USING (g)
      |GROUP BY g, n_pos, n_neg""".stripMargin
}
