package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Stratified average-treatment-effect estimator in exact integers —
  * the observational-causal readout beside [[Cuped]]'s sensitivity
  * transform and [[MannWhitney]]'s rank test: within each stratum the
  * treated/control outcome gap, across strata the n_s/N-weighted
  * combination (exact stratification = inverse-propensity weighting
  * with the empirical within-stratum propensity) over the monitored
  * event feed (/root/reference/DataEngineering/DataBricks/
  * spark_stream.py → experiment scoreboard).
  *
  * Exactness: per-stratum Δ̂_s = ȳ_t − ȳ_c is quantized ONCE by the
  * cross-multiplied sign-split division (S_t·n_c − S_c·n_t)·1e6 div
  * (n_t·n_c) in DECIMAL(38,0), and the pooled ATE is the n_s-weighted
  * truncating combination of those micros — both engines hold
  * identical intermediates, so the estimate hash-matches. Strata
  * missing an arm carry NULL Δ̂ and are excluded from the pooled
  * weight (the standard overlap restriction), with their exclusion
  * VISIBLE in the output rather than silent.
  *
  * Scale: one per-user aggregate (the corpus touch), then everything
  * runs on the stratum table (bounded by the stratum domain).
  */
object StratifiedAte {

  /** Per-stratum rows (stratum, n_treat, n_ctrl, delta_micro) plus the
    * pooled (ate_micro, n_used) repeated per row — units: `yCol`
    * integer units × 1e-6. */
  def ate(units: DataFrame, stratumCol: String, treatCol: String,
          yCol: String): DataFrame = {
    val strata = units.groupBy(col(stratumCol).as("stratum"))
      .agg(
        sum(when(col(treatCol), 1L).otherwise(0L)).as("n_treat"),
        sum(when(col(treatCol), 0L).otherwise(1L)).as("n_ctrl"),
        sum(when(col(treatCol), col(yCol)).otherwise(0L))
          .cast("decimal(38,0)").as("st"),
        sum(when(col(treatCol), 0L).otherwise(col(yCol)))
          .cast("decimal(38,0)").as("sc"))
      .withColumn("delta_micro", expr(
        """CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
             (CASE WHEN st * n_ctrl < sc * n_treat THEN -1L ELSE 1L END)
               * ((1000000 * abs(st * n_ctrl - sc * n_treat))
                   div (CAST(n_treat AS DECIMAL(38,0)) * n_ctrl))
           END"""))
      .localCheckpoint() // consumed by output AND the pooled aggregate
    val pooled = strata.filter(col("delta_micro").isNotNull)
      .agg(sum(col("n_treat") + col("n_ctrl")).as("n_used"),
        sum((col("n_treat") + col("n_ctrl")).cast("decimal(38,0)")
          * col("delta_micro")).as("wsum"))
      .select(col("n_used"), expr(
        """CASE WHEN n_used > 0 THEN
             (CASE WHEN wsum < 0 THEN -1L ELSE 1L END)
               * (abs(wsum) div n_used) END""").as("ate_micro"))
    strata.select(col("stratum"), col("n_treat"), col("n_ctrl"),
        col("delta_micro"))
      .crossJoin(broadcast(pooled))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: treatment = heavy clicker (> 13 click events, the
    * corpus median — per-user event rates are generation-stable, so the
    * split holds at every SF); outcome = the user's total purchase
    * cents; stratum = error-count bucket (div 7, capped at 3), an
    * activity proxy both arms share at every bucket. */
  def stratifiedAteEvents(spark: SparkSession, dir: String): DataFrame = {
    val units = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        (sum(when(col("event_type") === "click", 1L).otherwise(0L)) > 13L)
          .as("treated"),
        least(expr("sum(CASE WHEN event_type = 'error' THEN 1L ELSE 0L END) div 7"),
          lit(3L)).as("stratum"),
        coalesce(sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long"))), lit(0L)).as("y"))
    ate(units, "stratum", "treated", "y")
  }

  def oracleSql: String =
    """WITH units AS (
      |  SELECT user_id,
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 13 AS treated,
      |    CAST(least(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) // 7, 3)
      |      AS BIGINT) AS stratum,
      |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS HUGEINT) AS y
      |  FROM events GROUP BY 1
      |), strata AS (
      |  SELECT stratum,
      |    CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
      |    CAST(sum(CASE WHEN treated THEN 0 ELSE 1 END) AS BIGINT) AS n_ctrl,
      |    sum(CASE WHEN treated THEN y ELSE 0 END) AS st,
      |    sum(CASE WHEN treated THEN 0 ELSE y END) AS sc
      |  FROM units GROUP BY 1
      |), deltas AS (
      |  SELECT stratum, n_treat, n_ctrl,
      |    CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN CAST(
      |      (CASE WHEN st * n_ctrl < sc * n_treat THEN -1 ELSE 1 END)
      |        * ((1000000 * abs(st * n_ctrl - sc * n_treat))
      |            // (CAST(n_treat AS HUGEINT) * n_ctrl)) AS BIGINT)
      |    END AS delta_micro
      |  FROM strata
      |), pooled AS (
      |  SELECT CAST(sum(n_treat + n_ctrl) AS BIGINT) AS n_used,
      |    CASE WHEN sum(n_treat + n_ctrl) > 0 THEN CAST(
      |      (CASE WHEN sum(CAST(n_treat + n_ctrl AS HUGEINT) * delta_micro) < 0
      |        THEN -1 ELSE 1 END)
      |      * (abs(sum(CAST(n_treat + n_ctrl AS HUGEINT) * delta_micro))
      |          // sum(n_treat + n_ctrl)) AS BIGINT) END AS ate_micro
      |  FROM deltas WHERE delta_micro IS NOT NULL
      |)
      |SELECT d.stratum, d.n_treat, d.n_ctrl, d.delta_micro,
      |  p.n_used, p.ate_micro
      |FROM deltas d CROSS JOIN pooled p""".stripMargin

  /** OVERLAP-weighted treatment effect (Li, Morgan & Zaslavsky 2018,
    * "Balancing covariates via propensity score weighting"): weight
    * each stratum by e·(1−e)·n = n_t·n_c/n instead of n — the ATO
    * estimand, which down-weights strata where one arm dominates and
    * is the standard answer to limited-overlap bias. Same staged
    * exact-integer discipline as [[ate]]: per-stratum weights quantize
    * once to millis via the truncating div ((n_t·n_c·1000) div n in
    * DECIMAL(38,0) — n_t·n_c alone bursts BIGINT near 1e10 units),
    * and the pooled combination sign-splits over those integers, so
    * both engines hold identical intermediates. One row out:
    * (n_strata_used, w_milli_total, ato_micro). */
  def overlapAte(units: DataFrame, stratumCol: String, treatCol: String,
                 yCol: String): DataFrame = {
    val strata = units.groupBy(col(stratumCol).as("stratum"))
      .agg(
        sum(when(col(treatCol), 1L).otherwise(0L)).as("n_treat"),
        sum(when(col(treatCol), 0L).otherwise(1L)).as("n_ctrl"),
        sum(when(col(treatCol), col(yCol)).otherwise(0L))
          .cast("decimal(38,0)").as("st"),
        sum(when(col(treatCol), 0L).otherwise(col(yCol)))
          .cast("decimal(38,0)").as("sc"))
      .withColumn("delta_micro", expr(
        """CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
             (CASE WHEN st * n_ctrl < sc * n_treat THEN -1L ELSE 1L END)
               * ((1000000 * abs(st * n_ctrl - sc * n_treat))
                   div (CAST(n_treat AS DECIMAL(38,0)) * n_ctrl))
           END"""))
      .withColumn("w_milli", expr(
        """CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
             (CAST(n_treat AS DECIMAL(38,0)) * n_ctrl * 1000)
               div CAST(n_treat + n_ctrl AS DECIMAL(38,0))
           END"""))
    strata.filter(col("delta_micro").isNotNull)
      .agg(count(lit(1)).as("n_strata_used"),
        sum("w_milli").as("w_milli_total"),
        sum(col("w_milli").cast("decimal(38,0)") * col("delta_micro"))
          .as("__wsum"))
      .select(col("n_strata_used"), col("w_milli_total"), expr(
        """CASE WHEN w_milli_total > 0 THEN
             (CASE WHEN __wsum < 0 THEN -1L ELSE 1L END)
               * (abs(__wsum) div CAST(w_milli_total AS DECIMAL(38,0)))
           END""").as("ato_micro"))
  }

  /** Gated instance: [[stratifiedAteEvents]]' exact scenario under
    * overlap weighting — the two keys differ ONLY in the estimand. */
  def overlapAteEvents(spark: SparkSession, dir: String): DataFrame = {
    val units = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        (sum(when(col("event_type") === "click", 1L).otherwise(0L)) > 13L)
          .as("treated"),
        least(expr("sum(CASE WHEN event_type = 'error' THEN 1L ELSE 0L END) div 7"),
          lit(3L)).as("stratum"),
        coalesce(sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long"))), lit(0L)).as("y"))
    overlapAte(units, "stratum", "treated", "y")
  }

  def overlapOracleSql: String =
    """WITH units AS (
      |  SELECT user_id,
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 13 AS treated,
      |    CAST(least(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) // 7, 3)
      |      AS BIGINT) AS stratum,
      |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS HUGEINT) AS y
      |  FROM events GROUP BY 1
      |), strata AS (
      |  SELECT stratum,
      |    CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
      |    CAST(sum(CASE WHEN treated THEN 0 ELSE 1 END) AS BIGINT) AS n_ctrl,
      |    sum(CASE WHEN treated THEN y ELSE 0 END) AS st,
      |    sum(CASE WHEN treated THEN 0 ELSE y END) AS sc
      |  FROM units GROUP BY 1
      |), deltas AS (
      |  SELECT stratum, n_treat, n_ctrl,
      |    CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN CAST(
      |      (CASE WHEN st * n_ctrl < sc * n_treat THEN -1 ELSE 1 END)
      |        * ((1000000 * abs(st * n_ctrl - sc * n_treat))
      |            // (CAST(n_treat AS HUGEINT) * n_ctrl)) AS BIGINT)
      |    END AS delta_micro,
      |    CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN CAST(
      |      (CAST(n_treat AS HUGEINT) * n_ctrl * 1000)
      |        // CAST(n_treat + n_ctrl AS HUGEINT) AS BIGINT)
      |    END AS w_milli
      |  FROM strata
      |)
      |SELECT CAST(count(*) AS BIGINT) AS n_strata_used,
      |  CAST(sum(w_milli) AS BIGINT) AS w_milli_total,
      |  CASE WHEN sum(w_milli) > 0 THEN CAST(
      |    (CASE WHEN sum(CAST(w_milli AS HUGEINT) * delta_micro) < 0
      |      THEN -1 ELSE 1 END)
      |    * (abs(sum(CAST(w_milli AS HUGEINT) * delta_micro))
      |        // sum(CAST(w_milli AS HUGEINT))) AS BIGINT) END AS ato_micro
      |FROM deltas WHERE delta_micro IS NOT NULL""".stripMargin
}
