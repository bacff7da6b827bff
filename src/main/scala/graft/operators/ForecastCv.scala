package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-window cross-validated forecast model selection — the
  * reference's actual tuner protocol
  * (/root/reference/MachineLearning/Ray/timeseries/stats_forecast_tune
  * .py:291-310 `evaluate_models_with_cv` scores every candidate on a
  * TimeSeriesSplit schedule, cv=5, consumed at :410), where
  * [[AutoForecast]] ranks on a SINGLE holdout window. Each fold is an
  * expanding window ([[TsCvSplits]]'s schedule shape): fold f trains
  * through hi − holdback_f and tests on the next `Horizon` days; the
  * winner is chosen by the MAE averaged across folds, so a model that
  * happens to win the last week cannot beat one that wins the month.
  *
  * Exactness: per-fold absolute errors are exact integer cent sums;
  * the cross-fold average is ONE division of the pooled integer sum by
  * the pooled eval count (never a mean of per-fold doubles, whose
  * addition order differs between engines), so the leaderboard sits
  * inside a DuckDB hash gate composed from the three models'
  * parameterized oracle CTE builders at three holdbacks. Tie order is
  * [[AutoForecast]]'s: holt_winters beats theta beats seasonal_naive.
  *
  * Scale: the dense spine is pinned once (localCheckpoint) and re-read
  * by 3 folds × 3 models; each model's per-fold work carries its own
  * operator's scale shape (per-key calendar-bounded arrays, spine-
  * cardinality joins). Folds are independent branches of one plan —
  * no iteration over the corpus.
  */
object ForecastCv {

  val Horizon = 7
  /** Expanding schedule: holdbacks in days; fold f tests on
    * (hi−holdback, hi−holdback+Horizon]. */
  val FoldHoldbacks: Seq[Int] = Seq(21, 14, 7)

  /** Exact per-fold error rows (__key, __sae, __n) from a
    * (__key, __k, __yhat, __actual) forecast frame. */
  private def foldErr(frame: DataFrame): DataFrame =
    frame.groupBy(col("__key"))
      .agg(sum(abs(col("__actual") - col("__yhat"))).as("__sae"),
        count(lit(1)).as("__n"))

  /** Seasonal-naive forecast frame on the dense spine at `holdback`:
    * ŷ(cutoff+k) = y(cutoff+k−7) — same contract as the HW/Theta
    * forecastFrames. */
  private def snFrame(dense: DataFrame, keyCol: String, dayCol: String,
                      centsCol: String, holdback: Int): DataFrame = {
    val bounds = dense.agg(max(col(dayCol)).as("__hi"))
      .select(date_sub(col("__hi"), holdback).as("__cutoff"))
    val withCut = dense.crossJoin(broadcast(bounds))
    val eval = withCut
      .filter(col(dayCol) > col("__cutoff") &&
        datediff(col(dayCol), col("__cutoff")) <= Horizon)
      .select(col(keyCol).as("__key"), col(dayCol).as("__d"),
        col(centsCol).as("__actual"))
    val hist = dense.select(col(keyCol).as("__hkey"),
      col(dayCol).as("__hd"), col(centsCol).as("__yhat"))
    eval.join(hist, eval("__key") === hist("__hkey") &&
        eval("__d") === date_add(col("__hd"), 7))
      .select(col("__key"), col("__yhat"), col("__actual"))
  }

  /** Pool fold errors per key into one exact MAE. */
  private def cvMae(folds: Seq[DataFrame], out: String): DataFrame =
    folds.reduce(_ unionByName _)
      .groupBy(col("__key"))
      .agg((sum("__sae") / sum("__n")).as(out),
        sum("__n").as(s"__n_$out"))

  /** CV leaderboard over a dense per-key daily series:
    * (key, n_eval, mae_sn_cents, mae_hw_cents, mae_theta_cents,
    * best_model, best_mae_cents) with MAEs pooled across
    * [[FoldHoldbacks]]. */
  def leaderboard(dense: DataFrame, keyCol: String, dayCol: String,
                  centsCol: String): DataFrame = {
    val hw = cvMae(FoldHoldbacks.map(h => foldErr(
      HoltWinters.forecastFrame(dense, keyCol, dayCol, centsCol,
        season = 7, horizon = Horizon, holdback = h))), "mae_hw_cents")
    val th = cvMae(FoldHoldbacks.map(h => foldErr(
      Theta.forecastFrame(dense, keyCol, dayCol, centsCol,
        horizon = Horizon, holdback = h))), "mae_theta_cents")
    val sn = cvMae(FoldHoldbacks.map(h => foldErr(
      snFrame(dense, keyCol, dayCol, centsCol, h)
        .withColumn("__k", lit(0)))), "mae_sn_cents")
    hw.join(th, "__key").join(sn, "__key")
      .select(col("__key").as(keyCol),
        col("__n_mae_hw_cents").as("n_eval"),
        col("mae_sn_cents"), col("mae_hw_cents"), col("mae_theta_cents"),
        when(col("mae_hw_cents") <= col("mae_theta_cents") &&
             col("mae_hw_cents") <= col("mae_sn_cents"), lit("holt_winters"))
          .when(col("mae_theta_cents") <= col("mae_sn_cents"), lit("theta"))
          .otherwise(lit("seasonal_naive")).as("best_model"),
        least(col("mae_hw_cents"), col("mae_theta_cents"),
          col("mae_sn_cents")).as("best_mae_cents"))
  }

  // ---- query-map entry (hash-gated) ----

  def forecastCvEvents(spark: SparkSession, dir: String): DataFrame = {
    val dense = Resample
      .dailySpineFill(Tables.events(spark, dir), "user_id", "ts", "value")
      .select(col("key").as("user_id"), col("day"), col("cents"))
      .localCheckpoint() // pinned once, read by 3 folds × 3 models
    leaderboard(dense, "user_id", "day", "cents")
  }

  /** Composed oracle: the HW recursive chain + Theta CTEs instantiated
    * at each fold's holdback (suffix f1/f2/f3 — the ForecastPredict
    * multi-suffix discipline), a seasonal-naive err CTE per fold over
    * the shared dense spine, pooled by exact integer sums. */
  def oracleSql: String = {
    val folds = FoldHoldbacks.zipWithIndex.map { case (h, i) => (h, s"f${i + 1}") }
    val perFold = folds.map { case (h, sfx) =>
      s"""${HoltWinters.oracleCtePrefix(holdback = h, sfx = sfx, horizon = Horizon)},
         |${Theta.oracleCtes(sfx = sfx, horizon = Horizon)},
         |hwerr$sfx AS (
         |  SELECT p.user_id, CAST(sum(abs(e.cents - p.yhat)) AS BIGINT) AS sae,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM preds$sfx p JOIN ev$sfx e ON e.user_id = p.user_id AND e.k = p.k
         |  GROUP BY p.user_id),
         |therr$sfx AS (
         |  SELECT p.user_id, CAST(sum(abs(e.cents - p.yhat)) AS BIGINT) AS sae,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM tpreds$sfx p JOIN ev$sfx e ON e.user_id = p.user_id AND e.k = p.k
         |  GROUP BY p.user_id),
         |snerr$sfx AS (
         |  SELECT e.user_id, CAST(sum(abs(e.cents - h.cents)) AS BIGINT) AS sae,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM ev$sfx e
         |  JOIN cut$sfx c ON true
         |  JOIN dense$sfx h
         |    ON h.user_id = e.user_id AND h.day = c.cutoff + e.k - 7
         |  GROUP BY e.user_id)""".stripMargin
    }.mkString(",\n")
    def pool(model: String, out: String): String = {
      val u = folds.map { case (_, sfx) =>
        s"SELECT user_id, sae, n FROM $model$sfx" }.mkString(" UNION ALL ")
      s"""${model}cv AS (
         |  SELECT user_id, CAST(sum(sae) AS DOUBLE) / sum(n) AS $out,
         |    CAST(sum(n) AS BIGINT) AS n_pool
         |  FROM ($u) GROUP BY user_id)""".stripMargin
    }
    s"""WITH RECURSIVE
       |$perFold,
       |${pool("hwerr", "mae_hw_cents")},
       |${pool("therr", "mae_theta_cents")},
       |${pool("snerr", "mae_sn_cents")}
       |SELECT h.user_id, h.n_pool AS n_eval,
       |  s.mae_sn_cents, h.mae_hw_cents, t.mae_theta_cents,
       |  CASE WHEN h.mae_hw_cents <= t.mae_theta_cents
       |         AND h.mae_hw_cents <= s.mae_sn_cents THEN 'holt_winters'
       |       WHEN t.mae_theta_cents <= s.mae_sn_cents THEN 'theta'
       |       ELSE 'seasonal_naive' END AS best_model,
       |  least(h.mae_hw_cents, t.mae_theta_cents, s.mae_sn_cents)
       |    AS best_mae_cents
       |FROM hwerrcv h JOIN therrcv t USING (user_id)
       |  JOIN snerrcv s USING (user_id)""".stripMargin
  }
}
