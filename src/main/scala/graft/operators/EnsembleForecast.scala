package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Backtest-weighted forecast ensembling — the combination step of the
  * reference's production forecasting path
  * (/root/reference/MachineLearning/TimeSeries/darts_single_runs_ensemble_stats.py:
  * 268-307 fits a `RegressionEnsembleModel` over the tuned candidate
  * models and grades the blend; the statsforecast loop the Kubernetes
  * job runs picks per-series winners the same way). [[AutoForecast]]
  * SELECTS one winner per series; this operator COMBINES all three
  * exact candidate chains ([[Forecast]] seasonal-naive, [[HoltWinters]]
  * additive ETS, [[Theta]] SES-with-drift) with weights earned on a
  * held-out calibration window — the standard "inverse validation
  * error" linear opinion pool.
  *
  * Exactness discipline: per series, fit every model at holdback = 2h
  * and score the CALIBRATION window (hi−2h, hi−h] with integer SAE
  * (cents). Weights are inverse-(SAE+1) — the +1 Laplace floor keeps a
  * perfect model finite while still concentrating ~98%+ of the mass on
  * it — carried as exact integer rationals: with three models,
  * wᵢ ∝ Πⱼ≠ᵢ(SAEⱼ+1), denominator = Σ of the three pair products, all
  * in DECIMAL(38,0). Micro-weights are floor((10⁶·num)/den) plus a
  * LARGEST-REMAINDER round so the three weights sum to exactly 10⁶ on
  * both engines (remainder ties broken by the fixed model order
  * holt_winters < theta < seasonal_naive — the [[AutoForecast]] tie
  * order). The TEST window (holdback = h) blend is
  * ŷ_ens = ⌊(w_sn·ŷ_sn + w_hw·ŷ_hw + w_th·ŷ_th)/10⁶⌋ in explicit
  * positive-mod floor division, so the whole ensemble sits inside one
  * DuckDB hash gate composed from the models' already-gated CTE chains.
  *
  * By convexity of |·|, MAE_ens ≤ Σᵢ wᵢ·MAE_ᵢ/10⁶ ≤ maxᵢ MAE_ᵢ (+1
  * cent of floor slack) — spec-asserted per key.
  *
  * Scale shape: the dense spine is built once (localCheckpoint) and
  * each model pass inherits its own audited shape (corpus touched once
  * by the daily aggregate; per-key state calendar-bounded); the weight
  * frame is 3 rows per key with a 3-row window rank; the blend is one
  * equi-join at (key × h) cardinality. Nothing new shuffles at corpus
  * cardinality.
  */
object EnsembleForecast {

  private val d38 = "decimal(38,0)"

  /** Seasonal-naive per-step forecast frame on a DENSE per-key daily
    * series, aligned with [[HoltWinters.forecastFrame]]'s contract:
    * fit cutoff = max(day) − holdback, ŷ(cutoff+k) = y(cutoff+k−season)
    * for k = 1..horizon (requires horizon ≤ season so every source day
    * is in the train span). Returns (__key, __k, __yhat, __actual). */
  def snForecastFrame(dense: DataFrame, keyCol: String, dayCol: String,
                      centsCol: String, season: Int, horizon: Int,
                      holdback: Int): DataFrame = {
    require(horizon <= season, "horizon must be ≤ season")
    require(horizon <= holdback, "every forecast day must be observed")
    val bounds = dense.agg(max(col(dayCol)).as("__hi"))
      .select(date_sub(col("__hi"), holdback).as("__cutoff"))
    val withCut = dense.crossJoin(broadcast(bounds))
    val kSrc = datediff(col(dayCol), col("__cutoff")) + lit(season)
    val preds = withCut
      .filter(kSrc >= 1 && kSrc <= horizon)
      .select(col(keyCol).as("__key"), kSrc.as("__k"),
        col(centsCol).as("__yhat"))
    val testRows = withCut
      .filter(col(dayCol) > col("__cutoff") &&
        datediff(col(dayCol), col("__cutoff")) <= horizon)
      .select(col(keyCol).as("__key"),
        datediff(col(dayCol), col("__cutoff")).as("__k"),
        col(centsCol).as("__actual"))
    preds.join(testRows, Seq("__key", "__k"))
  }

  /** Per-key integer micro-weights from calibration SAEs: inverse
    * (SAE+1) as exact pair-product rationals, floored to micros, with
    * the largest-remainder correction so the three weights sum to
    * exactly 10⁶. Input: (__key, __sae_sn, __sae_hw, __sae_th).
    * Output: (__key, w_sn_micros, w_hw_micros, w_theta_micros). */
  def microWeights(cal: DataFrame): DataFrame = {
    val base = cal.select(col("__key"),
      expr(s"CAST(__sae_sn + 1 AS $d38)").as("__ssn"),
      expr(s"CAST(__sae_hw + 1 AS $d38)").as("__shw"),
      expr(s"CAST(__sae_th + 1 AS $d38)").as("__sth"))
      .withColumn("__den",
        expr("__shw * __sth + __ssn * __sth + __ssn * __shw"))
    // 3 rows per key: (model, fixed tie priority, inverse-weight numerator)
    val rows3 = base.select(col("__key"), col("__den"), expr(
      """explode(array(
        |  named_struct('model', 'holt_winters',   'prio', 1, 'num', __ssn * __sth),
        |  named_struct('model', 'theta',          'prio', 2, 'num', __ssn * __shw),
        |  named_struct('model', 'seasonal_naive', 'prio', 3, 'num', __shw * __sth)))
        |""".stripMargin).as("__m"))
      .select(col("__key"), col("__den"),
        col("__m.model").as("__model"), col("__m.prio").as("__prio"),
        col("__m.num").as("__num"))
      .withColumn("__scaled", expr(s"CAST(1000000 AS $d38) * __num"))
      .withColumn("__fw", expr("(__scaled - pmod(__scaled, __den)) div __den"))
      .withColumn("__rem", expr(s"__scaled - CAST(__fw AS $d38) * __den"))
    val byKey = Window.partitionBy(col("__key"))
    val rank = Window.partitionBy(col("__key"))
      .orderBy(col("__rem").desc, col("__prio"))
    val w = rows3
      .withColumn("__leftover", lit(1000000L) - sum(col("__fw")).over(byKey))
      .withColumn("__r", row_number().over(rank))
      .withColumn("__w",
        col("__fw") + when(col("__r") <= col("__leftover"), 1L).otherwise(0L))
    w.groupBy(col("__key"))
      .agg(
        max(when(col("__model") === "seasonal_naive", col("__w"))).as("w_sn_micros"),
        max(when(col("__model") === "holt_winters", col("__w"))).as("w_hw_micros"),
        max(when(col("__model") === "theta", col("__w"))).as("w_theta_micros"))
  }

  /** Full ensemble backtest over a DENSE daily series. Returns per key:
    * the three micro-weights, n_eval, each member's exact test-window
    * MAE, and the ensemble's. */
  def ensembleBacktest(dense: DataFrame, keyCol: String, dayCol: String,
                       centsCol: String, season: Int,
                       horizon: Int): DataFrame = {
    val h = horizon
    def saeOf(frame: DataFrame, name: String): DataFrame =
      frame.groupBy(col("__key"))
        .agg(sum(abs(col("__actual") - col("__yhat"))).as(s"__sae_$name"))
    val cal = saeOf(snForecastFrame(dense, keyCol, dayCol, centsCol,
        season, h, holdback = 2 * h), "sn")
      .join(saeOf(HoltWinters.forecastFrame(dense, keyCol, dayCol, centsCol,
        season, h, holdback = 2 * h), "hw"), "__key")
      .join(saeOf(Theta.forecastFrame(dense, keyCol, dayCol, centsCol,
        h, holdback = 2 * h), "th"), "__key")
    val weights = microWeights(cal)

    val tSn = snForecastFrame(dense, keyCol, dayCol, centsCol, season, h,
        holdback = h)
      .select(col("__key"), col("__k"), col("__yhat").as("__ysn"),
        col("__actual"))
    val tHw = HoltWinters.forecastFrame(dense, keyCol, dayCol, centsCol,
        season, h, holdback = h)
      .select(col("__key"), col("__k"), col("__yhat").as("__yhw"))
    val tTh = Theta.forecastFrame(dense, keyCol, dayCol, centsCol, h,
        holdback = h)
      .select(col("__key"), col("__k"), col("__yhat").as("__yth"))

    val blend = tSn.join(tHw, Seq("__key", "__k"))
      .join(tTh, Seq("__key", "__k"))
      .join(weights, "__key")
      .withColumn("__wsum", expr(
        s"""CAST(w_sn_micros AS $d38) * __ysn
           | + CAST(w_hw_micros AS $d38) * __yhw
           | + CAST(w_theta_micros AS $d38) * __yth""".stripMargin))
      .withColumn("__yens", expr(
        s"(__wsum - pmod(__wsum, CAST(1000000 AS $d38))) div CAST(1000000 AS $d38)"))

    blend.groupBy(col("__key").as(keyCol))
      .agg(
        first(col("w_sn_micros")).as("w_sn_micros"),
        first(col("w_hw_micros")).as("w_hw_micros"),
        first(col("w_theta_micros")).as("w_theta_micros"),
        count(lit(1)).as("n_eval"),
        (sum(abs(col("__actual") - col("__ysn"))) / count(lit(1))).as("mae_sn_cents"),
        (sum(abs(col("__actual") - col("__yhw"))) / count(lit(1))).as("mae_hw_cents"),
        (sum(abs(col("__actual") - col("__yth"))) / count(lit(1))).as("mae_theta_cents"),
        (sum(abs(col("__actual") - col("__yens"))) / count(lit(1))).as("mae_ens_cents"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-user daily cents on the zero-filled dense
    * spine (the same series every other forecast gate fits), weekly
    * season, 7-day calibration + 7-day test. */
  def ensembleForecastEvents(spark: SparkSession, dir: String): DataFrame = {
    val dense = Resample
      .dailySpineFill(Tables.events(spark, dir), "user_id", "ts", "value")
      .select(col("key").as("user_id"), col("day"), col("cents"))
      .localCheckpoint() // six forecastFrame passes share one corpus scan
    ensembleBacktest(dense, "user_id", "day", "cents",
      season = 7, horizon = 7)
  }

  /** Composed oracle: TWO instantiations of the Holt-Winters recursive
    * CTE chain (sfx `c` = calibration fit at holdback 2h, `t` = test
    * fit at holdback h) + [[Theta.oracleCtes]] over each chain's shared
    * `train` CTE + the seasonal-naive per-step forecast read straight
    * off each chain's dense spine — then the same integer weight
    * rational, largest-remainder round, and positive-mod floor-division
    * blend. */
  def oracleSql: String = {
    val h = 7
    def snPreds(sfx: String): String =
      s"""snpreds$sfx AS (
         |  SELECT a.user_id, CAST(a.day - c.cutoff + 7 AS INT) AS k,
         |    a.cents AS yhat
         |  FROM dense$sfx a, cut$sfx c
         |  WHERE a.day - c.cutoff + 7 BETWEEN 1 AND $h)""".stripMargin
    s"""WITH RECURSIVE
       |${HoltWinters.oracleCtePrefix(holdback = 2 * h, sfx = "c", horizon = h)},
       |${Theta.oracleCtes(sfx = "c", horizon = h)},
       |${HoltWinters.oracleCtePrefix(holdback = h, sfx = "t", horizon = h)},
       |${Theta.oracleCtes(sfx = "t", horizon = h)},
       |${snPreds("c")},
       |${snPreds("t")},
       |saec AS (
       |  SELECT e.user_id,
       |    CAST(sum(abs(e.cents - sn.yhat)) AS HUGEINT) + 1 AS ssn,
       |    CAST(sum(abs(e.cents - hw.yhat)) AS HUGEINT) + 1 AS shw,
       |    CAST(sum(abs(e.cents - th.yhat)) AS HUGEINT) + 1 AS sth
       |  FROM evc e
       |  JOIN snpredsc sn ON sn.user_id = e.user_id AND sn.k = e.k
       |  JOIN predsc   hw ON hw.user_id = e.user_id AND hw.k = e.k
       |  JOIN tpredsc  th ON th.user_id = e.user_id AND th.k = e.k
       |  GROUP BY 1),
       |wrows AS (
       |  SELECT user_id, u.m AS model, u.p AS prio, u.n AS num, den
       |  FROM (
       |    SELECT user_id, shw*sth + ssn*sth + ssn*shw AS den,
       |      unnest([{'m': 'holt_winters',   'p': 1, 'n': ssn*sth},
       |              {'m': 'theta',          'p': 2, 'n': ssn*shw},
       |              {'m': 'seasonal_naive', 'p': 3, 'n': shw*sth}]) AS u
       |    FROM saec)),
       |wfloor AS (
       |  SELECT user_id, model, prio,
       |    (1000000 * num) // den AS fw,
       |    (1000000 * num) % den AS rem
       |  FROM wrows),
       |wrank AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rem DESC, prio) AS r,
       |    1000000 - sum(fw) OVER (PARTITION BY user_id) AS leftover
       |  FROM wfloor),
       |wts AS (
       |  SELECT user_id,
       |    CAST(max(CASE WHEN model = 'seasonal_naive'
       |      THEN fw + CASE WHEN r <= leftover THEN 1 ELSE 0 END END) AS BIGINT) AS w_sn,
       |    CAST(max(CASE WHEN model = 'holt_winters'
       |      THEN fw + CASE WHEN r <= leftover THEN 1 ELSE 0 END END) AS BIGINT) AS w_hw,
       |    CAST(max(CASE WHEN model = 'theta'
       |      THEN fw + CASE WHEN r <= leftover THEN 1 ELSE 0 END END) AS BIGINT) AS w_th
       |  FROM wrank GROUP BY user_id),
       |blend AS (
       |  SELECT e.user_id, e.cents AS actual,
       |    sn.yhat AS ysn, hw.yhat AS yhw, th.yhat AS yth,
       |    w.w_sn, w.w_hw, w.w_th,
       |    CAST(w.w_sn AS HUGEINT) * sn.yhat
       |      + CAST(w.w_hw AS HUGEINT) * hw.yhat
       |      + CAST(w.w_th AS HUGEINT) * th.yhat AS wsum
       |  FROM evt e
       |  JOIN snpredst sn ON sn.user_id = e.user_id AND sn.k = e.k
       |  JOIN predst   hw ON hw.user_id = e.user_id AND hw.k = e.k
       |  JOIN tpredst  th ON th.user_id = e.user_id AND th.k = e.k
       |  JOIN wts w ON w.user_id = e.user_id),
       |blend2 AS (
       |  SELECT *,
       |    (wsum - ((wsum % 1000000 + 1000000) % 1000000)) // 1000000 AS yens
       |  FROM blend)
       |SELECT user_id,
       |  max(w_sn) AS w_sn_micros,
       |  max(w_hw) AS w_hw_micros,
       |  max(w_th) AS w_theta_micros,
       |  count(*) AS n_eval,
       |  CAST(sum(abs(actual - ysn)) AS DOUBLE) / count(*) AS mae_sn_cents,
       |  CAST(sum(abs(actual - yhw)) AS DOUBLE) / count(*) AS mae_hw_cents,
       |  CAST(sum(abs(actual - yth)) AS DOUBLE) / count(*) AS mae_theta_cents,
       |  CAST(sum(abs(actual - yens)) AS DOUBLE) / count(*) AS mae_ens_cents
       |FROM blend2 GROUP BY user_id""".stripMargin
  }
}
