package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** AR(2) per-series forecasting via Yule-Walker — the autoregressive
  * leg of the reference's per-series model zoo (/root/reference/
  * MachineLearning/Kubernetes/src/stats_forecast_tune.py tunes
  * AutoARIMA next to AutoETS/Theta; this is the smallest honest ARIMA
  * family member, fit in closed form from the autocovariances instead
  * of by iterative MLE).
  *
  * Yule-Walker on the mean-centered series z_t = y_t − ⌊S/T⌋:
  *   c_k = Σ z_t·z_{t+k},   k = 0, 1, 2
  *   φ₁ = c₁(c₀ − c₂) / (c₀² − c₁²),   φ₂ = (c₂c₀ − c₁²) / (c₀² − c₁²)
  * h-step forecasts by the AR recursion on deviations,
  * d_k = φ₁·d_{k−1} + φ₂·d_{k−2}, ŷ_k = μ + d_k.
  *
  * Exactness discipline ([[Theta]]/[[HoltWinters]]): integer cents,
  * autocovariances as exact BIGINT sums (DECIMAL(38,0) for the
  * quadratic forms), φ as floor-divided integer micros CLAMPED to
  * |φ| ≤ 2 (the AR(2) stationarity box; the clamp also bounds the
  * recursion's growth so every step stays inside BIGINT), and the
  * recursion re-floored to micros each step — the identical integer
  * program runs in the DuckDB oracle. Keys need T ≥ 4 and a positive
  * Cauchy-Schwarz denominator c₀² − c₁² (constant and perfectly
  * lag-1-correlated series carry no AR(2) information) — both engines
  * drop the same keys.
  *
  * Scale shape: identical to [[Theta]] — one daily aggregate touches
  * the corpus, per-key state is the calendar-bounded daily array, the
  * fit is three folds over that array, forecasts are a closed-form
  * map, evaluation one equi-join at spine cardinality.
  */
object YuleWalker {

  /** Floor division with positive divisor — the oracle's pmod
    * decomposition. */
  private def fd(e: String, d: String): String =
    s"((($e) - pmod(($e), $d)) div ($d))"

  /** Fitted AR(2) state per key over a DENSE daily series: (__key,
    * __m mean cents, __p1/__p2 clamped micros, __d1/__d2 the last two
    * deviations). Fit on days ≤ max(day) − `holdback`.
    *
    * Fully relational and codegen'd — NO array folds: a higher-order
    * `aggregate` over the collected series would re-inline the O(T)
    * mean fold per element after CollapseProject (measured 200 s at
    * sf0.1); here the mean is one grouped aggregate, the
    * autocovariances one window-lag pass + one grouped aggregate. */
  def endState(dense: DataFrame, keyCol: String, dayCol: String,
               centsCol: String, holdback: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = dense.agg(max(col(dayCol)).as("__hi"))
      .select(date_sub(col("__hi"), holdback).as("__cutoff"))
    val train = dense.crossJoin(broadcast(bounds))
      .filter(col(dayCol) <= col("__cutoff"))
      .select(col(keyCol).as("__key"), col(dayCol).as("__day"),
        col(centsCol).cast("long").as("__y"))
    val w = Window.partitionBy("__key").orderBy("__day")
    val idx = train.withColumn("__t", row_number().over(w).cast("long"))
    val means = idx.groupBy("__key")
      .agg(count(lit(1)).as("__tn"), sum(col("__y")).as("__S"))
      .filter(col("__tn") >= 4)
      .withColumn("__m", expr(fd("__S", "__tn")))
      .select("__key", "__tn", "__m")
    val z = idx.join(means, "__key")
      .withColumn("__z", col("__y") - col("__m"))
      .withColumn("__z1", lag(col("__z"), 1).over(w))
      .withColumn("__z2", lag(col("__z"), 2).over(w))
    z.groupBy(col("__key"))
      .agg(first(col("__m")).as("__m"), first(col("__tn")).as("__tn"),
        // products cast to DECIMAL(38,0) BEFORE the sum: the oracle
        // accumulates these in HUGEINT, and a BIGINT sum of z² terms
        // would wrap silently (ANSI off) on a very long/large-cents
        // series instead of matching it
        sum((col("__z").cast("decimal(38,0)")) * col("__z")).as("__c0"),
        sum((col("__z").cast("decimal(38,0)")) * col("__z1")).as("__c1"),
        sum((col("__z").cast("decimal(38,0)")) * col("__z2")).as("__c2"),
        max(when(col("__t") === col("__tn"), col("__z"))).as("__d1"),
        max(when(col("__t") === col("__tn") - 1, col("__z"))).as("__d2"))
      // quadratic forms in DECIMAL(38,0) — c ~ T·z² overflows BIGINT squared
      .withColumn("__c0d", col("__c0").cast("decimal(38,0)"))
      .withColumn("__c1d", col("__c1").cast("decimal(38,0)"))
      .withColumn("__c2d", col("__c2").cast("decimal(38,0)"))
      .withColumn("__den", expr("__c0d * __c0d - __c1d * __c1d"))
      .filter(col("__den") > 0)
      // the division stays CASE-guarded even though the filter already
      // dropped den = 0: project/filter evaluation order is not
      // guaranteed after plan collapse, and ANSI pmod(x, 0) throws
      .withColumn("__p1", expr(
        s"CASE WHEN __den > 0 THEN GREATEST(CAST(-2000000 AS BIGINT), LEAST(CAST(2000000 AS BIGINT), CAST(${fd("__c1d * (__c0d - __c2d) * 1000000", "__den")} AS BIGINT))) END"))
      .withColumn("__p2", expr(
        s"CASE WHEN __den > 0 THEN GREATEST(CAST(-2000000 AS BIGINT), LEAST(CAST(2000000 AS BIGINT), CAST(${fd("(__c2d * __c0d - __c1d * __c1d) * 1000000", "__den")} AS BIGINT))) END"))
      .select(col("__key"), col("__m"), col("__p1"), col("__p2"),
        col("__d1"), col("__d2"))
  }

  /** Backtest the last `horizon` days: (key, p1_micros, p2_micros,
    * n_eval, mae_cents, bias_cents). */
  def backtest(dense: DataFrame, keyCol: String, dayCol: String,
               centsCol: String, horizon: Int): DataFrame = {
    val bounds = dense.agg(max(col(dayCol)).as("__hi"))
      .select(date_sub(col("__hi"), horizon).as("__cutoff"))
    val testRows = dense.crossJoin(broadcast(bounds))
      .filter(col(dayCol) > col("__cutoff") &&
        datediff(col(dayCol), col("__cutoff")) <= horizon)
      .select(col(keyCol).as("__key"),
        datediff(col(dayCol), col("__cutoff")).as("__k"),
        col(centsCol).as("__actual"))
    val step = fd("__p1 * st.a + __p2 * st.b", "1000000")
    val preds = endState(dense, keyCol, dayCol, centsCol, holdback = horizon)
      .withColumn("__devs", expr(
        s"""aggregate(sequence(1, $horizon),
           |  named_struct('a', __d1, 'b', __d2,
           |    'ds', CAST(array() AS ARRAY<BIGINT>)),
           |  (st, k) -> named_struct(
           |    'a', $step, 'b', st.a,
           |    'ds', concat(st.ds, array($step))),
           |  st -> st.ds)""".stripMargin))
      .select(col("__key"), col("__p1"), col("__p2"), col("__m"),
        posexplode(col("__devs")).as(Seq("__pos", "__d")))
      .select(col("__key"), col("__p1"), col("__p2"),
        (col("__pos") + 1).as("__k"), (col("__m") + col("__d")).as("__yhat"))
    preds.join(testRows, Seq("__key", "__k"))
      .groupBy(col("__key").as(keyCol))
      .agg(first(col("__p1")).as("p1_micros"),
        first(col("__p2")).as("p2_micros"),
        count(lit(1)).as("n_eval"),
        (sum(abs(col("__actual") - col("__yhat"))) / count(lit(1))).as("mae_cents"),
        (sum(col("__actual") - col("__yhat")) / count(lit(1))).as("bias_cents"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-user daily cents on the zero-filled spine,
    * 7-day holdout — the same series as the Holt-Winters/Theta gates,
    * so the leaderboard compares AR(2) on identical data. */
  def yuleWalkerEvents(spark: SparkSession, dir: String): DataFrame =
    backtest(
      Resample.dailySpineFill(Tables.events(spark, dir), "user_id", "ts", "value")
        .select(col("key").as("user_id"), col("day"), col("cents")),
      "user_id", "day", "cents", horizon = 7)
      .select("user_id", "p1_micros", "p2_micros", "n_eval", "mae_cents",
        "bias_cents")

  /** The AR(2) CTE chain over [[HoltWinters.oracleSeriesCtes]]'s shared
    * `train$sfx`/`ev$sfx`, yw-prefixed so it composes next to the HW
    * (`preds`) and Theta (`tpreds`) chains in one statement. Final CTE
    * `ywpreds$sfx` carries (user_id, k, yhat, p1, p2). */
  def oracleCtes(sfx: String = "", horizon: Int = 7): String = {
    def fdx(e: String, d: String): String =
      s"((($e) - ((($e) % ($d)) + ($d)) % ($d)) // ($d))"
    s"""ywagg$sfx AS (
       |  SELECT user_id, max(t) AS tn, CAST(sum(cents) AS BIGINT) AS s
       |  FROM train$sfx GROUP BY user_id HAVING max(t) >= 4),
       |ywm$sfx AS (SELECT user_id, tn, ${fdx("s", "tn")} AS m FROM ywagg$sfx),
       |ywz$sfx AS (
       |  SELECT t.user_id, t.t, t.cents - m.m AS z, m.m, m.tn
       |  FROM train$sfx t JOIN ywm$sfx m USING (user_id)),
       |ywc0$sfx AS (SELECT user_id, CAST(sum(z * z) AS HUGEINT) AS c0
       |  FROM ywz$sfx GROUP BY user_id),
       |ywc1$sfx AS (SELECT a.user_id, CAST(sum(a.z * b.z) AS HUGEINT) AS c1
       |  FROM ywz$sfx a JOIN ywz$sfx b
       |    ON b.user_id = a.user_id AND b.t = a.t + 1
       |  GROUP BY a.user_id),
       |ywc2$sfx AS (SELECT a.user_id, CAST(sum(a.z * b.z) AS HUGEINT) AS c2
       |  FROM ywz$sfx a JOIN ywz$sfx b
       |    ON b.user_id = a.user_id AND b.t = a.t + 2
       |  GROUP BY a.user_id),
       |ywphi$sfx AS (
       |  SELECT ywc0$sfx.user_id,
       |    GREATEST(CAST(-2000000 AS HUGEINT), LEAST(CAST(2000000 AS HUGEINT),
       |      ${fdx("c1 * (c0 - c2) * 1000000", "c0 * c0 - c1 * c1")})) AS p1,
       |    GREATEST(CAST(-2000000 AS HUGEINT), LEAST(CAST(2000000 AS HUGEINT),
       |      ${fdx("(c2 * c0 - c1 * c1) * 1000000", "c0 * c0 - c1 * c1")})) AS p2
       |  FROM ywc0$sfx JOIN ywc1$sfx USING (user_id) JOIN ywc2$sfx USING (user_id)
       |  WHERE c0 * c0 - c1 * c1 > 0),
       |ywseed$sfx AS (
       |  SELECT z1.user_id, z1.z AS d1, z2.z AS d2, z1.m
       |  FROM ywz$sfx z1 JOIN ywz$sfx z2
       |    ON z2.user_id = z1.user_id AND z2.t = z1.tn - 1
       |  WHERE z1.t = z1.tn),
       |ywrec$sfx AS (
       |  SELECT s.user_id, 0 AS k, CAST(s.d1 AS HUGEINT) AS a,
       |    CAST(s.d2 AS HUGEINT) AS b, s.m, p.p1, p.p2
       |  FROM ywseed$sfx s JOIN ywphi$sfx p USING (user_id)
       |  UNION ALL
       |  SELECT user_id, k + 1, ${fdx("p1 * a + p2 * b", "1000000")}, a, m, p1, p2
       |  FROM ywrec$sfx WHERE k < $horizon),
       |ywpreds$sfx AS (
       |  SELECT user_id, k, CAST(m + a AS BIGINT) AS yhat,
       |    CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2
       |  FROM ywrec$sfx WHERE k >= 1)""".stripMargin
  }

  def oracleSql: String =
    s"""WITH RECURSIVE
       |${HoltWinters.oracleSeriesCtes()},
       |${oracleCtes()}
       |SELECT p.user_id,
       |  CAST(min(p.p1) AS BIGINT) AS p1_micros,
       |  CAST(min(p.p2) AS BIGINT) AS p2_micros,
       |  count(*) AS n_eval,
       |  CAST(sum(abs(e.cents - p.yhat)) AS DOUBLE) / count(*) AS mae_cents,
       |  CAST(sum(e.cents - p.yhat) AS DOUBLE) / count(*) AS bias_cents
       |FROM ywpreds p JOIN ev e ON e.user_id = p.user_id AND e.k = p.k
       |GROUP BY p.user_id""".stripMargin
}
