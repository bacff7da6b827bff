package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Theta-method forecast backtest — the third candidate model of the
  * reference's per-series tuning loop
  * (/root/reference/MachineLearning/Kubernetes/src/stats_forecast_tune.py:
  * 47-60 tunes AutoETS/AutoARIMA/Theta; this is the Theta leg).
  *
  * Standard Theta(0, 2) core (Assimakopoulos & Nikolopoulos 2000;
  * Hyndman & Billah 2003 show it equals SES-with-drift at HALF the
  * fitted linear-trend slope): the theta-2 line doubles the curvature
  * and is smoothed by SES; the theta-0 line is the OLS trend; the
  * forecast averages the two, giving
  *   ŷ_{T+k} = ℓ_T + k · slope/2,   slope = (12·Σt·y − 6(T+1)·Σy) / (T(T+1)(T−1))
  * with ℓ the SES level at dyadic α = 1/2.
  *
  * Exactness discipline as [[HoltWinters]]: integer cents, the SES
  * recursion ℓ_t = ⌊(y_t + ℓ_{t−1})/2⌋ in explicit floor division, and
  * the drift term ⌊k·num / den⌋ kept as one exact integer rational
  * (num = 12Σty − 6(T+1)Σy, den = 2T(T+1)(T−1) — the extra 2 is the
  * theta halving), so the whole model sits inside a DuckDB hash gate.
  * Keys with T < 2 are DROPPED on both engines (no slope exists).
  *
  * Scale shape: identical to [[HoltWinters]] — corpus touched once by
  * the daily aggregate, per-key state is O(days) (calendar-bounded),
  * sums/SES fold over the collected daily array, forecasts are a
  * closed-form map, evaluation one equi-join at spine cardinality.
  */
object Theta {

  /** Floor division with an EXPRESSION divisor (must be > 0): subtract
    * the positive mod so truncation equals floor — same decomposition as
    * the DuckDB oracle. */
  private def fd(e: String, d: String): String =
    s"((($e) - pmod(($e), $d)) div ($d))"

  /** Per-step forecast frame over a DENSE per-key daily series (see
    * [[Resample.dailySpineFill]]): fit on days ≤ max_day − `holdback`,
    * forecast `horizon` steps, join each step to its actual. Returns
    * (__key, __k, __yhat, __actual). */
  def forecastFrame(dense: DataFrame, keyCol: String, dayCol: String,
                    centsCol: String, horizon: Int,
                    holdback: Int): DataFrame = {
    require(horizon <= holdback, "every forecast day must be observed")
    val bounds = dense.agg(max(col(dayCol)).as("__hi"))
      .select(date_sub(col("__hi"), holdback).as("__cutoff"))
    val withCut = dense.crossJoin(broadcast(bounds))
    val testRows = withCut
      .filter(col(dayCol) > col("__cutoff") &&
        datediff(col(dayCol), col("__cutoff")) <= horizon)
      .select(col(keyCol).as("__key"),
        datediff(col(dayCol), col("__cutoff")).as("__k"),
        col(centsCol).as("__actual"))

    val preds = endState(dense, keyCol, dayCol, centsCol, holdback)
      .select(col("__key"), explode(expr(
        s"transform(sequence(1, $horizon), k -> named_struct(" +
          "'k', CAST(k AS INT), " +
          s"'yhat', __l + ${fd("CAST(k AS BIGINT) * __num", "__den")}))"))
        .as("__p"))
      .select(col("__key"), col("__p.k").as("__k"), col("__p.yhat").as("__yhat"))

    preds.join(testRows, Seq("__key", "__k"))
  }

  /** The fitted end state per key — (__key, __l SES level, __num/__den
    * exact drift rational) — fit on days ≤ max(day) − `holdback`.
    * Exposed so [[graft.operators.ForecastPredict]] can persist the
    * parameters and forecast later with ZERO refit scans. */
  def endState(dense: DataFrame, keyCol: String, dayCol: String,
               centsCol: String, holdback: Int): DataFrame = {
    val bounds = dense.agg(max(col(dayCol)).as("__hi"))
      .select(date_sub(col("__hi"), holdback).as("__cutoff"))
    val withCut = dense.crossJoin(broadcast(bounds))
    val train = withCut.filter(col(dayCol) <= col("__cutoff"))

    // per-key ordered series; T < 2 dropped (slope undefined — the
    // oracle's HAVING max(t) >= 2 drops the same keys)
    val ser = train.groupBy(col(keyCol).as("__key"))
      .agg(expr(s"transform(sort_array(collect_list(struct($dayCol, $centsCol))), x -> x.$centsCol)")
        .as("__ys"))
      .filter(expr("size(__ys) >= 2"))
      .withColumn("__T", expr("CAST(size(__ys) AS BIGINT)"))
      // exact OLS ingredients: Σy and Σt·y via one indexed fold
      .withColumn("__sy", expr(
        "aggregate(__ys, CAST(0 AS BIGINT), (a, y) -> a + y)"))
      .withColumn("__sty", expr(
        "aggregate(__ys, named_struct('i', CAST(0 AS BIGINT), 'a', CAST(0 AS BIGINT)), " +
          "(st, y) -> named_struct('i', st.i + 1, 'a', st.a + (st.i + 1) * y)).a"))
      .withColumn("__num", expr("12 * __sty - 6 * (__T + 1) * __sy"))
      .withColumn("__den", expr("2 * __T * (__T + 1) * (__T - 1)"))
      // SES level at α = 1/2: fold the tail over the first element
      .withColumn("__l", expr(
        s"aggregate(slice(__ys, 2, size(__ys) - 1), element_at(__ys, 1), " +
          s"(l, y) -> ${fd("l + y", "2")})"))
    ser.select(col("__key"), col("__l"), col("__num"), col("__den"))
  }

  /** Backtest: forecast the last `horizon` days, exact MAE/bias vs
    * actuals. Returns (key, n_eval, mae_cents, bias_cents). */
  def backtest(dense: DataFrame, keyCol: String, dayCol: String,
               centsCol: String, horizon: Int): DataFrame =
    forecastFrame(dense, keyCol, dayCol, centsCol, horizon,
        holdback = horizon)
      .groupBy(col("__key").as(keyCol))
      .agg(count(lit(1)).as("n_eval"),
        (sum(abs(col("__actual") - col("__yhat"))) / count(lit(1))).as("mae_cents"),
        (sum(col("__actual") - col("__yhat")) / count(lit(1))).as("bias_cents"))

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-user daily cents on the zero-filled spine,
    * 7-day holdout — same series as the Holt-Winters gate, so the
    * leaderboard compares models on identical data. */
  def thetaEvents(spark: SparkSession, dir: String): DataFrame =
    backtest(
      Resample.dailySpineFill(Tables.events(spark, dir), "user_id", "ts", "value")
        .select(col("key").as("user_id"), col("day"), col("cents")),
      "user_id", "day", "cents", horizon = 7)
      .select("user_id", "n_eval", "mae_cents", "bias_cents")

  /** Theta-specific CTEs over [[HoltWinters.oracleSeriesCtes]]'s shared
    * chain (`train`/`ev`): the SES recursion, the exact OLS sums, and
    * the closed-form drift forecast. Final CTE `tpreds$sfx` carries
    * (user_id, k, yhat). */
  def oracleCtes(sfx: String = "", horizon: Int = 7): String = {
    def fdx(e: String, d: String): String =
      s"((($e) - ((($e) % ($d)) + ($d)) % ($d)) // ($d))"
    s"""sesrec$sfx AS (
       |  SELECT user_id, CAST(1 AS BIGINT) AS t, cents AS l
       |  FROM train$sfx WHERE t = 1
       |  UNION ALL
       |  SELECT r.user_id, r.t + 1, ${fdx("r.l + y.cents", "2")}
       |  FROM sesrec$sfx r JOIN train$sfx y
       |    ON y.user_id = r.user_id AND y.t = r.t + 1),
       |tagg$sfx AS (
       |  SELECT user_id, max(t) AS tn,
       |    CAST(sum(cents) AS BIGINT) AS sy,
       |    CAST(sum(t * cents) AS BIGINT) AS sty
       |  FROM train$sfx GROUP BY user_id HAVING max(t) >= 2),
       |tfin$sfx AS (
       |  SELECT s.user_id, s.l,
       |    12 * a.sty - 6 * (a.tn + 1) * a.sy AS num,
       |    2 * a.tn * (a.tn + 1) * (a.tn - 1) AS den
       |  FROM sesrec$sfx s JOIN tagg$sfx a
       |    ON s.user_id = a.user_id AND s.t = a.tn),
       |tpreds$sfx AS (
       |  SELECT f.user_id, CAST(k AS INT) AS k,
       |    f.l + ${fdx("CAST(k AS BIGINT) * f.num", "f.den")} AS yhat
       |  FROM tfin$sfx f, unnest(generate_series(1, $horizon)) AS u(k))""".stripMargin
  }

  /** Same model as a recursive CTE + exact integer rationals. */
  def oracleSql: String =
    s"""WITH RECURSIVE
       |${HoltWinters.oracleSeriesCtes()},
       |${oracleCtes()}
       |SELECT p.user_id, count(*) AS n_eval,
       |  CAST(sum(abs(e.cents - p.yhat)) AS DOUBLE) / count(*) AS mae_cents,
       |  CAST(sum(e.cents - p.yhat) AS DOUBLE) / count(*) AS bias_cents
       |FROM tpreds p JOIN ev e ON e.user_id = p.user_id AND e.k = p.k
       |GROUP BY p.user_id""".stripMargin
}
