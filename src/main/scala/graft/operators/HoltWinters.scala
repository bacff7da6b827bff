package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Additive Holt-Winters (triple exponential smoothing) backtest — a
  * REAL forecasting model next to [[Forecast]]'s seasonal-naive
  * baseline, at the level the reference actually operates
  * (/root/reference/MachineLearning/Kubernetes/src/stats_forecast_tune.py:
  * 47-60 tunes AutoETS/AutoARIMA/Theta per series; the ETS additive
  * family is what AutoETS fits).
  *
  * Everything runs in FIXED-POINT INTEGER arithmetic (cents) with
  * explicit floor division, so the recursion is bit-identical in any
  * engine — the pagerank_trade discipline applied to exponential
  * smoothing — and the whole model sits inside a DuckDB hash gate
  * (recursive CTE carrying (level, trend, seasonal-list) state).
  * Smoothing weights are the dyadic rationals α=1/2, β=1/4, γ=1/2:
  *   l_t = ⌊(y_t − s_{t−m} + l_{t−1} + b_{t−1}) / 2⌋
  *   b_t = b_{t−1} + ⌊(l_t − l_{t−1} − b_{t−1}) / 4⌋
  *   s_t = s_{t−m} + ⌊(y_t − l_t − s_{t−m}) / 2⌋
  * with l_0 = ⌊mean of first m⌋, b_0 = 0, s_i = y_i − l_0.
  *
  * Scale shape: the corpus is touched ONCE by the daily aggregate; the
  * spine/zero-fill runs at |keys|·|days| ([[Resample]] machinery); the
  * recursion itself runs per key over its COLLECTED daily array — a
  * series' length is calendar-bounded (days in the window), never
  * data-volume-bounded, so the per-key array and the interpreted
  * `aggregate` lambda stay O(days) at any corpus size. Forecasts are a
  * closed-form map over the end state; evaluation is one equi-join at
  * spine cardinality and exact integer MAE/bias.
  */
object HoltWinters {

  /** Floor division as SQL text — Spark `div` truncates toward zero,
    * so subtract the positive mod first; DuckDB's oracle uses the same
    * decomposition, making negatives bit-identical cross-engine. */
  private def fd(e: String, d: Int): String =
    s"((($e) - pmod(($e), $d)) div $d)"

  /** Per-step forecast frame: fit on each key's dense daily series up
    * to max_day − `holdback`, forecast `horizon` steps from the end
    * state, join each step's prediction to the actual on that day.
    * Requires horizon ≤ season (forecast seasonal index stays within
    * one cycle) and horizon ≤ holdback (every forecast day observed).
    * Input must be DENSE per key ([[Resample.dailySpineFill]]).
    * Returns (__key, __k, __yhat, __actual). The backtest uses
    * holdback = horizon; [[ForecastIntervals]] calibrates on an earlier
    * window via holdback = 2·horizon. */
  def forecastFrame(dense: DataFrame, keyCol: String, dayCol: String,
                    centsCol: String, season: Int, horizon: Int,
                    holdback: Int): DataFrame = {
    require(horizon <= season, "horizon must be ≤ season")
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

    // closed-form h-step forecast off the end state: ŷ_{T+k} = l + k·b + s_k
    val preds = endState(dense, keyCol, dayCol, centsCol, season, holdback)
      .select(col("__key"), explode(expr(
        s"transform(sequence(1, $horizon), k -> named_struct(" +
          "'k', CAST(k AS INT), " +
          "'yhat', __st.l + CAST(k AS BIGINT) * __st.b + element_at(__st.s, CAST(k AS INT))))"))
        .as("__p"))
      .select(col("__key"), col("__p.k").as("__k"), col("__p.yhat").as("__yhat"))

    preds.join(testRows, Seq("__key", "__k"))
  }

  /** The fitted end state per key — (__key, __st struct(l, b, s list)) —
    * fit on days ≤ max(day) − `holdback`. Exposed so
    * [[graft.operators.ForecastPredict]] can persist the parameters and
    * forecast later with ZERO refit scans. */
  def endState(dense: DataFrame, keyCol: String, dayCol: String,
               centsCol: String, season: Int, holdback: Int): DataFrame = {
    val m = season
    val bounds = dense.agg(max(col(dayCol)).as("__hi"))
      .select(date_sub(col("__hi"), holdback).as("__cutoff"))
    val withCut = dense.crossJoin(broadcast(bounds))
    val train = withCut.filter(col(dayCol) <= col("__cutoff"))

    // per-key ordered series (calendar-bounded array). Keys whose train
    // span is shorter than one season are DROPPED, not errored: the
    // init seasonal list would have < m entries, so the forecast's
    // element_at(s, k) would throw INVALID_ARRAY_INDEX under ANSI mode —
    // while the DuckDB oracle silently drops them (its recursion anchors
    // at t = m, so a key with tmax < m never reaches `fin`). Filtering
    // here makes short-span inputs degrade identically on both engines.
    val ser = train.groupBy(col(keyCol).as("__key"))
      .agg(expr(s"transform(sort_array(collect_list(struct($dayCol, $centsCol))), x -> x.$centsCol)")
        .as("__ys"))
      .filter(expr(s"size(__ys) >= $m"))
      .withColumn("__l0", expr(fd(s"aggregate(slice(__ys, 1, $m), CAST(0 AS BIGINT), (a, x) -> a + x)", m)))

    // the recursion: aggregate() over the post-init steps, state =
    // (level, trend, seasonal list). l_t appears re-derived inside b/s —
    // SQL lambdas have no let-binding; the array is O(days), so the
    // recomputation is bounded.
    val lt = s"${fd(s"y - element_at(st.s, 1) + st.l + st.b", 2)}"
    val state = ser.withColumn("__st", expr(
      s"""aggregate(
         |  slice(__ys, ${m + 1}, greatest(size(__ys) - $m, 0)),
         |  named_struct(
         |    'l', __l0,
         |    'b', CAST(0 AS BIGINT),
         |    's', transform(slice(__ys, 1, $m), y -> y - __l0)),
         |  (st, y) -> named_struct(
         |    'l', $lt,
         |    'b', st.b + ${fd(s"($lt) - st.l - st.b", 4)},
         |    's', concat(slice(st.s, 2, ${m - 1}),
         |         array(element_at(st.s, 1) + ${fd(s"y - ($lt) - element_at(st.s, 1)", 2)}))))
         |""".stripMargin))
    state.select(col("__key"), col("__st"))
  }

  /** Backtest: forecast the last `horizon` observed days, exact
    * MAE/bias vs actuals. Returns (key, n_eval, mae_cents, bias_cents). */
  def backtest(dense: DataFrame, keyCol: String, dayCol: String,
               centsCol: String, season: Int, horizon: Int): DataFrame =
    forecastFrame(dense, keyCol, dayCol, centsCol, season, horizon,
        holdback = horizon)
      .groupBy(col("__key").as(keyCol))
      .agg(count(lit(1)).as("n_eval"),
        (sum(abs(col("__actual") - col("__yhat"))) / count(lit(1))).as("mae_cents"),
        (sum(col("__actual") - col("__yhat")) / count(lit(1))).as("bias_cents"))

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-user daily cents (zero-filled dense spine),
    * weekly season, 7-day holdout. */
  def holtWintersEvents(spark: SparkSession, dir: String): DataFrame =
    backtest(
      Resample.dailySpineFill(Tables.events(spark, dir), "user_id", "ts", "value")
        .select(col("key").as("user_id"), col("day"), col("cents")),
      "user_id", "day", "cents", season = 7, horizon = 7)
      .select("user_id", "n_eval", "mae_cents", "bias_cents")

  /** The recursive-CTE chain up to (and including) the `preds`/`ev`
    * CTEs — exposed separately so [[AutoForecast]] and
    * [[ForecastIntervals]] compose the shared prefix STRUCTURALLY
    * instead of substring-parsing a sibling's SQL. `holdback` is the
    * fit cutoff (hi − holdback); `sfx` suffixes every CTE name so two
    * instantiations (fit-for-calibration and fit-for-test) can coexist
    * in one statement. The final `preds$sfx`/`ev$sfx` CTEs carry
    * (user_id, k, yhat)/(user_id, k, cents) for k = 1..`horizon`.
    * `horizon` is interpolated (not hardcoded) so a caller changing the
    * gated horizon moves the oracle in lockstep with the Scala path. */
  def oracleSeriesCtes(holdback: Int = 7, sfx: String = "",
                       horizon: Int = 7): String =
    s"""b$sfx AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events),
       |cut$sfx AS (SELECT hi - $holdback AS cutoff FROM b$sfx),
       |k$sfx AS (SELECT DISTINCT user_id FROM events),
       |spine$sfx AS (
       |  SELECT user_id, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM k$sfx CROSS JOIN b$sfx),
       |d$sfx AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |dense$sfx AS (
       |  SELECT s.user_id, s.day, coalesce(d.cents, 0) AS cents
       |  FROM spine$sfx s LEFT JOIN d$sfx d USING (user_id, day)),
       |train$sfx AS (
       |  SELECT user_id, day, cents,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS t
       |  FROM dense$sfx, cut$sfx WHERE day <= cutoff),
       |tmax$sfx AS (SELECT user_id, max(t) AS tt FROM train$sfx GROUP BY user_id),
       |ev$sfx AS (
       |  SELECT a.user_id,
       |    CAST(a.day - (SELECT cutoff FROM cut$sfx) AS INT) AS k, a.cents
       |  FROM dense$sfx a, cut$sfx
       |  WHERE a.day > cut$sfx.cutoff
       |    AND a.day - cut$sfx.cutoff <= $horizon)""".stripMargin

  def oracleCtePrefix(holdback: Int = 7, sfx: String = "",
                      horizon: Int = 7): String = {
    def fdk(e: String, d: Int): String = s"((($e) - ((($e) % $d) + $d) % $d) // $d)"
    val lt = fdk("y.cents - r.s[1] + r.l + r.b", 2)
    s"""${oracleSeriesCtes(holdback, sfx, horizon)},
       |f7$sfx AS (
       |  SELECT user_id, list(cents ORDER BY day) AS ys FROM train$sfx
       |  WHERE t <= 7 GROUP BY user_id),
       |init$sfx AS (
       |  SELECT user_id, l0, list_transform(ys, y -> y - l0) AS s0
       |  FROM (SELECT user_id, ys,
       |          ${fdk("CAST(list_sum(ys) AS BIGINT)", 7)} AS l0 FROM f7$sfx)),
       |rec$sfx AS (
       |  SELECT user_id, CAST(7 AS BIGINT) AS t, l0 AS l, CAST(0 AS BIGINT) AS b, s0 AS s FROM init$sfx
       |  UNION ALL
       |  SELECT r.user_id, r.t + 1,
       |    $lt,
       |    r.b + ${fdk(s"($lt) - r.l - r.b", 4)},
       |    list_concat(r.s[2:],
       |      [r.s[1] + ${fdk(s"y.cents - ($lt) - r.s[1]", 2)}])
       |  FROM rec$sfx r JOIN train$sfx y ON y.user_id = r.user_id AND y.t = r.t + 1),
       |fin$sfx AS (
       |  SELECT r.user_id, r.l, r.b, r.s FROM rec$sfx r JOIN tmax$sfx m
       |  ON r.user_id = m.user_id AND r.t = m.tt),
       |preds$sfx AS (
       |  SELECT f.user_id, CAST(k AS INT) AS k,
       |    f.l + CAST(k AS BIGINT) * f.b + f.s[CAST(k AS INT)] AS yhat
       |  FROM fin$sfx f, unnest(generate_series(1, $horizon)) AS u(k))""".stripMargin
  }

  /** The same integer recursion as a recursive CTE carrying the
    * seasonal state as a list; floor division decomposed identically. */
  def oracleSql: String =
    s"""WITH RECURSIVE
       |${oracleCtePrefix()}
       |SELECT p.user_id, count(*) AS n_eval,
       |  CAST(sum(abs(e.cents - p.yhat)) AS DOUBLE) / count(*) AS mae_cents,
       |  CAST(sum(e.cents - p.yhat) AS DOUBLE) / count(*) AS bias_cents
       |FROM preds p JOIN ev e ON e.user_id = p.user_id AND e.k = p.k
       |GROUP BY p.user_id""".stripMargin
}
