package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Resample

/** TPE proposal over the REAL forecast family — the composition the
  * reference actually runs: hyperopt's TPE searcher minimizing a
  * forecast backtest error over model hyperparameters
  * (/root/reference/MachineLearning/TimeSeries/darts_hyperopt_workflow.py:17
  * `from hyperopt import hp, fmin, tpe` with backtest losses as the
  * objective; /root/reference/MachineLearning/Ray/timeseries/
  * neural_forecast_tune.py:6,10 pairs the same HyperOptSearch with
  * forecasting trials). [[TpeSweep]] gates the proposal KERNEL over a
  * synthetic threshold grid; this key points the identical kernel at a
  * forecasting search space.
  *
  * Search dimension: the SES level-smoothing constant α of the
  * Theta-method forecaster ([[graft.operators.Theta]] fixes α = 1/2;
  * here α = j/16 for trial j = 1..16 — a dyadic grid so the recursion
  * ℓ_t = ℓ_{t−1} + ⌊j·(y_t − ℓ_{t−1})/16⌋ stays exact-integer and
  * bit-identical cross-engine; j = 8 reproduces the gated Theta level
  * exactly). Observed objective per trial: the 7-day forecast-backtest
  * TOTAL absolute error in cents (the [[graft.operators.Forecast]]
  * MAE discipline, unnormalized so it stays BIGINT), negated so the
  * TPE good-quantile split reads "higher is better". The candidate
  * grid is α ∈ {1/64 .. 64/64} in micros with the triangular kernel at
  * two grid steps — [[TpeSweep.proposeGrid]] verbatim.
  *
  * Scale shape: the corpus is touched once by the daily aggregate
  * (event_type keys, calendar-bounded series); the 16-trial cross is a
  * broadcast over the |keys|-row series table; densities are the
  * 64×16 bounded cross of the kernel machinery. Everything downstream
  * of the daily aggregate is grid- or calendar-bounded at any corpus
  * size.
  */
object TpeForecast {

  val AlphaDen = 16     // trial grid: α = j/AlphaDen, j = 1..TrialN
  val TrialN = 16
  val BandW = 31250L    // triangular kernel half-width (2 cand steps)
  val CandLo = 15625L   // candidate grid: α micros = 15625·(1..64)
  val CandStep = 15625L
  val CandN = 64
  val Horizon = 7

  /** Floor division (expression divisor > 0): subtract the positive
    * mod so truncation equals floor — [[graft.operators.Theta]]'s
    * decomposition, agreed bit-for-bit by the DuckDB oracle. */
  private def fd(e: String, d: String): String =
    s"((($e) - pmod(($e), $d)) div ($d))"

  /** Completed trial table (config_id, threshold, obs_acc) over a
    * DENSE (key, day, cents) daily frame: config j fits the Theta
    * forecaster with SES level at α = j/16 on days ≤ max−Horizon,
    * forecasts Horizon steps (ℓ + k·drift, drift α-independent), and
    * observes −Σ|actual − ŷ| over all (key, step) eval rows. */
  def trials(dense: DataFrame): DataFrame = {
    val spark = dense.sparkSession
    import spark.implicits._
    val bounds = dense.agg(max(col("day")).as("__hi"))
      .select(date_sub(col("__hi"), Horizon).as("__cutoff"))
    val withCut = dense.crossJoin(broadcast(bounds))
    val testRows = withCut
      .filter(col("day") > col("__cutoff") &&
        datediff(col("day"), col("__cutoff")) <= Horizon)
      .select(col("key").as("__key"),
        datediff(col("day"), col("__cutoff")).as("__k"),
        col("cents").as("__actual"))
    val train = withCut.filter(col("day") <= col("__cutoff"))
    // per-key ordered series + the exact α-independent OLS drift
    // rational (Theta's num/den); T < 2 dropped on both engines
    val ser = train.groupBy(col("key").as("__key"))
      .agg(expr("transform(sort_array(collect_list(struct(day, cents)))," +
        " x -> x.cents)").as("__ys"))
      .filter(expr("size(__ys) >= 2"))
      .withColumn("__T", expr("CAST(size(__ys) AS BIGINT)"))
      .withColumn("__sy", expr(
        "aggregate(__ys, CAST(0 AS BIGINT), (a, y) -> a + y)"))
      .withColumn("__sty", expr(
        "aggregate(__ys, named_struct('i', CAST(0 AS BIGINT), 'a', " +
          "CAST(0 AS BIGINT)), (st, y) -> named_struct('i', st.i + 1, " +
          "'a', st.a + (st.i + 1) * y)).a"))
      .withColumn("__num", expr("12 * __sty - 6 * (__T + 1) * __sy"))
      .withColumn("__den", expr("2 * __T * (__T + 1) * (__T - 1)"))
    val confs = (1 to TrialN).map(_.toLong).toDF("__j")
    // SES level per (key, config): one fold per pair, array O(days)
    val lvl = ser.crossJoin(broadcast(confs))
      .withColumn("__l", expr(
        s"aggregate(slice(__ys, 2, size(__ys) - 1), element_at(__ys, 1), " +
          s"(l, y) -> l + ${fd("__j * (y - l)", AlphaDen.toString)})"))
    val preds = lvl.select(col("__j"), col("__key"), explode(expr(
        s"transform(sequence(1, $Horizon), k -> named_struct(" +
          "'k', CAST(k AS INT), " +
          s"'yhat', __l + ${fd("CAST(k AS BIGINT) * __num", "__den")}))"))
        .as("__p"))
      .select(col("__j"), col("__key"),
        col("__p.k").as("__k"), col("__p.yhat").as("__yhat"))
    preds.join(testRows, Seq("__key", "__k"))
      .groupBy(col("__j"))
      .agg(sum(abs(col("__actual") - col("__yhat"))).as("__err"))
      .select(col("__j").as("config_id"),
        (col("__j") * lit(1000000L / AlphaDen)).as("threshold"),
        (-col("__err")).as("obs_acc"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-event-type daily cents on the zero-filled
    * dense spine (calendar-bounded series, a handful of keys), 16
    * α-trials backtested at horizon 7, TPE proposal over the 64-point
    * α candidate grid. */
  def tpeForecastEvents(spark: SparkSession, dir: String): DataFrame =
    TpeSweep.proposeGrid(
      trials(Resample
        .dailySpineFill(Tables.events(spark, dir), "event_type", "ts", "value")
        .select(col("key"), col("day"), col("cents"))),
      TpeSweep.Gamma, BandW, CandLo, CandStep, CandN)

  /** CLOSE the loop over the forecast objective (tpe_round2's move):
    * round 1's proposed α — a candidate OFF the 1/16 trial grid, on
    * the finer 1/64 candidate grid — is evaluated by the SAME
    * exact-integer backtest (SES recursion at ℓ += ⌊p·(y−ℓ)/64⌋ where
    * p = α_micros/15625), appended as trial 17, and the densities
    * re-score. Gated output: the round-2 scored candidate table. The
    * evaluation must run at the CANDIDATE grid's resolution — the
    * suggest→observe edge a real searcher closes. */
  def tpeForecastRound2(spark: SparkSession, dir: String): DataFrame = {
    val dense = Resample
      .dailySpineFill(Tables.events(spark, dir), "event_type", "ts", "value")
      .select(col("key"), col("day"), col("cents"))
      .localCheckpoint() // consumed by round-1 trials AND the round-2 eval
    val t1 = trials(dense).localCheckpoint() // rounds 1 and 2 + the union
    val prop1 = TpeSweep.proposeGrid(t1, TpeSweep.Gamma, BandW, CandLo,
        CandStep, CandN)
      .filter(col("proposed") === 1)
      // p = α in 64ths: cand_threshold/15625 ∈ 1..64, exact
      .select((col("cand_threshold") / lit(CandStep)).cast("long").as("__p"))
    val bounds = dense.agg(max(col("day")).as("__hi"))
      .select(date_sub(col("__hi"), Horizon).as("__cutoff"))
    val withCut = dense.crossJoin(broadcast(bounds))
    val testRows = withCut
      .filter(col("day") > col("__cutoff") &&
        datediff(col("day"), col("__cutoff")) <= Horizon)
      .select(col("key").as("__key"),
        datediff(col("day"), col("__cutoff")).as("__k"),
        col("cents").as("__actual"))
    val ser = withCut.filter(col("day") <= col("__cutoff"))
      .groupBy(col("key").as("__key"))
      .agg(expr("transform(sort_array(collect_list(struct(day, cents)))," +
        " x -> x.cents)").as("__ys"))
      .filter(expr("size(__ys) >= 2"))
      .withColumn("__T", expr("CAST(size(__ys) AS BIGINT)"))
      .withColumn("__sy", expr(
        "aggregate(__ys, CAST(0 AS BIGINT), (a, y) -> a + y)"))
      .withColumn("__sty", expr(
        "aggregate(__ys, named_struct('i', CAST(0 AS BIGINT), 'a', " +
          "CAST(0 AS BIGINT)), (st, y) -> named_struct('i', st.i + 1, " +
          "'a', st.a + (st.i + 1) * y)).a"))
      .withColumn("__num", expr("12 * __sty - 6 * (__T + 1) * __sy"))
      .withColumn("__den", expr("2 * __T * (__T + 1) * (__T - 1)"))
    val lvl = ser.crossJoin(broadcast(prop1))
      .withColumn("__l", expr(
        s"aggregate(slice(__ys, 2, size(__ys) - 1), element_at(__ys, 1), " +
          s"(l, y) -> l + ${fd("__p * (y - l)", "64")})"))
    val preds = lvl.select(col("__p"), col("__key"), explode(expr(
        s"transform(sequence(1, $Horizon), k -> named_struct(" +
          "'k', CAST(k AS INT), " +
          s"'yhat', __l + ${fd("CAST(k AS BIGINT) * __num", "__den")}))"))
        .as("__pp"))
      .select(col("__p"), col("__key"),
        col("__pp.k").as("__k"), col("__pp.yhat").as("__yhat"))
    val eval = preds.join(testRows, Seq("__key", "__k"))
      .groupBy(col("__p"))
      .agg(sum(abs(col("__actual") - col("__yhat"))).as("__err"))
      .select(lit(17L).as("config_id"),
        (col("__p") * lit(CandStep)).as("threshold"),
        (-col("__err")).as("obs_acc"))
    TpeSweep.proposeGrid(t1.unionByName(eval), TpeSweep.Gamma, BandW,
      CandLo, CandStep, CandN)
  }

  /** The same trial recursion as a recursive CTE crossed with the
    * config grid, then [[TpeSweep.proposalCtesGrid]]'s density chain. */
  private def fdx(e: String, d: String): String =
    s"((($e) - ((($e) % ($d)) + ($d)) % ($d)) // ($d))"

  /** Everything through the `obs` trial CTE — shared by both rounds. */
  private def baseCtes: String =
    s"""b AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events),
       |cut AS (SELECT hi - $Horizon AS cutoff FROM b),
       |kk AS (SELECT DISTINCT event_type FROM events),
       |spine AS (
       |  SELECT event_type, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM kk CROSS JOIN b),
       |d AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |dense AS (
       |  SELECT s.event_type, s.day, coalesce(d.cents, 0) AS cents
       |  FROM spine s LEFT JOIN d USING (event_type, day)),
       |train AS (
       |  SELECT event_type, day, cents,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS t
       |  FROM dense, cut WHERE day <= cutoff),
       |tmax AS (SELECT event_type, max(t) AS tn FROM train GROUP BY event_type HAVING max(t) >= 2),
       |ev AS (
       |  SELECT a.event_type, CAST(a.day - (SELECT cutoff FROM cut) AS INT) AS k, a.cents
       |  FROM dense a, cut
       |  WHERE a.day > cut.cutoff AND a.day - cut.cutoff <= $Horizon),
       |tagg AS (
       |  SELECT event_type, max(t) AS tn,
       |    CAST(sum(cents) AS BIGINT) AS sy,
       |    CAST(sum(t * cents) AS BIGINT) AS sty
       |  FROM train GROUP BY event_type HAVING max(t) >= 2),
       |confs AS (SELECT CAST(j AS BIGINT) AS cfg FROM generate_series(1, $TrialN) t(j)),
       |sesrec AS (
       |  SELECT c.cfg, y.event_type, CAST(1 AS BIGINT) AS t, y.cents AS l
       |  FROM train y CROSS JOIN confs c WHERE y.t = 1
       |  UNION ALL
       |  SELECT r.cfg, r.event_type, r.t + 1,
       |    r.l + ${fdx("r.cfg * (y.cents - r.l)", AlphaDen.toString)}
       |  FROM sesrec r JOIN train y
       |    ON y.event_type = r.event_type AND y.t = r.t + 1),
       |fin AS (
       |  SELECT s.cfg, s.event_type, s.l,
       |    12 * a.sty - 6 * (a.tn + 1) * a.sy AS num,
       |    2 * a.tn * (a.tn + 1) * (a.tn - 1) AS den
       |  FROM sesrec s
       |  JOIN tmax m ON s.event_type = m.event_type AND s.t = m.tn
       |  JOIN tagg a ON s.event_type = a.event_type),
       |preds AS (
       |  SELECT f.cfg, f.event_type, CAST(k AS INT) AS k,
       |    f.l + ${fdx("CAST(k AS BIGINT) * f.num", "f.den")} AS yhat
       |  FROM fin f, unnest(generate_series(1, $Horizon)) AS u(k)),
       |obs AS (
       |  SELECT p.cfg AS config_id,
       |    CAST(p.cfg * ${1000000L / AlphaDen} AS BIGINT) AS threshold,
       |    CAST(-sum(abs(e.cents - p.yhat)) AS BIGINT) AS obs_acc
       |  FROM preds p JOIN ev e ON e.event_type = p.event_type AND e.k = p.k
       |  GROUP BY p.cfg)""".stripMargin
  def oracleSql: String =
    s"""WITH RECURSIVE
       |$baseCtes,
       |${TpeSweep.proposalCtesGrid("obs", "tf", TpeSweep.Gamma, BandW,
            CandLo, CandStep, CandN)}
       |${TpeSweep.proposalSelect("tf")}""".stripMargin

  /** Round 2: round 1's winner evaluated at the 1/64 grid by the same
    * recursion, appended as trial 17, densities re-scored. */
  def round2OracleSql: String =
    s"""WITH RECURSIVE
       |$baseCtes,
       |${TpeSweep.proposalCtesGrid("obs", "tf", TpeSweep.Gamma, BandW,
            CandLo, CandStep, CandN)},
       |prop1 AS (
       |  SELECT CAST(cand_threshold // $CandStep AS BIGINT) AS p FROM (
       |    SELECT cand_threshold,
       |      row_number() OVER (ORDER BY score_micros DESC, candidate_id)
       |        AS rn
       |    FROM tfscored) z
       |  WHERE rn = 1),
       |ses2 AS (
       |  SELECT pr.p AS pp, y.event_type, CAST(1 AS BIGINT) AS t,
       |    y.cents AS l
       |  FROM train y CROSS JOIN prop1 pr WHERE y.t = 1
       |  UNION ALL
       |  SELECT r.pp, r.event_type, r.t + 1,
       |    r.l + ${fdx("r.pp * (y.cents - r.l)", "64")}
       |  FROM ses2 r JOIN train y
       |    ON y.event_type = r.event_type AND y.t = r.t + 1),
       |fin2 AS (
       |  SELECT s.pp, s.event_type, s.l,
       |    12 * a.sty - 6 * (a.tn + 1) * a.sy AS num,
       |    2 * a.tn * (a.tn + 1) * (a.tn - 1) AS den
       |  FROM ses2 s
       |  JOIN tmax m ON s.event_type = m.event_type AND s.t = m.tn
       |  JOIN tagg a ON s.event_type = a.event_type),
       |preds2 AS (
       |  SELECT f.pp, f.event_type, CAST(k AS INT) AS k,
       |    f.l + ${fdx("CAST(k AS BIGINT) * f.num", "f.den")} AS yhat
       |  FROM fin2 f, unnest(generate_series(1, $Horizon)) AS u(k)),
       |ev17 AS (
       |  SELECT CAST(17 AS BIGINT) AS config_id,
       |    CAST(p.pp * $CandStep AS BIGINT) AS threshold,
       |    CAST(-sum(abs(e.cents - p.yhat)) AS BIGINT) AS obs_acc
       |  FROM preds2 p JOIN ev e
       |    ON e.event_type = p.event_type AND e.k = p.k
       |  GROUP BY p.pp),
       |trials2 AS (SELECT * FROM obs UNION ALL SELECT * FROM ev17),
       |${TpeSweep.proposalCtesGrid("trials2", "r2", TpeSweep.Gamma, BandW,
            CandLo, CandStep, CandN)}
       |${TpeSweep.proposalSelect("r2")}""".stripMargin
}
