package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Residual and randomness diagnostics for the forecasting family —
  * the checks the reference's model-selection loop runs on a fitted
  * series before trusting it (stats_forecast_tune.py's AutoETS/
  * AutoARIMA selection reads exactly these: trend-residual
  * autocorrelation decides differencing, portmanteau whiteness decides
  * whether a fit is done): Durbin-Watson on the linear-trend
  * residuals, the Ljung-Box portmanteau over the exact ACF, and the
  * Wald-Wolfowitz runs test against the series median. Completes the
  * battery beside [[Autocorr]]/[[SeasonalDecompose]]/[[Changepoint]].
  *
  * Exactness discipline (the [[Autocorr]]/[[LeveneTest]] contract): no
  * float ever crosses an engine boundary. OLS residuals against the
  * day index stay exact integers when multiplied through by n·D
  * (D = n·Σx²−(Σx)², N_b = n·Σxy−ΣxΣy, C = Σy·D−N_b·Σx):
  *   E_i · (n·D) ⁻¹ = e_i  with  E_i = nD·y_i − n·N_b·x_i − C,
  * then residuals quantize ONCE to whole cents by truncating division
  * (Spark `div` ≡ DuckDB `//` on non-negatives, sign split by hand)
  * and every later sum/square runs in DECIMAL(38,0)/HUGEINT.
  * Headroom at the 100 TB envelope (daily cents ~10¹⁴, calendar-bounded
  * n ≤ ~2500): nD·y ≈ 10³⁰, Σe² ≤ 2.4·10³¹, and the final
  * 10⁶·Σ(Δe)² ≤ 9.6·10³⁷ — inside DECIMAL(38) with nothing to spare,
  * which is WHY residuals stay in cents rather than a finer unit.
  *
  * Scale shape: one fact→(group, day) rollup, then everything is
  * calendar-bounded (≤ types × days rows). Per-group scalars join back
  * broadcast; windows partition by event_type — no single-partition
  * window anywhere.
  */
object TsDiagnostics {

  /** (event_type, day, idx, cents) daily spine — the Autocorr cells. */
  private def dailyCells(spark: SparkSession, dir: String): DataFrame = {
    val wIdx = Window.partitionBy("event_type").orderBy("day")
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("idx", row_number().over(wIdx))
  }

  /** Durbin-Watson statistic of the OLS-detrended series, per group:
    * DW = Σ(e_t − e_{t−1})² / Σe_t² over centi-quantized exact
    * residuals; dw_permicro = (10⁶·num) div den (range 0..4·10⁶,
    * ≈2·10⁶ = white residuals). Zero-variance residuals emit NULL. */
  def durbinWatson(cells: DataFrame, groupCol: String, idxCol: String,
                   valueCol: String): DataFrame = {
    val g = col(groupCol)
    val d38 = "decimal(38,0)"
    val base = cells.select(g,
      col(idxCol).cast(d38).as("x"), col(valueCol).cast(d38).as("y"))
    val scal = base.groupBy(g).agg(
      count(lit(1)).cast(d38).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
      .withColumn("dd", expr("n * sxx - sx * sx"))
      .withColumn("nb", expr("n * sxy - sx * sy"))
      .withColumn("cc", expr("sy * dd - nb * sx"))
    val resid = base.join(broadcast(scal), Seq(groupCol))
      .withColumn("ee", expr("n * dd * y - n * nb * x - cc"))
      // one truncating quantization to whole-cent residuals; sign split
      // keeps both engines on non-negative `div`
      .withColumn("e", expr(
        """CAST((CASE WHEN ee < 0 THEN -1 ELSE 1 END)
          |  * (abs(ee) div (n * dd)) AS DECIMAL(38,0))""".stripMargin))
    val wLag = Window.partitionBy(g).orderBy(col("x"))
    resid
      .withColumn("de", col("e") - lag(col("e"), 1).over(wLag))
      .groupBy(g).agg(
        count(lit(1)).as("n_days"),
        sum(col("e") * col("e")).as("den"),
        sum(when(col("de").isNotNull, col("de") * col("de"))
          .otherwise(lit(0).cast(d38))).as("num"))
      .select(g, col("n_days"),
        col("num").cast("string").as("num_scaled"),
        col("den").cast("string").as("den_scaled"),
        expr("CASE WHEN den > 0 THEN (1000000 * num) div den END")
          .as("dw_permicro"))
  }

  /** Ljung-Box portmanteau at lags 1..h over [[Autocorr.acf]]'s exact
    * per-micro ACF: Q = n(n+2)·Σ ρ_k²/(n−k), reported per-micro via
    * staged truncating integer arithmetic (term_k = ρ_micro_k² div
    * (n−k); q = (n·(n+2)·Σterm) div 10⁶). A degenerate series (any
    * NULL ρ) emits NULL q. */
  def ljungBox(cells: DataFrame, groupCol: String, idxCol: String,
               valueCol: String, h: Int): DataFrame = {
    val g = col(groupCol)
    Autocorr.acf(cells, groupCol, idxCol, valueCol, h)
      .withColumn("term", expr(
        """CAST(acf_permicro AS DECIMAL(38,0))
          |  * CAST(acf_permicro AS DECIMAL(38,0)) div (n - lag)""".stripMargin))
      .groupBy(g).agg(
        max("n").as("n_days"),
        count(lit(1)).as("n_lags"),
        sum(when(col("acf_permicro").isNull, 1).otherwise(0)).as("n_null"),
        sum("term").cast("decimal(38,0)").as("s"))
      .select(g, col("n_days"), col("n_lags"),
        expr("""CASE WHEN n_null = 0 THEN
                  (CAST(n_days AS DECIMAL(38,0)) * (n_days + 2) * s)
                    div 1000000 END""").as("q_permicro"))
  }

  /** Wald-Wolfowitz runs test against the series median, per group.
    * Ties with the median are EXCLUDED (the classical treatment) via
    * the doubled-median compare (2·x vs m1+m2 — no halves, no floats).
    * Reports (runs, n_pos, n_neg) and the SIGNED squared z statistic
    * zsq_permicro = sign(A)·(10⁶·A²·(m−1)) div B with
    * A = m·R − m − 2n₊n₋, B = 2n₊n₋(2n₊n₋ − m), m = n₊+n₋ —
    * exact, monotone in |z|, sign = too-few(−)/too-many(+) runs. */
  def runsTest(cells: DataFrame, groupCol: String, idxCol: String,
               valueCol: String): DataFrame = {
    val g = col(groupCol)
    val wVal = Window.partitionBy(g).orderBy(col(valueCol), col(idxCol))
    val wCnt = Window.partitionBy(g)
    // doubled median: m1 + m2 (odd n: the middle twice)
    val med = cells
      .withColumn("r", row_number().over(wVal))
      .withColumn("n", count(lit(1)).over(wCnt))
      .groupBy(g).agg(
        sum(when(expr("r = (n + 1) div 2 OR r = n div 2 + 1"), col(valueCol))
          .otherwise(0) * when(expr("n % 2 = 1 AND r = (n + 1) div 2"), 2)
          .otherwise(1)).as("med2"))
    val signed = cells.join(broadcast(med), Seq(groupCol))
      .withColumn("sgn",
        when(col(valueCol) * 2 > col("med2"), 1)
          .when(col(valueCol) * 2 < col("med2"), -1))
      .filter(col("sgn").isNotNull) // ties drop out
    val wRun = Window.partitionBy(g).orderBy(col(idxCol))
    signed
      .withColumn("flip",
        when(lag(col("sgn"), 1).over(wRun).isNull, 1)
          .when(col("sgn") =!= lag(col("sgn"), 1).over(wRun), 1)
          .otherwise(0))
      .groupBy(g).agg(
        sum("flip").cast("long").as("runs"),
        sum(when(col("sgn") === 1, 1).otherwise(0)).cast("long").as("n_pos"),
        sum(when(col("sgn") === -1, 1).otherwise(0)).cast("long").as("n_neg"))
      .withColumn("m", col("n_pos") + col("n_neg"))
      .withColumn("aa", expr(
        """CAST(m AS DECIMAL(38,0)) * runs - m
          |  - 2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg""".stripMargin))
      .withColumn("bb", expr(
        """2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg
          |  * (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg - m)""".stripMargin))
      .select(g, col("runs"), col("n_pos"), col("n_neg"),
        expr("""CASE WHEN bb > 0 THEN
                  (CASE WHEN aa < 0 THEN -1L ELSE 1L END)
                    * ((1000000 * aa * aa * (m - 1)) div bb) END""")
          .as("zsq_permicro"))
  }

  // ---- query-map entries (hash-gated) ----

  def durbinWatsonEvents(spark: SparkSession, dir: String): DataFrame =
    durbinWatson(dailyCells(spark, dir), "event_type", "idx", "cents")

  def ljungBoxEvents(spark: SparkSession, dir: String): DataFrame =
    ljungBox(dailyCells(spark, dir), "event_type", "idx", "cents", h = 7)

  def runsTestEvents(spark: SparkSession, dir: String): DataFrame =
    runsTest(dailyCells(spark, dir), "event_type", "day", "cents")

  private val dailySql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1, 2
      |), cells AS (
      |  SELECT event_type, day, cents,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS idx
      |  FROM daily
      |)""".stripMargin

  def durbinWatsonOracleSql: String =
    dailySql +
    """, scal AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(idx) AS HUGEINT) AS sx, CAST(sum(cents) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(idx AS HUGEINT) * idx) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(idx AS HUGEINT) * cents) AS HUGEINT) AS sxy
      |  FROM cells GROUP BY 1
      |), coefs AS (
      |  SELECT *, n * sxx - sx * sx AS dd, n * sxy - sx * sy AS nb,
      |    sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx AS cc
      |  FROM scal
      |), resid AS (
      |  SELECT c.event_type, c.idx,
      |    (CASE WHEN s.n * s.dd * c.cents - s.n * s.nb * c.idx - s.cc < 0
      |       THEN -1 ELSE 1 END)
      |    * (abs(s.n * s.dd * c.cents - s.n * s.nb * c.idx - s.cc)
      |       // (s.n * s.dd)) AS e
      |  FROM cells c JOIN coefs s USING (event_type)
      |), diffed AS (
      |  SELECT event_type, e,
      |    e - lag(e) OVER (PARTITION BY event_type ORDER BY idx) AS de
      |  FROM resid
      |)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(CASE WHEN de IS NOT NULL THEN de * de ELSE 0 END)
      |    AS VARCHAR) AS num_scaled,
      |  CAST(sum(e * e) AS VARCHAR) AS den_scaled,
      |  CASE WHEN sum(e * e) > 0 THEN CAST(
      |    (1000000 * sum(CASE WHEN de IS NOT NULL THEN de * de ELSE 0 END))
      |      // sum(e * e) AS BIGINT) END AS dw_permicro
      |FROM diffed GROUP BY 1""".stripMargin

  def ljungBoxOracleSql: String =
    dailySql +
    """, lagged AS (
      |  SELECT c.event_type, l.lag,
      |    CAST(c.cents AS HUGEINT) AS x, CAST(p.cents AS HUGEINT) AS y
      |  FROM cells c
      |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
      |  LEFT JOIN cells p
      |    ON p.event_type = c.event_type AND p.idx = c.idx + l.lag
      |), per AS (
      |  SELECT event_type, lag, CAST(count(*) AS HUGEINT) AS nd,
      |    sum(x) AS sd, sum(x * x) AS qd,
      |    sum(CASE WHEN y IS NOT NULL THEN x * y ELSE 0 END) AS pk,
      |    sum(CASE WHEN y IS NOT NULL THEN x ELSE 0 END) AS hk,
      |    sum(CASE WHEN y IS NOT NULL THEN y ELSE 0 END) AS tk
      |  FROM lagged GROUP BY 1, 2
      |), rho AS (
      |  SELECT event_type, lag, nd,
      |    CASE WHEN nd * nd * qd - nd * sd * sd > 0 THEN
      |      (CASE WHEN nd * nd * pk - nd * sd * (hk + tk)
      |              + (nd - lag) * sd * sd < 0 THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(nd * nd * pk - nd * sd * (hk + tk)
      |              + (nd - lag) * sd * sd))
      |         // (nd * nd * qd - nd * sd * sd)) END AS rho_micro
      |  FROM per
      |)
      |SELECT event_type, CAST(max(nd) AS BIGINT) AS n_days,
      |  CAST(count(*) AS BIGINT) AS n_lags,
      |  CASE WHEN sum(CASE WHEN rho_micro IS NULL THEN 1 ELSE 0 END) = 0
      |    THEN CAST((max(nd) * (max(nd) + 2)
      |      * sum(rho_micro * rho_micro // (nd - lag))) // 1000000 AS BIGINT)
      |  END AS q_permicro
      |FROM rho GROUP BY 1""".stripMargin

  def runsTestOracleSql: String =
    dailySql +
    """, med AS (
      |  SELECT event_type,
      |    sum((CASE WHEN r = (n + 1) // 2 OR r = n // 2 + 1 THEN cents
      |          ELSE 0 END)
      |      * (CASE WHEN n % 2 = 1 AND r = (n + 1) // 2 THEN 2 ELSE 1 END))
      |      AS med2
      |  FROM (
      |    SELECT event_type, cents,
      |      row_number() OVER (PARTITION BY event_type
      |        ORDER BY cents, day) AS r,
      |      count(*) OVER (PARTITION BY event_type) AS n
      |    FROM cells
      |  ) GROUP BY 1
      |), signed AS (
      |  SELECT c.event_type, c.day,
      |    CASE WHEN c.cents * 2 > m.med2 THEN 1
      |      WHEN c.cents * 2 < m.med2 THEN -1 END AS sgn
      |  FROM cells c JOIN med m USING (event_type)
      |  WHERE c.cents * 2 <> m.med2
      |), flips AS (
      |  SELECT event_type, sgn,
      |    CASE WHEN lag(sgn) OVER (PARTITION BY event_type ORDER BY day)
      |        IS NULL THEN 1
      |      WHEN sgn <> lag(sgn) OVER (PARTITION BY event_type ORDER BY day)
      |        THEN 1 ELSE 0 END AS flip
      |  FROM signed
      |), agg AS (
      |  SELECT event_type, CAST(sum(flip) AS BIGINT) AS runs,
      |    CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |    CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      |  FROM flips GROUP BY 1
      |), stat AS (
      |  SELECT *, n_pos + n_neg AS m,
      |    CAST(n_pos + n_neg AS HUGEINT) * runs - (n_pos + n_neg)
      |      - 2 * CAST(n_pos AS HUGEINT) * n_neg AS aa,
      |    2 * CAST(n_pos AS HUGEINT) * n_neg
      |      * (2 * CAST(n_pos AS HUGEINT) * n_neg - (n_pos + n_neg)) AS bb
      |  FROM agg
      |)
      |SELECT event_type, runs, n_pos, n_neg,
      |  CASE WHEN bb > 0 THEN CAST(
      |    (CASE WHEN aa < 0 THEN -1 ELSE 1 END)
      |      * ((1000000 * aa * aa * (m - 1)) // bb) AS BIGINT)
      |  END AS zsq_permicro
      |FROM stat""".stripMargin
}
