package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Cross-correlation function (CCF) between two daily series at
  * calendar lags −h..h — the lead/lag diagnostic the forecasting
  * family reads to pick exogenous regressors (does `click` revenue
  * LEAD `purchase` revenue, and by how many days?). Sits beside
  * [[Autocorr]] (the self-paired case) and completes the
  * model-selection toolkit of SURVEY's time-series family.
  *
  * Estimator: the standard sample CCF with FULL-series means and
  * variances and lag-restricted cross sums,
  *   r_k = Σ_t (x_t−x̄)(y_{t+k}−ȳ) / (n·s_x·s_y),
  * paired on CALENDAR day (t+k = day + k·1d) so a missing day drops
  * the pair instead of silently shifting the alignment.
  *
  * Exactness: deviations quantize ONCE to whole cents by sign-split
  * truncating division (X = (n·x − Σx) div n — the [[TsDiagnostics]]
  * residual discipline), cross products and squares accumulate in
  * DECIMAL(38,0)/HUGEINT, and the denominator is the PRODUCT OF EXACT
  * INTEGER SQRTS isqrt(ΣX²)·isqrt(ΣY²) ([[Allocation.isqrtSql]]) —
  * two ≤1-ulp truncations, identical in both engines, instead of one
  * isqrt of a product that would overflow DECIMAL(38) at the 100 TB
  * envelope (ΣX² ≈ 2.4·10³¹ there; the product would be 5.8·10⁶²).
  *
  * Scale shape: one fact→(type, day) rollup; the lag pairing is a
  * broadcast-size self-join of the calendar-bounded spine (≤ days ×
  * (2h+1) rows); scalars join back as a single broadcast row. No
  * single-partition window anywhere.
  */
object CrossCorr {

  /** CCF of `xCol` vs `yCol` on a (day, x, y) spine at lags −h..h:
    * (lag, n_pairs, num_scaled, ccf_permicro). Zero-variance series
    * emit NULL ccf. */
  def ccf(spine: DataFrame, dayCol: String, xCol: String, yCol: String,
          h: Int): DataFrame = {
    require(h >= 1, "h must be >= 1")
    val d38 = "decimal(38,0)"
    val base = spine.select(col(dayCol).as("day"),
      col(xCol).cast(d38).as("x"), col(yCol).cast(d38).as("y"))
    val scal = base.agg(
      count(lit(1)).cast(d38).as("n"),
      sum("x").as("sx"), sum("y").as("sy"))
    // whole-cent deviations: one truncating quantization, sign split
    val dev = base.crossJoin(broadcast(scal))
      .withColumn("xd", expr(
        """CAST((CASE WHEN n * x - sx < 0 THEN -1 ELSE 1 END)
          |  * (abs(n * x - sx) div n) AS DECIMAL(38,0))""".stripMargin))
      .withColumn("yd", expr(
        """CAST((CASE WHEN n * y - sy < 0 THEN -1 ELSE 1 END)
          |  * (abs(n * y - sy) div n) AS DECIMAL(38,0))""".stripMargin))
      .select(col("day"), col("xd"), col("yd"))
    val den = dev.agg(
      sum(col("xd") * col("xd")).as("ssx"),
      sum(col("yd") * col("yd")).as("ssy"))
      .withColumn("sx_s", expr(Allocation.isqrtSql("ssx")))
      .withColumn("sy_s", expr(Allocation.isqrtSql("ssy")))
    val lagDf = spine.sparkSession.range(-h.toLong, h + 1L)
      .select(col("id").cast("int").as("lagk"))
    val paired = dev.as("a")
      .crossJoin(broadcast(lagDf))
      .join(dev.as("b"),
        expr("b.day = date_add(a.day, lagk)"), "left")
      .groupBy(col("lagk"))
      .agg(
        sum(when(col("b.yd").isNotNull, lit(1)).otherwise(0))
          .cast("long").as("n_pairs"),
        sum(when(col("b.yd").isNotNull, col("a.xd") * col("b.yd"))
          .otherwise(lit(0).cast(d38))).as("num"))
    paired.crossJoin(broadcast(den))
      .select(col("lagk").cast("int").as("lag"), col("n_pairs"),
        col("num").cast("string").as("num_scaled"),
        expr("""CASE WHEN sx_s > 0 AND sy_s > 0 THEN
                  (CASE WHEN num < 0 THEN -1L ELSE 1L END)
                    * ((1000000 * abs(num)) div (sx_s * sy_s))
                END""").as("ccf_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: CCF of daily click revenue vs purchase revenue at
    * lags −7..7 (positive lag = clicks LEADING purchases by k days). */
  def ccfEvents(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .groupBy("day")
      .pivot("event_type", Seq("click", "purchase"))
      .agg(first("cents"))
      .filter(col("click").isNotNull && col("purchase").isNotNull)
    ccf(daily, "day", "click", "purchase", h = 7)
  }

  def oracleSql: String = {
    val isqrtX = Allocation.isqrtDuckSql("ssx")
    val isqrtY = Allocation.isqrtDuckSql("ssy")
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, event_type,
       |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
       |  FROM events WHERE event_type IN ('click', 'purchase')
       |  GROUP BY 1, 2
       |), spine AS (
       |  SELECT c.day, c.cents AS x, p.cents AS y
       |  FROM (SELECT day, cents FROM daily WHERE event_type = 'click') c
       |  JOIN (SELECT day, cents FROM daily WHERE event_type = 'purchase') p
       |    USING (day)
       |), scal AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS n,
       |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy
       |  FROM spine
       |), dev AS (
       |  SELECT day,
       |    (CASE WHEN s.n * t.x - s.sx < 0 THEN -1 ELSE 1 END)
       |      * (abs(s.n * t.x - s.sx) // s.n) AS xd,
       |    (CASE WHEN s.n * t.y - s.sy < 0 THEN -1 ELSE 1 END)
       |      * (abs(s.n * t.y - s.sy) // s.n) AS yd
       |  FROM spine t CROSS JOIN scal s
       |), den AS (
       |  SELECT sum(xd * xd) AS ssx, sum(yd * yd) AS ssy FROM dev
       |), dens AS (
       |  SELECT $isqrtX AS sx_s, $isqrtY AS sy_s FROM den
       |), paired AS (
       |  SELECT l.lag,
       |    CAST(sum(CASE WHEN b.yd IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_pairs,
       |    sum(CASE WHEN b.yd IS NOT NULL THEN a.xd * b.yd ELSE 0 END)
       |      AS num
       |  FROM dev a
       |  CROSS JOIN (SELECT unnest(range(-7, 8)) AS lag) l
       |  LEFT JOIN dev b ON b.day = a.day + CAST(l.lag AS INT)
       |  GROUP BY 1
       |)
       |SELECT CAST(p.lag AS INT) AS lag, p.n_pairs,
       |  CAST(p.num AS VARCHAR) AS num_scaled,
       |  CASE WHEN d.sx_s > 0 AND d.sy_s > 0 THEN CAST(
       |    (CASE WHEN p.num < 0 THEN -1 ELSE 1 END)
       |      * ((1000000 * abs(p.num)) // (d.sx_s * d.sy_s)) AS BIGINT)
       |  END AS ccf_permicro
       |FROM paired p CROSS JOIN dens d""".stripMargin
  }
}
