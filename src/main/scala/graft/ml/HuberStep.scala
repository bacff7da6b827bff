package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** One Huber IRLS step in exact integer arithmetic — robust
  * regression's inner loop, gated the way [[LogRegStep]] gates the
  * logistic iteration: fit OLS from BIGINT sufficient statistics,
  * compute every residual against the MICROS-QUANTIZED coefficients
  * (so both engines hold identical residuals), cap the influence of
  * large residuals with the Huber weight w = min(1, k/|r|) in
  * truncating milli, and refit weighted least squares from the
  * reweighted sums. Outliers stop dragging the line after ONE step —
  * the effect the spec plants and measures. (The reference's fits run
  * on Spark-assembled features, MachineLearning/Spark/
  * count_target_onehot_encoder_spark.py; robustness is the standard
  * hardening of that family.)
  *
  * All arithmetic BIGINT/DECIMAL(38): OLS via the 2×2 Cramer solve in
  * cross-multiplied form, residuals exact micros, weights exact milli,
  * weighted sums DECIMAL. Two corpus passes (sufficient stats, then
  * residual+reweight), nothing row-shaped after either aggregate. The
  * Huber threshold k is a declared constant in y-micros (a σ-adaptive
  * k needs a sqrt — out of the exact gate, documented). */
object HuberStep {

  /** (n, slope0_micros, intercept0_micros, n_downweighted,
    * slope1_micros, intercept1_micros) for integer (xCol, yCol) and
    * Huber threshold `kMicros`. Degenerate var(x) = 0 → NULL slopes. */
  def irlsStep(df: DataFrame, xCol: String, yCol: String,
               kMicros: Long): DataFrame = {
    val rows = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y")).localCheckpoint()
    val ols = rows.agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
      .select(col("n"), col("sx"), col("sy"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"))
      .select(col("n"),
        expr("""CASE WHEN den > 0 THEN
            (CASE WHEN num < 0 THEN -1L ELSE 1L END)
              * ((1000000 * abs(num)) div den) END""").as("slope0_micros"),
        col("sx"), col("sy"), col("den"))
      .withColumn("intercept0_micros", expr(
        """CASE WHEN slope0_micros IS NOT NULL THEN
             (CASE WHEN 1000000 * sy - slope0_micros * sx < 0 THEN -1L ELSE 1L END)
               * (abs(1000000 * sy - slope0_micros * sx) div n)
           END"""))
      .select("n", "slope0_micros", "intercept0_micros")
    val weighted = rows.crossJoin(broadcast(ols))
      .withColumn("r_micros", expr(
        "1000000 * y - (intercept0_micros + slope0_micros * x)"))
      .withColumn("w_milli", expr(
        s"""CASE WHEN abs(r_micros) <= ${kMicros}L THEN 1000L
            ELSE ${kMicros * 1000L}L div abs(r_micros) END"""))
    val refit = weighted.agg(
        sum(when(col("w_milli") < 1000L, 1L).otherwise(0L)).as("n_downweighted"),
        sum(col("w_milli")).cast("decimal(38,0)").as("sw"),
        sum(col("w_milli").cast("decimal(38,0)") * col("x")).as("swx"),
        sum(col("w_milli").cast("decimal(38,0)") * col("y")).as("swy"),
        sum(col("w_milli").cast("decimal(38,0)") * col("x") * col("x")).as("swxx"),
        sum(col("w_milli").cast("decimal(38,0)") * col("x") * col("y")).as("swxy"))
      .select(col("n_downweighted"),
        col("sw"), col("swx"), col("swy"),
        (col("sw") * col("swxx") - col("swx") * col("swx")).as("den1"),
        (col("sw") * col("swxy") - col("swx") * col("swy")).as("num1"))
      .select(col("n_downweighted"),
        expr("""CASE WHEN den1 > 0 THEN
            (CASE WHEN num1 < 0 THEN -1L ELSE 1L END)
              * ((1000000 * abs(num1)) div den1) END""").as("slope1_micros"),
        col("sw"), col("swx"), col("swy"))
      .withColumn("intercept1_micros", expr(
        """CASE WHEN slope1_micros IS NOT NULL THEN
             (CASE WHEN 1000000 * swy - slope1_micros * swx < 0 THEN -1L ELSE 1L END)
               * (abs(1000000 * swy - slope1_micros * swx) div sw)
           END"""))
      .select("n_downweighted", "slope1_micros", "intercept1_micros")
    ols.crossJoin(broadcast(refit))
      .select(col("n").cast("long").as("n"), col("slope0_micros"),
        col("intercept0_micros"), col("n_downweighted"),
        col("slope1_micros"), col("intercept1_micros"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: extendedprice (whole units) on quantity, k = 5000
    * whole units — heavy price outliers lose influence in one step. */
  def huberLineitem(spark: SparkSession, dir: String): DataFrame =
    irlsStep(Tables.lineitem(spark, dir).select(
      round(col("l_quantity")).cast("long").as("q"),
      round(col("l_extendedprice")).cast("long").as("p")),
      "q", "p", kMicros = 5000L * 1000000L)

  def oracleSql: String =
    s"""WITH rows_d AS (
      |  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
      |    CAST(round(l_extendedprice) AS BIGINT) AS y
      |  FROM lineitem
      |), s AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(x * x) AS HUGEINT) AS sxx,
      |    CAST(sum(x * y) AS HUGEINT) AS sxy
      |  FROM rows_d
      |), ols AS (
      |  SELECT n, sx, sy,
      |    CASE WHEN n * sxx - sx * sx > 0 THEN
      |      (CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
      |        * ((1000000 * abs(n * sxy - sx * sy)) // (n * sxx - sx * sx))
      |    END AS slope0
      |  FROM s
      |), ols2 AS (
      |  SELECT n, slope0,
      |    CASE WHEN slope0 IS NOT NULL THEN
      |      (CASE WHEN 1000000 * sy - slope0 * sx < 0 THEN -1 ELSE 1 END)
      |        * (abs(1000000 * sy - slope0 * sx) // n)
      |    END AS icept0
      |  FROM ols
      |), weighted AS (
      |  SELECT r.x, r.y, o.slope0, o.icept0,
      |    CASE WHEN abs(1000000 * r.y - (o.icept0 + o.slope0 * r.x))
      |           <= ${5000L * 1000000L} THEN 1000
      |         ELSE (${5000L * 1000000L} * 1000)
      |           // abs(1000000 * r.y - (o.icept0 + o.slope0 * r.x)) END AS w
      |  FROM rows_d r CROSS JOIN ols2 o
      |), ws AS (
      |  SELECT CAST(sum(CASE WHEN w < 1000 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_downweighted,
      |    CAST(sum(w) AS HUGEINT) AS sw,
      |    CAST(sum(CAST(w AS HUGEINT) * x) AS HUGEINT) AS swx,
      |    CAST(sum(CAST(w AS HUGEINT) * y) AS HUGEINT) AS swy,
      |    CAST(sum(CAST(w AS HUGEINT) * x * x) AS HUGEINT) AS swxx,
      |    CAST(sum(CAST(w AS HUGEINT) * x * y) AS HUGEINT) AS swxy
      |  FROM weighted
      |), refit AS (
      |  SELECT n_downweighted, sw, swx, swy,
      |    CASE WHEN sw * swxx - swx * swx > 0 THEN
      |      (CASE WHEN sw * swxy - swx * swy < 0 THEN -1 ELSE 1 END)
      |        * ((1000000 * abs(sw * swxy - swx * swy))
      |            // (sw * swxx - swx * swx))
      |    END AS slope1
      |  FROM ws
      |), refit2 AS (
      |  SELECT n_downweighted, slope1,
      |    CASE WHEN slope1 IS NOT NULL THEN
      |      (CASE WHEN 1000000 * swy - slope1 * swx < 0 THEN -1 ELSE 1 END)
      |        * (abs(1000000 * swy - slope1 * swx) // sw)
      |    END AS icept1
      |  FROM refit
      |)
      |SELECT CAST(o.n AS BIGINT) AS n,
      |  CAST(o.slope0 AS BIGINT) AS slope0_micros,
      |  CAST(o.icept0 AS BIGINT) AS intercept0_micros,
      |  r.n_downweighted,
      |  CAST(r.slope1 AS BIGINT) AS slope1_micros,
      |  CAST(r.icept1 AS BIGINT) AS intercept1_micros
      |FROM ols2 o CROSS JOIN refit2 r""".stripMargin
}
