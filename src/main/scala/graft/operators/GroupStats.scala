package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-group bivariate statistics — Pearson correlation and OLS slope —
  * computed from EXACT integer component sums: the distributed form of
  * the column-pair profiling a feature pipeline runs before model
  * training (the reference fits random forests over such features,
  * /root/reference/DataEngineering/DataBricks/spark_randomforest.py;
  * correlation screens the inputs).
  *
  * Determinism discipline: inputs are scaled to integer cents map-side,
  * and ONE aggregation accumulates the six classic sums
  * (n, Σx, Σy, Σx², Σy², Σxy) as BIGINTs — exact, so partial-agg order
  * cannot flap them. The final correlation/slope is a fixed scalar
  * expression over those exact integers, evaluated once per GROUP (not
  * per row), with both engines running the identical IEEE-754 tree —
  * micros-rounded for the gate. Overflow headroom is set by the caller
  * through the per-column scale (Spark 4's ANSI mode makes an overflow
  * THROW, not wrap): the binding sum is Σ(y·yScale)², so the gated
  * 3-group lineitem instance drops the price column to WHOLE units
  * (yScale = 1), trading two decimal places for ~9e8 rows/group of
  * BIGINT headroom where cents would overflow at ~6e5.
  *
  * Scale: one shuffle on the group key with map-side combine; output
  * cardinality = number of groups. This never materializes anything
  * row-shaped after the scan.
  */
object GroupStats {

  /** (group, n, corr_micros, slope_micros) per group key, from
    * `xCol`/`yCol` scaled to integers by `xScale`/`yScale` (100 = cents).
    * Groups where either variance is zero yield NULL correlation/slope
    * (division by zero → NULL in both engines via explicit guard).
    *
    * The scale parameters are the overflow dial: the binding sum is
    * Σ(y·yScale)² as BIGINT, so per-group row headroom is
    * 2^63 / (maxY·yScale)². Low-cardinality group keys over a big fact
    * need a smaller yScale (whole units instead of cents) — correlation
    * is scale-invariant up to the final micros rounding, and the slope
    * simply changes units. */
  def corrSlope(df: DataFrame, groupCol: String,
                xCol: String, yCol: String,
                xScale: Int = 100, yScale: Int = 100): DataFrame = {
    val xc = round(col(xCol) * xScale).cast("long")
    val yc = round(col(yCol) * yScale).cast("long")
    val sums = df
      .select(col(groupCol).as("grp"), xc.as("__x"), yc.as("__y"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("__x").as("sx"), sum("__y").as("sy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"),
        sum(col("__x") * col("__y")).as("sxy"))
    // exact integers in; one double expression per group out. The cross
    // products (n·sxy etc.) exceed BIGINT range at scale, so they are
    // formed in DOUBLE — deterministically: cast-to-double of an exact
    // BIGINT and IEEE multiply are bit-defined, and the oracle casts at
    // the same points.
    val covN = col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy")
    val varXN = col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx")
    val varYN = col("n").cast("double") * col("syy") - col("sy").cast("double") * col("sy")
    sums
      .withColumn("corr_micros",
        when(varXN > 0 && varYN > 0,
          round(covN / sqrt(varXN) / sqrt(varYN) * lit(1e6)).cast("long")))
      .withColumn("slope_micros",
        when(varXN > 0, round(covN / varXN * lit(1e6)).cast("long")))
      .select("grp", "n", "corr_micros", "slope_micros")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: quantity↔extendedprice correlation and slope per
    * return flag. l_returnflag has only 3 values, so the whole fact
    * lands in 3 groups: the price column uses WHOLE currency units
    * (yScale = 1, y ≤ ~1e5, Σy² ≤ ~1e10/row) giving ~9e8 rows/group of
    * BIGINT headroom — cents would overflow past ~6e5 rows/group. */
  def corrLineitem(spark: SparkSession, dir: String): DataFrame =
    corrSlope(Tables.lineitem(spark, dir), "l_returnflag",
      "l_quantity", "l_extendedprice", xScale = 100, yScale = 1)
      .withColumnRenamed("grp", "l_returnflag")

  def oracleSql: String =
    """WITH s AS (
      |  SELECT l_returnflag AS grp, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM (
      |    SELECT l_returnflag,
      |      CAST(round(l_quantity * 100) AS BIGINT) AS x,
      |      CAST(round(l_extendedprice * 1) AS BIGINT) AS y
      |    FROM lineitem
      |  ) GROUP BY 1
      |)
      |SELECT grp AS l_returnflag, n,
      |  CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      |        AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
      |    THEN CAST(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |      / sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |      / sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
      |      * 1e6) AS BIGINT) END AS corr_micros,
      |  CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      |    THEN CAST(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |      * 1e6) AS BIGINT) END AS slope_micros
      |FROM s""".stripMargin
}
