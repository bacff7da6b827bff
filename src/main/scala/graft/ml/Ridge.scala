package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Closed-form RIDGE regression via the λ-modified normal equations —
  * the regularized sibling of [[LinReg]]: solve
  * (XᵀX + λ·diag(0,1,1)) b = Xᵀy with the intercept unpenalized, for a
  * whole shrinkage PATH of λ values in one pass. The reference tunes
  * regularization strength by refitting per candidate
  * (/root/reference/MachineLearning/Ray/recsys/tune_recsys.py sweeps
  * model hyperparameters over a fixed dataset); with the
  * sufficient-statistics form the sweep costs ONE fact scan total: the
  * nine Gram/moment sums are λ-independent, so the per-λ solve is a
  * scalar Cramer expression over a single cached row.
  *
  * λ is parameterized as c·n (c integer "ridge units per row") so the
  * shrinkage strength is scale-free: the Gram entries grow linearly in
  * n, and a fixed absolute λ would vanish at 100 TB. c = 0 reproduces
  * the OLS fit bit-for-bit ([[LinReg]]'s gate), pinning the path's
  * origin to an independently-gated key.
  *
  * Determinism discipline is [[LinReg]]'s: integer-scaled inputs, exact
  * BIGINT sufficient sums, DECIMAL(38,0) Cramer solve (oracle mirrors
  * in HUGEINT), micros via truncating div. The ridge determinant is
  * strictly positive for λ > 0 (Gram PSD + positive diagonal bump), so
  * the divisor sign is fixed and truncation is engine-identical.
  *
  * Overflow headroom: λ = c·n ≤ 500·n stays 3 orders below s11 ~ n·x̄²;
  * the Cramer terms keep LinReg's ~1e30-at-sf1 envelope within
  * DECIMAL(38,0).
  *
  * Scale: one map-side-combined aggregation to a single row; the path
  * is a 4-row constant join against it. Fits the whole regularization
  * path over 100 TB at the cost of one COUNT(*).
  */
object Ridge {

  /** Ridge path for y ≈ b0 + b1·x1 + b2·x2: one row per c in
    * `lambdaPerRow` with λ = c·n, columns (lambda_per_row, n,
    * b0_micros, b1_micros, b2_micros, yhat_probe_micros). */
  def ridgePath(df: DataFrame, y: Column, x1: Column, x2: Column,
                lambdaPerRow: Seq[Long], probeX1: Long,
                probeX2: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sums = df.select(y.as("__y"), x1.as("__x1"), x2.as("__x2"))
      .agg(count(lit(1)).as("n"),
        sum("__x1").as("s1"), sum("__x2").as("s2"), sum("__y").as("sy"),
        sum(col("__x1") * col("__x1")).as("s11"),
        sum(col("__x1") * col("__x2")).as("s12"),
        sum(col("__x2") * col("__x2")).as("s22"),
        sum(col("__x1") * col("__y")).as("s1y"),
        sum(col("__x2") * col("__y")).as("s2y"))
    val dec = Seq("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")
      .foldLeft(sums) { (d, c) =>
        d.withColumn(s"${c}d", col(c).cast("decimal(38,0)"))
      }
    val path = lambdaPerRow.toDF("lambda_per_row")
    dec.crossJoin(path)
      // primed diagonal: the λ bump on the penalized entries only
      .withColumn("lam", col("lambda_per_row").cast("decimal(38,0)") * col("nd"))
      .withColumn("p11", col("s11d") + col("lam"))
      .withColumn("p22", col("s22d") + col("lam"))
      .selectExpr(
        "lambda_per_row", "n",
        """(nd * (p11 * p22 - s12d * s12d)
           - s1d * (s1d * p22 - s12d * s2d)
           + s2d * (s1d * s12d - p11 * s2d)) AS det""",
        """(syd * (p11 * p22 - s12d * s12d)
           - s1d * (s1yd * p22 - s12d * s2yd)
           + s2d * (s1yd * s12d - p11 * s2yd)) AS det0""",
        """(nd * (s1yd * p22 - s12d * s2yd)
           - syd * (s1d * p22 - s12d * s2d)
           + s2d * (s1d * s2yd - s1yd * s2d)) AS det1""",
        """(nd * (p11 * s2yd - s1yd * s12d)
           - s1d * (s1d * s2yd - s1yd * s2d)
           + syd * (s1d * s12d - p11 * s2d)) AS det2""")
      .selectExpr(
        "lambda_per_row", "n",
        "CASE WHEN det <> 0 THEN (det0 * 1000000) div det END AS b0_micros",
        "CASE WHEN det <> 0 THEN (det1 * 1000000) div det END AS b1_micros",
        "CASE WHEN det <> 0 THEN (det2 * 1000000) div det END AS b2_micros")
      .withColumn("yhat_probe_micros",
        col("b0_micros") + lit(probeX1) * col("b1_micros")
          + lit(probeX2) * col("b2_micros"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: [[LinReg]]'s exact feature set and probe point,
    * swept over c ∈ {0, 5, 50, 500} ridge units per row. The c = 0 row
    * must reproduce `linreg_normal_eq` exactly. */
  def ridgeLineitem(spark: SparkSession, dir: String): DataFrame =
    ridgePath(Tables.lineitem(spark, dir),
      y = round(col("l_extendedprice")).cast("long"),
      x1 = round(col("l_quantity")).cast("long"),
      x2 = round(col("l_discount") * 100).cast("long"),
      lambdaPerRow = Seq(0L, 5L, 50L, 500L),
      probeX1 = 30L, probeX2 = 5L)

  def oracleSql: String =
    """WITH s AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
      |    CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(x1 * x1) AS HUGEINT) AS s11,
      |    CAST(sum(x1 * x2) AS HUGEINT) AS s12,
      |    CAST(sum(x2 * x2) AS HUGEINT) AS s22,
      |    CAST(sum(x1 * y) AS HUGEINT) AS s1y,
      |    CAST(sum(x2 * y) AS HUGEINT) AS s2y
      |  FROM (
      |    SELECT CAST(round(l_extendedprice) AS BIGINT) AS y,
      |      CAST(round(l_quantity) AS BIGINT) AS x1,
      |      CAST(round(l_discount * 100) AS BIGINT) AS x2
      |    FROM lineitem
      |  )
      |), p AS (
      |  SELECT c.lambda_per_row, s.*,
      |    s11 + c.lambda_per_row * n AS p11,
      |    s22 + c.lambda_per_row * n AS p22
      |  FROM s CROSS JOIN (
      |    VALUES (CAST(0 AS HUGEINT)), (CAST(5 AS HUGEINT)),
      |           (CAST(50 AS HUGEINT)), (CAST(500 AS HUGEINT))
      |  ) c(lambda_per_row)
      |), d AS (
      |  SELECT lambda_per_row, CAST(n AS BIGINT) AS n,
      |    (n * (p11 * p22 - s12 * s12)
      |     - s1 * (s1 * p22 - s12 * s2)
      |     + s2 * (s1 * s12 - p11 * s2)) AS det,
      |    (sy * (p11 * p22 - s12 * s12)
      |     - s1 * (s1y * p22 - s12 * s2y)
      |     + s2 * (s1y * s12 - p11 * s2y)) AS det0,
      |    (n * (s1y * p22 - s12 * s2y)
      |     - sy * (s1 * p22 - s12 * s2)
      |     + s2 * (s1 * s2y - s1y * s2)) AS det1,
      |    (n * (p11 * s2y - s1y * s12)
      |     - s1 * (s1 * s2y - s1y * s2)
      |     + sy * (s1 * s12 - p11 * s2)) AS det2
      |  FROM p
      |), b AS (
      |  SELECT CAST(lambda_per_row AS BIGINT) AS lambda_per_row, n,
      |    CASE WHEN det <> 0 THEN CAST((det0 * 1000000) // det AS BIGINT) END AS b0_micros,
      |    CASE WHEN det <> 0 THEN CAST((det1 * 1000000) // det AS BIGINT) END AS b1_micros,
      |    CASE WHEN det <> 0 THEN CAST((det2 * 1000000) // det AS BIGINT) END AS b2_micros
      |  FROM d
      |)
      |SELECT lambda_per_row, n, b0_micros, b1_micros, b2_micros,
      |  b0_micros + 30 * b1_micros + 5 * b2_micros AS yhat_probe_micros
      |FROM b""".stripMargin
}
