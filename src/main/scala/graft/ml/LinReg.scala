package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Closed-form multiple linear regression via normal equations — the
  * sufficient-statistics form of distributed model fitting: ONE
  * aggregation over the fact collects the Gram matrix XᵀX and moment
  * vector Xᵀy, and the coefficient solve is a fixed scalar expression
  * over those sums. This is the "ML as a relational aggregate" endpoint
  * of the family that starts at [[graft.operators.GroupStats]] (1
  * feature, per group) and runs through [[GbtStump]] (histogram-split
  * trees): the reference fits its regressors over Spark-assembled
  * features (/root/reference/MachineLearning/Spark/
  * count_target_onehot_encoder_spark.py feeds such fits); here the fit
  * itself is the aggregate.
  *
  * Determinism discipline: inputs are scaled to integers map-side, the
  * nine sufficient sums (n, Σx₁, Σx₂, Σy, Σx₁², Σx₁x₂, Σx₂², Σx₁y,
  * Σx₂y) accumulate as exact BIGINTs, and the 3×3 Cramer solve runs in
  * DECIMAL(38,0) — exact integer determinants (the oracle mirrors with
  * HUGEINT), with coefficients emitted as integer micros via
  * truncating division (both engines truncate toward zero; the Gram
  * determinant is ≥ 0 by positive-semidefiniteness, > 0 unless the
  * features are collinear, so the divisor's sign is fixed). No float
  * enters the plan at any point.
  *
  * Overflow headroom: the binding BIGINT sum is Σx₁y ≤ n·maxX·maxY; at
  * the gated scales (x ≤ 50, y ≤ ~1.1e5 whole units) that allows
  * n ≈ 1.6e12 rows. The Cramer terms peak near Σy·Σx₁²·Σx₂² ≈ 1e30 at
  * sf1 — 8 orders of magnitude inside DECIMAL(38,0)/HUGEINT range, and
  * the ·1e6 micros scaling stays inside 1e37.
  *
  * Scale: one map-side-combined aggregation to a single row; the solve
  * is O(1). Nothing after the scan is row-shaped — this fits a model
  * over 100 TB with the cost of one COUNT(*).
  */
object LinReg {

  /** The sufficient-statistics row + Cramer solve, exposed so siblings
    * (e.g. [[LinearShap]]) can reuse the fitted coefficients TOGETHER
    * with the raw sums (n, s1, s2 are the means' exact numerators):
    * one row carrying n, the DECIMAL(38,0) sums, and
    * b0/b1/b2_micros. Collinear inputs (det = 0) yield NULL
    * coefficients. */
  def sumsAndSolve(df: DataFrame, y: Column, x1: Column, x2: Column): DataFrame = {
    val sums = df.select(y.as("__y"), x1.as("__x1"), x2.as("__x2"))
      .agg(count(lit(1)).as("n"),
        sum("__x1").as("s1"), sum("__x2").as("s2"), sum("__y").as("sy"),
        sum(col("__x1") * col("__x1")).as("s11"),
        sum(col("__x1") * col("__x2")).as("s12"),
        sum(col("__x2") * col("__x2")).as("s22"),
        sum(col("__x1") * col("__y")).as("s1y"),
        sum(col("__x2") * col("__y")).as("s2y"))
    // every sum into DECIMAL(38,0) before any product — BIGINT would
    // overflow at the first cross term
    val dec = Seq("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")
      .foldLeft(sums) { (d, c) =>
        d.withColumn(s"${c}d", col(c).cast("decimal(38,0)"))
      }
    dec.selectExpr(
      "n", "s1d", "s2d",
      // det of the symmetric normal matrix [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]
      """(nd * (s11d * s22d - s12d * s12d)
         - s1d * (s1d * s22d - s12d * s2d)
         + s2d * (s1d * s12d - s11d * s2d)) AS det""",
      // Cramer numerators: the right-hand side [sy, s1y, s2y] replacing
      // column 0 / 1 / 2 respectively
      """(syd * (s11d * s22d - s12d * s12d)
         - s1d * (s1yd * s22d - s12d * s2yd)
         + s2d * (s1yd * s12d - s11d * s2yd)) AS det0""",
      """(nd * (s1yd * s22d - s12d * s2yd)
         - syd * (s1d * s22d - s12d * s2d)
         + s2d * (s1d * s2yd - s1yd * s2d)) AS det1""",
      """(nd * (s11d * s2yd - s1yd * s12d)
         - s1d * (s1d * s2yd - s1yd * s2d)
         + syd * (s1d * s12d - s11d * s2d)) AS det2""")
      .selectExpr(
        "n", "s1d", "s2d",
        "CASE WHEN det <> 0 THEN (det0 * 1000000) div det END AS b0_micros",
        "CASE WHEN det <> 0 THEN (det1 * 1000000) div det END AS b1_micros",
        "CASE WHEN det <> 0 THEN (det2 * 1000000) div det END AS b2_micros")
  }

  /** Fit y ≈ b0 + b1·x1 + b2·x2 from integer-scaled columns and return
    * ONE row: (n, b0_micros, b1_micros, b2_micros, yhat_probe_micros),
    * the last being the fitted prediction at (`probeX1`, `probeX2`) —
    * a fixed probe point that makes the solved plane legible in the
    * output. Collinear inputs (det = 0) yield NULL coefficients. */
  def fitTwoFeature(df: DataFrame, y: Column, x1: Column, x2: Column,
                    probeX1: Long, probeX2: Long): DataFrame = {
    sumsAndSolve(df, y, x1, x2)
      .select(col("n"), col("b0_micros"), col("b1_micros"), col("b2_micros"))
      .withColumn("yhat_probe_micros",
        col("b0_micros") + lit(probeX1) * col("b1_micros")
          + lit(probeX2) * col("b2_micros"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: extended price (whole units) against quantity and
    * discount points over the full lineitem fact, probed at
    * (quantity 30, discount 5%). Whole-unit y keeps Σx₁y headroom at
    * ~1.6e12 rows — the [[graft.operators.GroupStats]] scale dial. */
  def linregLineitem(spark: SparkSession, dir: String): DataFrame =
    fitTwoFeature(Tables.lineitem(spark, dir),
      y = round(col("l_extendedprice")).cast("long"),
      x1 = round(col("l_quantity")).cast("long"),
      x2 = round(col("l_discount") * 100).cast("long"),
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
      |), d AS (
      |  SELECT CAST(n AS BIGINT) AS n,
      |    (n * (s11 * s22 - s12 * s12)
      |     - s1 * (s1 * s22 - s12 * s2)
      |     + s2 * (s1 * s12 - s11 * s2)) AS det,
      |    (sy * (s11 * s22 - s12 * s12)
      |     - s1 * (s1y * s22 - s12 * s2y)
      |     + s2 * (s1y * s12 - s11 * s2y)) AS det0,
      |    (n * (s1y * s22 - s12 * s2y)
      |     - sy * (s1 * s22 - s12 * s2)
      |     + s2 * (s1 * s2y - s1y * s2)) AS det1,
      |    (n * (s11 * s2y - s1y * s12)
      |     - s1 * (s1 * s2y - s1y * s2)
      |     + sy * (s1 * s12 - s11 * s2)) AS det2
      |  FROM s
      |), b AS (
      |  SELECT n,
      |    CASE WHEN det <> 0 THEN CAST((det0 * 1000000) // det AS BIGINT) END AS b0_micros,
      |    CASE WHEN det <> 0 THEN CAST((det1 * 1000000) // det AS BIGINT) END AS b1_micros,
      |    CASE WHEN det <> 0 THEN CAST((det2 * 1000000) // det AS BIGINT) END AS b2_micros
      |  FROM d
      |)
      |SELECT n, b0_micros, b1_micros, b2_micros,
      |  b0_micros + 30 * b1_micros + 5 * b2_micros AS yhat_probe_micros
      |FROM b""".stripMargin
}
