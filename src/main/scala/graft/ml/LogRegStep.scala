package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The first Newton-Raphson step of logistic regression, exactly — the
  * classification twin of [[LinReg]]'s normal-equation solve: at
  * w₀ = 0 every predicted probability is EXACTLY ½, so the Hessian is
  * XᵀX/4, the gradient is Xᵀ(y−½) = Xᵀz/2 with z = 2y−1 ∈ {−1,+1},
  * and the step w₁ = (XᵀWX)⁻¹Xᵀ(y−p) collapses to the fully RATIONAL
  * 2·(XᵀX)⁻¹(Xᵀz) — no sigmoid, no libm, the one point on the
  * logistic path that is hash-gatable without approximation. It gates
  * the iteration inside every logistic fit the way [[GbtStump]] gates
  * the tree and kmeans_step gates Lloyd (the reference's classifier
  * family: /root/reference/MachineLearning/Spark/spark_randomforest.py
  * class-probability fits, AzureML propensity-style scorers).
  *
  * Same determinism discipline as [[LinReg]]: integer-scaled features,
  * nine BIGINT sufficient sums in one map-side-combined aggregate,
  * 3×3 Cramer in DECIMAL(38,0), coefficients as truncating micros
  * (2·10⁶·detᵢ div det — Spark `div` and DuckDB `//` both truncate
  * toward zero, verified). One scan, O(1) solve: a logistic step over
  * 100 TB at the cost of a COUNT(*).
  */
object LogRegStep {

  /** One row (n, n_pos, w0_micros, w1_micros, w2_micros,
    * margin_probe_micros): the post-step linear margin
    * w₀+w₁x₁+w₂x₂ at the probe point (sigmoid of it is the predicted
    * probability — left to the consumer, outside the exact gate). */
  def newtonStep(df: DataFrame, label: Column, x1: Column, x2: Column,
                 probeX1: Long, probeX2: Long): DataFrame = {
    val sums = df.select(
        when(label, 1L).otherwise(-1L).as("__z"),
        x1.as("__x1"), x2.as("__x2"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__z") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum("__x1").as("s1"), sum("__x2").as("s2"), sum("__z").as("sz"),
        sum(col("__x1") * col("__x1")).as("s11"),
        sum(col("__x1") * col("__x2")).as("s12"),
        sum(col("__x2") * col("__x2")).as("s22"),
        sum(col("__x1") * col("__z")).as("s1z"),
        sum(col("__x2") * col("__z")).as("s2z"))
    val dec = Seq("n", "s1", "s2", "sz", "s11", "s12", "s22", "s1z", "s2z")
      .foldLeft(sums) { (d, c) =>
        d.withColumn(s"${c}d", col(c).cast("decimal(38,0)"))
      }
    dec.selectExpr(
      "n", "n_pos",
      """(nd * (s11d * s22d - s12d * s12d)
         - s1d * (s1d * s22d - s12d * s2d)
         + s2d * (s1d * s12d - s11d * s2d)) AS det""",
      """(szd * (s11d * s22d - s12d * s12d)
         - s1d * (s1zd * s22d - s12d * s2zd)
         + s2d * (s1zd * s12d - s11d * s2zd)) AS det0""",
      """(nd * (s1zd * s22d - s12d * s2zd)
         - szd * (s1d * s22d - s12d * s2d)
         + s2d * (s1d * s2zd - s1zd * s2d)) AS det1""",
      """(nd * (s11d * s2zd - s1zd * s12d)
         - s1d * (s1d * s2zd - s1zd * s2d)
         + szd * (s1d * s12d - s11d * s2d)) AS det2""")
      .selectExpr(
        "n", "n_pos",
        // w = 2·(XᵀX)⁻¹(Xᵀz): the factor 2 rides inside the micros scale
        "CASE WHEN det <> 0 THEN (det0 * 2000000) div det END AS w0_micros",
        "CASE WHEN det <> 0 THEN (det1 * 2000000) div det END AS w1_micros",
        "CASE WHEN det <> 0 THEN (det2 * 2000000) div det END AS w2_micros")
      .withColumn("margin_probe_micros",
        col("w0_micros") + lit(probeX1) * col("w1_micros")
          + lit(probeX2) * col("w2_micros"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: P(returned) against quantity and discount points
    * over lineitem — [[LinReg]]'s features with the return flag as the
    * class, probed at (quantity 30, discount 5%). */
  def logregLineitem(spark: SparkSession, dir: String): DataFrame =
    newtonStep(Tables.lineitem(spark, dir),
      label = col("l_returnflag") === "R",
      x1 = round(col("l_quantity")).cast("long"),
      x2 = round(col("l_discount") * 100).cast("long"),
      probeX1 = 30L, probeX2 = 5L)

  def oracleSql: String =
    """WITH s AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |    CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
      |    CAST(sum(z) AS HUGEINT) AS sz,
      |    CAST(sum(x1 * x1) AS HUGEINT) AS s11,
      |    CAST(sum(x1 * x2) AS HUGEINT) AS s12,
      |    CAST(sum(x2 * x2) AS HUGEINT) AS s22,
      |    CAST(sum(x1 * z) AS HUGEINT) AS s1z,
      |    CAST(sum(x2 * z) AS HUGEINT) AS s2z
      |  FROM (
      |    SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS z,
      |      CAST(round(l_quantity) AS BIGINT) AS x1,
      |      CAST(round(l_discount * 100) AS BIGINT) AS x2
      |    FROM lineitem
      |  )
      |), d AS (
      |  SELECT CAST(n AS BIGINT) AS n, n_pos,
      |    (n * (s11 * s22 - s12 * s12)
      |     - s1 * (s1 * s22 - s12 * s2)
      |     + s2 * (s1 * s12 - s11 * s2)) AS det,
      |    (sz * (s11 * s22 - s12 * s12)
      |     - s1 * (s1z * s22 - s12 * s2z)
      |     + s2 * (s1z * s12 - s11 * s2z)) AS det0,
      |    (n * (s1z * s22 - s12 * s2z)
      |     - sz * (s1 * s22 - s12 * s2)
      |     + s2 * (s1 * s2z - s1z * s2)) AS det1,
      |    (n * (s11 * s2z - s1z * s12)
      |     - s1 * (s1 * s2z - s1z * s2)
      |     + sz * (s1 * s12 - s11 * s2)) AS det2
      |  FROM s
      |), w AS (
      |  SELECT n, n_pos,
      |    CASE WHEN det <> 0 THEN CAST((det0 * 2000000) // det AS BIGINT) END AS w0_micros,
      |    CASE WHEN det <> 0 THEN CAST((det1 * 2000000) // det AS BIGINT) END AS w1_micros,
      |    CASE WHEN det <> 0 THEN CAST((det2 * 2000000) // det AS BIGINT) END AS w2_micros
      |  FROM d
      |)
      |SELECT n, n_pos, w0_micros, w1_micros, w2_micros,
      |  w0_micros + 30 * w1_micros + 5 * w2_micros AS margin_probe_micros
      |FROM w""".stripMargin
}
