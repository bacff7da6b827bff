package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact SHAP values for a linear model — the distributed form of the
  * reference's feature-attribution readout (/root/reference/
  * MachineLearning/SHAP/shap_demo_xgb.py:44-56 averages |SHAP| per
  * column and ranks the top features; :58-62 reads one observation's
  * raw-margin explanation). For a linear model with an independent-
  * feature value function, SHAP is closed-form (Lundberg & Lee 2017,
  * "Linear SHAP"): φ_ij = b_j · (x_ij − E[x_j]), so BOTH the global
  * ranking mean_i |φ_ij| = |b_j| · mean_i |x_ij − x̄_j| and a probe
  * row's explanation are fixed expressions over the normal-equation
  * sums — no per-row explainer pass, no model server.
  *
  * Exactness discipline ([[LinReg]]): coefficients are integer micros
  * from the exact DECIMAL(38,0) Cramer solve; the centered absolute
  * moment is kept as the integer Σ_i |n·x_ij − s_j| (scale n), so
  * mean|φ| = ⌊|b_micros| · A_j / n²⌋ and φ_probe = ⌊b_micros ·
  * (probe·n − s_j) / n⌋ are exact floor divisions mirrored in the
  * oracle via the pmod decomposition (floor, not truncate — sign-safe
  * for negative coefficients). No float enters the plan.
  *
  * Scale: two map-side-combined corpus aggregates (the sums pass and
  * the centered-|x| pass over a broadcast 1-row fit) plus O(1)
  * scalar math — SHAP-ranks a model over 100 TB at the cost of two
  * COUNT(*)-shaped scans. Headroom: |n·x| ≤ n·maxX accumulates in
  * DECIMAL(38,0), good past 1e30 row·value products.
  */
object LinearShap {

  /** Floor division (divisor > 0) matching the oracle's pmod
    * decomposition. */
  private def fd(e: String, d: String): String =
    s"((($e) - pmod(($e), $d)) div ($d))"

  /** Global SHAP report for the two-feature linear fit: one row per
    * feature — (feature, coef_micros, mean_abs_shap_micros,
    * phi_probe_micros, shap_rank), rank 1 = largest mean |SHAP|, ties
    * by feature name. Collinear fits yield NULL coef/shap columns with
    * rank by feature name alone. */
  def shapReport(df: DataFrame, y: Column, x1: Column, x2: Column,
                 name1: String, name2: String,
                 probeX1: Long, probeX2: Long): DataFrame = {
    val fit = LinReg.sumsAndSolve(df, y, x1, x2)
    // pass 2: exact centered absolute moments Σ|n·x − s| at scale n
    val fact = df.select(x1.cast("decimal(38,0)").as("__x1"),
      x2.cast("decimal(38,0)").as("__x2"))
    val moments = fact.crossJoin(broadcast(fit))
      .agg(
        sum(abs(col("n").cast("decimal(38,0)") * col("__x1") - col("s1d")))
          .as("a1"),
        sum(abs(col("n").cast("decimal(38,0)") * col("__x2") - col("s2d")))
          .as("a2"),
        first(col("n")).as("n"),
        first(col("s1d")).as("s1d"), first(col("s2d")).as("s2d"),
        first(col("b1_micros")).as("b1_micros"),
        first(col("b2_micros")).as("b2_micros"))
    val perFeature = moments.select(explode(array(
      struct(lit(name1).as("feature"), col("b1_micros").as("coef_micros"),
        col("a1").as("aa"), col("s1d").as("ss"),
        lit(probeX1).cast("decimal(38,0)").as("probe")),
      struct(lit(name2).as("feature"), col("b2_micros").as("coef_micros"),
        col("a2").as("aa"), col("s2d").as("ss"),
        lit(probeX2).cast("decimal(38,0)").as("probe")))).as("f"),
      col("n").cast("decimal(38,0)").as("nd"))
      .select(col("f.*"), col("nd"))
      .selectExpr(
        "feature", "coef_micros",
        s"CAST(${fd("abs(CAST(coef_micros AS DECIMAL(38,0))) * aa", "nd * nd")} AS BIGINT) AS mean_abs_shap_micros",
        s"CAST(${fd("CAST(coef_micros AS DECIMAL(38,0)) * (probe * nd - ss)", "nd")} AS BIGINT) AS phi_probe_micros")
    import org.apache.spark.sql.expressions.Window
    // 2-row frame — the unpartitioned window is domain-bounded (one row
    // per model feature), never corpus-shaped
    perFeature.withColumn("shap_rank",
      row_number().over(Window.orderBy(
        col("mean_abs_shap_micros").desc_nulls_last, col("feature"))))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the [[LinReg.linregLineitem]] model (extended
    * price vs quantity / discount points over the full fact), probed at
    * (quantity 30, discount 5 pct) — the same plane, now explained. */
  def shapLineitem(spark: SparkSession, dir: String): DataFrame =
    shapReport(Tables.lineitem(spark, dir),
      y = round(col("l_extendedprice")).cast("long"),
      x1 = round(col("l_quantity")).cast("long"),
      x2 = round(col("l_discount") * 100).cast("long"),
      name1 = "quantity", name2 = "discount_pct",
      probeX1 = 30L, probeX2 = 5L)

  def oracleSql: String = {
    def fdx(e: String, d: String): String =
      s"((($e) - ((($e) % ($d)) + ($d)) % ($d)) // ($d))"
    s"""WITH s AS (
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
      |  SELECT n, s1, s2,
      |    (n * (s11 * s22 - s12 * s12)
      |     - s1 * (s1 * s22 - s12 * s2)
      |     + s2 * (s1 * s12 - s11 * s2)) AS det,
      |    (n * (s1y * s22 - s12 * s2y)
      |     - sy * (s1 * s22 - s12 * s2)
      |     + s2 * (s1 * s2y - s1y * s2)) AS det1,
      |    (n * (s11 * s2y - s1y * s12)
      |     - s1 * (s1 * s2y - s1y * s2)
      |     + sy * (s1 * s12 - s11 * s2)) AS det2
      |  FROM s
      |), b AS (
      |  SELECT n, s1, s2,
      |    CASE WHEN det <> 0 THEN (det1 * 1000000) // det END AS b1_micros,
      |    CASE WHEN det <> 0 THEN (det2 * 1000000) // det END AS b2_micros
      |  FROM d
      |), a AS (
      |  SELECT CAST(sum(abs(b.n * CAST(round(l_quantity) AS BIGINT) - b.s1)) AS HUGEINT) AS a1,
      |    CAST(sum(abs(b.n * CAST(round(l_discount * 100) AS BIGINT) - b.s2)) AS HUGEINT) AS a2
      |  FROM lineitem CROSS JOIN b
      |), f AS (
      |  SELECT 'quantity' AS feature, b.b1_micros AS coef_micros,
      |    a.a1 AS aa, b.s1 AS ss, CAST(30 AS HUGEINT) AS probe,
      |    b.n FROM b, a
      |  UNION ALL
      |  SELECT 'discount_pct', b.b2_micros, a.a2, b.s2,
      |    CAST(5 AS HUGEINT), b.n FROM b, a
      |), g AS (
      |  SELECT feature,
      |    CAST(coef_micros AS BIGINT) AS coef_micros,
      |    CAST(${fdx("abs(coef_micros) * aa", "n * n")} AS BIGINT) AS mean_abs_shap_micros,
      |    CAST(${fdx("coef_micros * (probe * n - ss)", "n")} AS BIGINT) AS phi_probe_micros
      |  FROM f
      |)
      |SELECT feature, coef_micros, mean_abs_shap_micros, phi_probe_micros,
      |  CAST(ROW_NUMBER() OVER (ORDER BY mean_abs_shap_micros DESC NULLS LAST, feature) AS INT) AS shap_rank
      |FROM g""".stripMargin
  }
}
