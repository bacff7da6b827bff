package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact Spearman rank correlation (tie-corrected, via Pearson on
  * average ranks) over DOMAIN-BOUNDED integer pairs — completing the
  * dependence-test family beside [[Kendall]] (concordance) and
  * [[MutualInfo]]: monotone association with the familiar ρ scale.
  * Same feature-screening role as Kendall (reference anchor
  * /root/reference/DataEngineering/DataBricks/spark_randomforest.py
  * feature prep), O(cells) instead of O(cells²).
  *
  * Rank discipline — all integers, no float ever:
  * - average ranks carry a ½, so everything runs on DOUBLED ranks:
  *   for a value cell with strictly-below count b and count c,
  *   2·rank = 2b + c + 1 — an integer.
  * - doubled ranks are CENTERED exactly: Σ 2r = n(n+1) over rows, so
  *   d = 2r − (n+1) has mean 0 with no division. Then
  *   cov = Σ c·dx·dy, varx = Σ c·dx², vary = Σ c·dy² on the joint
  *   cell table, and ρ = cov/√(varx·vary).
  * - magnitudes: |d| ≤ n ⇒ each sum ≤ n³ (10³⁶ at a trillion rows —
  *   inside DECIMAL(38,0); the UNcentered formulation's n·Σc·rx·ry
  *   reaches 10⁴⁸ and is exactly why centering happens first).
  * - ρ reports in permicro via the exact integer sqrt
  *   ([[Allocation]]'s Newton-clamped isqrt) with STAGED division
  *   (|cov| div sx first, then ·10⁶, then div sy) so nothing exceeds
  *   38 digits; both stages truncate identically on both engines.
  *
  * One fact pass builds the joint cells; marginal rank maps are
  * windows over the bounded value domains; everything after is
  * cell-sized forever.
  */
object Spearman {

  /** One row: (n, cov, varx, vary as digit strings, rho_permicro) for
    * integer columns (xCol, yCol). */
  def rho(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("c"))
      .localCheckpoint() // reused by both marginals and the joint sum
    def marginal(k: String): DataFrame = {
      val m = cells.groupBy(col(k)).agg(sum(col("c")).as("__mc"))
      val wPrior = Window.orderBy(col(k))
        .rowsBetween(Window.unboundedPreceding, -1)
      m.withColumn("__below",
          coalesce(sum(col("__mc")).over(wPrior),
            lit(0).cast("decimal(38,0)")))
        .select(col(k),
          (lit(2) * col("__below") + col("__mc") + lit(1))
            .as(s"__r2$k"))
    }
    val n1 = cells.agg(sum(col("c")).as("__n")) // broadcast single row
    val joined = cells
      .join(broadcast(marginal("x")), "x")
      .join(broadcast(marginal("y")), "y")
      .crossJoin(broadcast(n1))
      .select(col("c"),
        (col("__r2x") - (col("__n") + 1)).as("dx"),
        (col("__r2y") - (col("__n") + 1)).as("dy"),
        col("__n"))
    val agg = joined.agg(
      first(col("__n")).as("__n"),
      sum(col("c") * col("dx") * col("dy")).as("cov"),
      sum(col("c") * col("dx") * col("dx")).as("varx"),
      sum(col("c") * col("dy") * col("dy")).as("vary"))
    val sx = graft.operators.Allocation.isqrtSql("varx")
    val sy = graft.operators.Allocation.isqrtSql("vary")
    agg.select(
      col("__n").cast("long").as("n"),
      col("cov").cast("string").as("cov"),
      col("varx").cast("string").as("varx"),
      col("vary").cast("string").as("vary"),
      // magnitude clamped at 10⁶: |ρ| ≤ 1 mathematically, but the
      // truncated split-isqrt denominator underestimates by up to
      // (1/sx + 1/sy) relative — visible only on tiny inputs, where
      // the clamp restores the exact ±1 for perfect monotone data
      // each div result re-cast to DECIMAL(38,0): Spark's div yields
      // BIGINT and the ·10⁶ rescale would overflow long past ~10¹² rows
      expr(s"""CASE WHEN varx > 0 AND vary > 0 THEN
          CAST((CASE WHEN cov < 0 THEN -1 ELSE 1 END)
            * least(CAST((CAST(abs(cov) div $sx AS DECIMAL(38,0)) * 1000000
                + CAST((abs(cov) % $sx) * 1000000 div $sx AS DECIMAL(38,0)))
                div $sy AS DECIMAL(38,0)),
              CAST(1000000 AS DECIMAL(38,0)))
            AS BIGINT) END""").as("rho_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: quantity vs discount points over lineitem — the
    * same bounded-ordinal pair [[Kendall]] gates on, so the two tests
    * are directly comparable downstream. */
  def spearmanLineitem(spark: SparkSession, dir: String): DataFrame =
    rho(
      Tables.lineitem(spark, dir).select(
        round(col("l_quantity")).cast("long").as("q"),
        round(col("l_discount") * 100).cast("long").as("d")),
      "q", "d")

  def oracleSql: String = {
    val sx = Allocation.isqrtDuckSql("varx")
    val sy = Allocation.isqrtDuckSql("vary")
    s"""WITH pts AS (
       |  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
       |    CAST(round(l_discount * 100) AS BIGINT) AS y
       |  FROM lineitem
       |), cells AS (
       |  SELECT x, y, CAST(count(*) AS HUGEINT) AS c
       |  FROM pts GROUP BY 1, 2
       |), tot AS (SELECT CAST(sum(c) AS HUGEINT) AS n FROM cells),
       |xm AS (
       |  SELECT x, 2 * coalesce(sum(mc) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    + mc + 1 AS r2x
       |  FROM (SELECT x, CAST(sum(c) AS HUGEINT) AS mc FROM cells GROUP BY x)
       |), ym AS (
       |  SELECT y, 2 * coalesce(sum(mc) OVER (ORDER BY y
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    + mc + 1 AS r2y
       |  FROM (SELECT y, CAST(sum(c) AS HUGEINT) AS mc FROM cells GROUP BY y)
       |), agg AS (
       |  SELECT t.n,
       |    sum(c * (r2x - (t.n + 1)) * (r2y - (t.n + 1))) AS cov,
       |    sum(c * (r2x - (t.n + 1)) * (r2x - (t.n + 1))) AS varx,
       |    sum(c * (r2y - (t.n + 1)) * (r2y - (t.n + 1))) AS vary
       |  FROM cells
       |  JOIN xm ON xm.x = cells.x
       |  JOIN ym ON ym.y = cells.y
       |  CROSS JOIN tot t
       |  GROUP BY t.n
       |)
       |SELECT CAST(n AS BIGINT) AS n,
       |  CAST(cov AS VARCHAR) AS cov,
       |  CAST(varx AS VARCHAR) AS varx,
       |  CAST(vary AS VARCHAR) AS vary,
       |  CASE WHEN varx > 0 AND vary > 0 THEN CAST(
       |    (CASE WHEN cov < 0 THEN -1 ELSE 1 END)
       |      * least((((abs(cov) // $sx) * 1000000
       |          + ((abs(cov) % $sx) * 1000000) // $sx) // $sy),
       |        CAST(1000000 AS HUGEINT))
       |    AS BIGINT) END AS rho_permicro
       |FROM agg""".stripMargin
  }
}
