package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact Kruskal-Wallis H (one-way rank ANOVA, uncorrected for ties)
  * over DOMAIN-BOUNDED integer values — the k-sample extension of
  * [[MannWhitney]]: do ANY of k groups' metric distributions differ in
  * location? The multi-arm experiment readout beside the two-arm U
  * test (same reference anchor: event scoreboards of
  * /root/reference/DataEngineering/DataBricks/spark_stream.py).
  *
  * Rank discipline mirrors [[Spearman]]: DOUBLED average ranks
  * (2r = 2·below + count + 1, an integer) from one window pass over
  * the bounded value-cell table; per-group doubled rank sums R2_j from
  * the (value × group) cells. With R_j = R2_j/2,
  *   H = 12/(N(N+1)) · Σ R_j²/n_j − 3(N+1)
  *     = 3/(N(N+1)) · Σ R2_j²/n_j − 3(N+1).
  * Permicro reporting uses STAGED exact division so nothing outgrows
  * DECIMAL(38,0) at a trillion rows (R2_j ≤ 2N·n_j, so the naive
  * R2_j² reaches 10⁴⁹):
  *   T_j = q_j·R2_j + (r_j·R2_j) div n_j  where q_j = R2_j div n_j,
  *         r_j = R2_j mod n_j             (≡ R2_j²/n_j, error < 1)
  *   H_permicro = 3·(Q·10⁶ + (R·10⁶) div D) − 3·10⁶·(N+1)
  *         where D = N(N+1), Q = S div D, R = S mod D, S = Σ T_j.
  * Every term is ≤ ~10³⁶; truncation happens at declared points,
  * bit-identically on both engines.
  *
  * One fact pass to (value, group) cells; the rank window runs over
  * the value domain; group math over k rows. Cell-sized forever.
  */
object KruskalWallis {

  /** Per-group rows (grp, n_g, r2_sum) plus the shared H in every row
    * (h_permicro, n) — k is small, the repetition keeps one flat
    * hash-friendly schema. */
  def hStat(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val cells = df
      .groupBy(col(valueCol).as("v"), col(groupCol).as("g"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("c"))
      .localCheckpoint() // feeds the value marginal AND the group sums
    val wPrior = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val vm = cells.groupBy(col("v")).agg(sum(col("c")).as("__vc"))
      .withColumn("__below",
        coalesce(sum(col("__vc")).over(wPrior), lit(0).cast("decimal(38,0)")))
      .select(col("v"),
        (lit(2) * col("__below") + col("__vc") + lit(1)).as("__r2"))
    val grp = cells.join(broadcast(vm), "v")
      .groupBy(col("g"))
      .agg(sum(col("c")).as("n_g"), sum(col("c") * col("__r2")).as("r2_sum"))
      // T = q²n + 2qr + (r²) div n (≡ q·R2 + (r·R2) div n, but every
      // div quotient here FITS BIGINT — Spark's div returns long, so
      // the naive form's (r·R2) div n quotient ≈ R2 ≈ 2N² would
      // overflow the result type itself past ~3·10⁹ rows)
      .withColumn("tj", expr(
        """CAST(r2_sum div n_g AS DECIMAL(38,0))
          |   * CAST(r2_sum div n_g AS DECIMAL(38,0)) * n_g
          | + 2 * CAST(r2_sum div n_g AS DECIMAL(38,0)) * (r2_sum % n_g)
          | + CAST(((r2_sum % n_g) * (r2_sum % n_g)) div n_g
          |     AS DECIMAL(38,0))""".stripMargin))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    grp
      .withColumn("__N", sum(col("n_g")).over(wAll))
      .withColumn("__S", sum(col("tj")).over(wAll))
      .select(col("g").as("grp"),
        col("n_g").cast("long").as("n_g"),
        col("r2_sum").cast("string").as("r2_sum"),
        col("__N").cast("long").as("n"),
        // div yields BIGINT in Spark: re-cast before the ·10⁶·3
        // rescale, which exceeds long range past ~10¹² rows
        expr("""CAST(3 * (CAST(__S div (__N * (__N + 1)) AS DECIMAL(38,0))
              * 1000000
            + CAST(((__S % (__N * (__N + 1))) * 1000000)
                div (__N * (__N + 1)) AS DECIMAL(38,0)))
          - CAST(3000000 AS DECIMAL(38,0)) * (__N + 1)
          AS BIGINT)""").as("h_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: lineitem quantity across the three return flags
    * (A/N/R) — the multi-arm version of [[MannWhitney]]'s gate. */
  def kruskalLineitem(spark: SparkSession, dir: String): DataFrame =
    hStat(
      Tables.lineitem(spark, dir).select(
        round(col("l_quantity")).cast("long").as("q"),
        col("l_returnflag").as("flag")),
      "q", "flag")

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT CAST(round(l_quantity) AS BIGINT) AS v, l_returnflag AS g,
      |    CAST(count(*) AS HUGEINT) AS c
      |  FROM lineitem GROUP BY 1, 2
      |), vm AS (
      |  SELECT v, 2 * coalesce(sum(vc) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + vc + 1 AS r2
      |  FROM (SELECT v, CAST(sum(c) AS HUGEINT) AS vc FROM cells GROUP BY v)
      |), grp AS (
      |  SELECT g, CAST(sum(c) AS HUGEINT) AS n_g,
      |    CAST(sum(c * r2) AS HUGEINT) AS r2_sum
      |  FROM cells JOIN vm ON vm.v = cells.v
      |  GROUP BY g
      |), tj AS (
      |  SELECT g, n_g, r2_sum,
      |    (r2_sum // n_g) * r2_sum + ((r2_sum % n_g) * r2_sum) // n_g AS t
      |  FROM grp
      |), tot AS (
      |  SELECT g, n_g, r2_sum,
      |    sum(n_g) OVER () AS bign, sum(t) OVER () AS s
      |  FROM tj
      |)
      |SELECT g AS grp, CAST(n_g AS BIGINT) AS n_g,
      |  CAST(r2_sum AS VARCHAR) AS r2_sum,
      |  CAST(bign AS BIGINT) AS n,
      |  CAST(3 * ((s // (bign * (bign + 1))) * 1000000
      |      + ((s % (bign * (bign + 1))) * 1000000) // (bign * (bign + 1)))
      |    - 3000000 * (bign + 1) AS BIGINT) AS h_permicro
      |FROM tot""".stripMargin
}
