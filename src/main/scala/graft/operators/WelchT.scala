package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Welch's unequal-variance t statistic for every pair of groups — the
  * workhorse two-sample test behind the reference's experiment readouts
  * (/root/reference/MachineLearning/Data/bootstrap_metrics.py estimates
  * the same mean-difference uncertainty by resampling; Welch is the
  * closed-form companion the platform family here exposes beside
  * `bootstrap_ab` / `srm_check` / `power_mde`).
  *
  * Staged exact-integer discipline (the §7e "staged exact division"
  * pattern): per group ONE aggregation collects (n, S=Σy, Q=Σy²) as
  * BIGINTs; each pair then derives
  *   md_milli = sign-free milli-quantized mean difference
  *            = (|S₁n₂ − S₂n₁|·1000) div (n₁n₂), signed separately,
  *   se²ᵢ_micro = (Aᵢ·10⁶) div (nᵢ²(nᵢ−1)),  Aᵢ = nᵢQᵢ − Sᵢ² ≥ 0,
  *   t²_micros  = (md_milli²·10⁶) div (se²₁_micro + se²₂_micro),
  * every divisor strictly positive and every dividend non-negative, so
  * truncating division is engine-identical regardless of floor-vs-trunc
  * semantics on negatives. The textbook-exact rational for t² needs
  * diff²·(n−1)² products that burst DECIMAL(38,0) near sf1; the staged
  * form caps every intermediate at ~1e28 (A·10⁶) with quantization
  * error ≤ 1e-3 dollars on the mean and ≤ 1e-6 on the variance ratio —
  * and the CONTRACT is the quantized statistic itself, mirrored exactly
  * by the oracle.
  *
  * Scale: one map-side-combined groupBy over the fact to k rows, then a
  * k²/2 pair join over the dimension-sized stats table. Nothing after
  * the scan is fact-shaped — Welch over 100 TB costs one COUNT(*).
  */
object WelchT {

  /** Per-pair Welch stats over `df` grouped by `grp`: columns
    * (g1, g2, n1, n2, md_sign, md_milli_abs, t2_micros). Groups with
    * n < 2 are excluded (undefined sample variance). */
  def pairwise(df: DataFrame, grp: Column, y: Column): DataFrame = {
    val stats = df.select(grp.as("g"), y.as("__y"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("__y").as("s"),
        sum(col("__y") * col("__y")).as("q"))
      .filter(col("n") >= 2)
    val a = stats.select(col("g").as("g1"), col("n").as("n1"),
      col("s").as("s1"), col("q").as("q1"))
    val b = stats.select(col("g").as("g2"), col("n").as("n2"),
      col("s").as("s2"), col("q").as("q2"))
    a.join(b, col("g1") < col("g2"))
      // DECIMAL(38,0) before any product — n·Q and S² burst BIGINT
      .withColumn("n1d", col("n1").cast("decimal(38,0)"))
      .withColumn("n2d", col("n2").cast("decimal(38,0)"))
      .withColumn("s1d", col("s1").cast("decimal(38,0)"))
      .withColumn("s2d", col("s2").cast("decimal(38,0)"))
      .withColumn("q1d", col("q1").cast("decimal(38,0)"))
      .withColumn("q2d", col("q2").cast("decimal(38,0)"))
      .withColumn("diff", col("s1d") * col("n2d") - col("s2d") * col("n1d"))
      .withColumn("md_sign", signum(col("diff")).cast("int"))
      .withColumn("md_milli_abs",
        expr("(abs(diff) * 1000) div (n1d * n2d)"))
      .withColumn("a1", col("n1d") * col("q1d") - col("s1d") * col("s1d"))
      .withColumn("a2", col("n2d") * col("q2d") - col("s2d") * col("s2d"))
      .withColumn("se1_micro",
        expr("(a1 * 1000000) div (n1d * n1d * (n1d - 1))"))
      .withColumn("se2_micro",
        expr("(a2 * 1000000) div (n2d * n2d * (n2d - 1))"))
      .withColumn("t2_micros", expr(
        """CASE WHEN se1_micro + se2_micro > 0
          |  THEN (CAST(md_milli_abs AS DECIMAL(38,0))
          |        * md_milli_abs * 1000000)
          |       div CAST(se1_micro + se2_micro AS DECIMAL(38,0)) END"""
          .stripMargin))
      .select(col("g1"), col("g2"), col("n1"), col("n2"),
        col("md_sign"), col("md_milli_abs"), col("t2_micros"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: extended price in whole dollars across the three
    * l_returnflag populations — all three pairs. Whole-dollar units
    * keep Q = Σy² inside BIGINT to ~1e8 rows and A·10⁶ inside
    * DECIMAL(38,0) far beyond sf1. */
  def welchReturnflag(spark: SparkSession, dir: String): DataFrame =
    pairwise(Tables.lineitem(spark, dir),
      grp = col("l_returnflag"),
      y = round(col("l_extendedprice")).cast("long"))

  def oracleSql: String =
    """WITH s AS (
      |  SELECT l_returnflag AS g, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
      |  FROM (SELECT l_returnflag,
      |          CAST(round(l_extendedprice) AS BIGINT) AS y
      |        FROM lineitem)
      |  GROUP BY 1 HAVING count(*) >= 2
      |), p AS (
      |  SELECT a.g AS g1, b.g AS g2,
      |    a.n AS n1, b.n AS n2,
      |    CAST(a.n AS HUGEINT) AS n1h, CAST(b.n AS HUGEINT) AS n2h,
      |    CAST(a.s AS HUGEINT) AS s1h, CAST(b.s AS HUGEINT) AS s2h,
      |    CAST(a.q AS HUGEINT) AS q1h, CAST(b.q AS HUGEINT) AS q2h
      |  FROM s a JOIN s b ON a.g < b.g
      |), d AS (
      |  SELECT g1, g2, n1, n2,
      |    s1h * n2h - s2h * n1h AS diff,
      |    (abs(s1h * n2h - s2h * n1h) * 1000) // (n1h * n2h)
      |      AS md_milli_abs,
      |    (( n1h * q1h - s1h * s1h) * 1000000)
      |      // (n1h * n1h * (n1h - 1)) AS se1_micro,
      |    (( n2h * q2h - s2h * s2h) * 1000000)
      |      // (n2h * n2h * (n2h - 1)) AS se2_micro
      |  FROM p
      |)
      |SELECT g1, g2, n1, n2,
      |  CAST(CASE WHEN diff > 0 THEN 1 WHEN diff < 0 THEN -1 ELSE 0 END
      |    AS INT) AS md_sign,
      |  CAST(md_milli_abs AS BIGINT) AS md_milli_abs,
      |  CASE WHEN se1_micro + se2_micro > 0
      |    THEN CAST((md_milli_abs * md_milli_abs * 1000000)
      |              // (se1_micro + se2_micro) AS BIGINT)
      |  END AS t2_micros
      |FROM d""".stripMargin
}
