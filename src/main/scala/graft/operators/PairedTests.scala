package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Paired and ordered categorical-outcome tests — McNemar's test for
  * paired binary outcomes and the Cochran–Armitage trend test for a
  * binary outcome across ordered doses. These complete the categorical
  * corner of the test battery ([[Contingency]] tests unordered
  * independence, [[MannWhitney]]/[[KruskalWallis]] ordinal location,
  * [[LeveneTest]] scale): McNemar is the before/after readout of the
  * reference's monitored-pipeline experiments
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py feed →
  * scoreboard), Cochran–Armitage the dose-response screen a feature
  * with a natural order gets before modeling
  * (/root/reference/MachineLearning/DataBricks-ML/automl_generator.py
  * feature screening stage).
  *
  * Exactness: both statistics are ratios of integer polynomials of
  * cell counts. McNemar's continuity-corrected χ² is ONE truncating
  * division. Cochran–Armitage quantizes the pooled rate to micros ONCE
  * (the [[Cuped]] θ discipline), forms the trend numerator
  * T = Σ wᵢ(10⁶rᵢ − nᵢp̄) and variance V = p̄(10⁶−p̄)(NΣw²nᵢ−(Σwnᵢ)²)/N
  * in DECIMAL(38,0), and reports z² = 10⁶T²/V with the 10⁶ folded in
  * BEFORE the single truncating division. DECIMAL headroom: T ≤
  * 5·10⁶·N and V ≈ 10¹²·w²·N² keep 10⁶T² ≤ 2.5·10¹⁹·N² inside 38
  * digits to N ≈ 10⁹ doses-weighted rows per test cell — and the
  * inputs to the test are per-dose AGGREGATES, so N here is bounded by
  * the dose table, not the fact.
  *
  * Scale: each test is one map-side-combinable aggregation of the fact
  * to a k-cell table (4 cells / #doses), then scalar arithmetic. The
  * 100 TB cost is the scan.
  */
object PairedTests {

  /** One row (n00, n01, n10, n11, chi2_cc_ppm) over per-unit boolean
    * columns (aCol, bCol): continuity-corrected McNemar
    * χ² = (|n01 − n10| − 1)² / (n01 + n10), ppm, NULL when no
    * discordant pairs. */
  def mcnemar(df: DataFrame, aCol: String, bCol: String): DataFrame =
    df.agg(
        count(when(!col(aCol) && !col(bCol), lit(1))).as("n00"),
        count(when(!col(aCol) && col(bCol), lit(1))).as("n01"),
        count(when(col(aCol) && !col(bCol), lit(1))).as("n10"),
        count(when(col(aCol) && col(bCol), lit(1))).as("n11"))
      .withColumn("chi2_cc_ppm", expr(
        """CASE WHEN n01 + n10 > 0 THEN
             (1000000 * (abs(n01 - n10) - 1) * (abs(n01 - n10) - 1))
               div (n01 + n10) END"""))

  /** One row (n, r, t_scaled, var_scaled, z2_ppm) for binary `hitCol`
    * across integer ordered `doseCol` (weights = the dose values).
    * t/var report as VARCHAR digit strings (DECIMAL internals);
    * z² = T²·10⁶/V truncating, NULL when V = 0 (degenerate rate or a
    * single dose). */
  def cochranArmitage(df: DataFrame, doseCol: String, hitCol: String): DataFrame = {
    val cells = df.groupBy(col(doseCol).cast("long").as("w"))
      .agg(count(lit(1)).as("n_i"),
        count(when(col(hitCol), lit(1))).as("r_i"))
    cells.agg(
        sum(col("n_i")).as("n"), sum(col("r_i")).as("r"),
        sum(col("w").cast("decimal(38,0)") * col("n_i")).as("swn"),
        sum(col("w").cast("decimal(38,0)") * col("r_i")).as("swr"),
        sum(col("w").cast("decimal(38,0)") * col("w") * col("n_i")).as("swwn"))
      .withColumn("p_micro", expr("(1000000 * CAST(r AS DECIMAL(38,0))) div n"))
      // T = Σw·(10⁶·r_i − n_i·p̄) = 10⁶·Σwr − p̄·Σwn  (micros scale)
      .withColumn("t_scaled",
        expr("1000000 * swr - CAST(p_micro AS DECIMAL(38,0)) * swn"))
      // V = p̄(10⁶−p̄)·(N·Σw²n − (Σwn)²) div N  (micros² scale)
      .withColumn("var_scaled", expr(
        """(CAST(p_micro AS DECIMAL(38,0)) * (1000000 - p_micro)
            * (n * swwn - swn * swn)) div n"""))
      .select(col("n"), col("r"),
        col("t_scaled").cast("string").as("t_scaled"),
        col("var_scaled").cast("string").as("var_scaled"),
        expr("""CASE WHEN var_scaled > 0 THEN
            (1000000 * t_scaled * t_scaled) div var_scaled END""")
          .as("z2_ppm"))
  }

  // ---- query-map entries (hash-gated) ----

  /** Gated instance: per customer, "placed an order in 1997" vs
    * "placed an order in 1998" — did the active base shift? Includes
    * customers with no orders at all (the n00 cell). */
  def mcnemarCustomers(spark: SparkSession, dir: String): DataFrame = {
    val flags = Tables.orders(spark, dir).groupBy(col("o_custkey"))
      .agg(
        (count(when(year(col("o_orderdate")) === 1997, lit(1))) > 0).as("y97"),
        (count(when(year(col("o_orderdate")) === 1998, lit(1))) > 0).as("y98"))
    mcnemar(
      Tables.customer(spark, dir).select(col("c_custkey"))
        .join(flags, col("c_custkey") === col("o_custkey"), "left")
        .na.fill(false, Seq("y97", "y98")),
      "y97", "y98")
  }

  /** Gated instance: does the share of orders with a returned line
    * trend with order priority (dose = leading priority digit 1..5)? */
  def trendPriority(spark: SparkSession, dir: String): DataFrame = {
    val returned = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg((count(when(col("l_returnflag") === "R", lit(1))) > 0).as("hit"))
    cochranArmitage(
      Tables.orders(spark, dir)
        .select(col("o_orderkey"),
          substring(col("o_orderpriority"), 1, 1).cast("long").as("dose"))
        .join(returned, col("o_orderkey") === col("l_orderkey"))
        .select("dose", "hit"),
      "dose", "hit")
  }

  def mcnemarOracleSql: String =
    """WITH flags AS (
      |  SELECT o_custkey,
      |    count(CASE WHEN year(o_orderdate) = 1997 THEN 1 END) > 0 AS y97,
      |    count(CASE WHEN year(o_orderdate) = 1998 THEN 1 END) > 0 AS y98
      |  FROM orders GROUP BY 1
      |), units AS (
      |  SELECT coalesce(f.y97, false) AS y97, coalesce(f.y98, false) AS y98
      |  FROM customer c LEFT JOIN flags f ON c.c_custkey = f.o_custkey
      |), cells AS (
      |  SELECT
      |    CAST(count(CASE WHEN NOT y97 AND NOT y98 THEN 1 END) AS BIGINT) AS n00,
      |    CAST(count(CASE WHEN NOT y97 AND y98 THEN 1 END) AS BIGINT) AS n01,
      |    CAST(count(CASE WHEN y97 AND NOT y98 THEN 1 END) AS BIGINT) AS n10,
      |    CAST(count(CASE WHEN y97 AND y98 THEN 1 END) AS BIGINT) AS n11
      |  FROM units
      |)
      |SELECT n00, n01, n10, n11,
      |  CASE WHEN n01 + n10 > 0 THEN CAST(
      |    (1000000 * (abs(n01 - n10) - 1) * (abs(n01 - n10) - 1))
      |      // (n01 + n10) AS BIGINT) END AS chi2_cc_ppm
      |FROM cells""".stripMargin

  def trendOracleSql: String =
    """WITH returned AS (
      |  SELECT l_orderkey,
      |    count(CASE WHEN l_returnflag = 'R' THEN 1 END) > 0 AS hit
      |  FROM lineitem GROUP BY 1
      |), units AS (
      |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w, r.hit
      |  FROM orders o JOIN returned r ON o.o_orderkey = r.l_orderkey
      |), cells AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS n_i,
      |    CAST(count(CASE WHEN hit THEN 1 END) AS BIGINT) AS r_i
      |  FROM units GROUP BY 1
      |), s AS (
      |  SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(sum(r_i) AS BIGINT) AS r,
      |    CAST(sum(CAST(w AS HUGEINT) * n_i) AS HUGEINT) AS swn,
      |    CAST(sum(CAST(w AS HUGEINT) * r_i) AS HUGEINT) AS swr,
      |    CAST(sum(CAST(w AS HUGEINT) * w * n_i) AS HUGEINT) AS swwn
      |  FROM cells
      |), q AS (
      |  SELECT n, r, swn, swr, swwn,
      |    (1000000 * CAST(r AS HUGEINT)) // n AS p_micro
      |  FROM s
      |), stat AS (
      |  SELECT n, r,
      |    1000000 * swr - p_micro * swn AS t_scaled,
      |    (p_micro * (1000000 - p_micro) * (n * swwn - swn * swn)) // n
      |      AS var_scaled
      |  FROM q
      |)
      |SELECT n, r,
      |  CAST(t_scaled AS VARCHAR) AS t_scaled,
      |  CAST(var_scaled AS VARCHAR) AS var_scaled,
      |  CASE WHEN var_scaled > 0 THEN CAST(
      |    (1000000 * t_scaled * t_scaled) // var_scaled AS BIGINT)
      |  END AS z2_ppm
      |FROM stat""".stripMargin
}
