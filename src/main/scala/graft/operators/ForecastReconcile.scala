package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Hierarchical forecast reconciliation (top-down proportional with
  * exact largest-remainder apportionment) — the coherence layer of a
  * forecasting platform: parent- and child-level models disagree by
  * construction, but the numbers PUBLISHED must add up (region total =
  * Σ nations). Complements the point-forecast family ([[Forecast]],
  * [[HoltWinters]], [[Theta]], [[AutoForecast]]) the reference's
  * timeseries work tunes
  * (/root/reference/MachineLearning/Ray/timeseries/
  * neural_forecast_tune.py ensembles; reconciliation is the
  * publication step those forecasts feed).
  *
  * Exactness: the apportionment is the Hamilton/largest-remainder
  * method in pure integers — child share = (P·fᵢ) div F, then the
  * remainder R = P − Σ shares (0 ≤ R < #children) goes one unit each
  * to the R children with the largest (P·fᵢ mod F), ties broken by
  * child key ASC. Reconciled children sum to the parent EXACTLY, by
  * construction, in both engines (the property the spec pins). P·fᵢ
  * rides DECIMAL(38,0); quotients are ≤ P.
  *
  * Scale: two aggregates of the fact (child level, parent level), one
  * broadcast join, windows only over the bounded child dimension per
  * parent. The 100 TB cost is the scan.
  */
object ForecastReconcile {

  /** Reconcile child `rawCol` forecasts to sum exactly to the parent
    * forecast `parentCol` (constant per parent group): adds
    * `reconciled` (BIGINT). Input: one row per (parentKey, childKey).
    * Parents with F = Σ raw = 0 split P by largest-remainder over
    * equal weights (every child mod = P, so the first P mod n children
    * by key order get one unit each — degenerate but exact). */
  def largestRemainder(df: DataFrame, parentKey: String, childKey: String,
                       rawCol: String, parentCol: String): DataFrame = {
    val wPar = Window.partitionBy(col(parentKey))
    val wRank = Window.partitionBy(col(parentKey))
      .orderBy(col("__mod").desc, col(childKey).asc)
    df
      .withColumn("__f", sum(col(rawCol)).over(wPar))
      .withColumn("__base", expr(
        s"""CASE WHEN __f > 0
            THEN (CAST($parentCol AS DECIMAL(38,0)) * $rawCol) div __f
            ELSE CAST($parentCol AS BIGINT) div count(*) OVER (
              PARTITION BY $parentKey) END"""))
      .withColumn("__mod", expr(
        s"""CASE WHEN __f > 0
            THEN (CAST($parentCol AS DECIMAL(38,0)) * $rawCol) % __f
            ELSE CAST($parentCol % (count(*) OVER (
              PARTITION BY $parentKey)) AS DECIMAL(38,0)) END"""))
      .withColumn("__r", col(parentCol) - sum(col("__base")).over(wPar))
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("reconciled",
        col("__base") + when(col("__rk") <= col("__r"), 1L).otherwise(0L))
      .drop("__f", "__base", "__mod", "__r", "__rk")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: 1998 revenue forecasts. Children = per-nation
    * seasonal-naive (1997 actuals, whole cents); parent = per-region
    * drift forecast (1997 + (1997 − 1996) actuals, floored at 0).
    * The two models disagree, so reconciliation does real work. */
  def reconcileRevenue(spark: SparkSession, dir: String): DataFrame = {
    val geo = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name").as("nation"),
        col("r_name").as("region"))
    val rev = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(broadcast(geo), col("o_custkey") === col("c_custkey"))
    val byNation = rev.groupBy("region", "nation")
      .agg(coalesce(sum(when(col("y") === 1997, col("cents"))), lit(0L))
        .as("raw_forecast"))
    val byRegion = rev.groupBy("region")
      .agg(
        coalesce(sum(when(col("y") === 1997, col("cents"))), lit(0L)).as("__a97"),
        coalesce(sum(when(col("y") === 1996, col("cents"))), lit(0L)).as("__a96"))
      .select(col("region").as("__pr"),
        greatest(expr("2 * __a97 - __a96"), lit(0L)).as("parent_forecast"))
    val joined = byNation
      .join(broadcast(byRegion), col("region") === col("__pr"))
      .drop("__pr")
    largestRemainder(joined, "region", "nation",
      "raw_forecast", "parent_forecast")
      .select(col("region"), col("nation"), col("raw_forecast"),
        col("parent_forecast"), col("reconciled"))
  }

  def oracleSql: String =
    """WITH geo AS (
      |  SELECT c.c_custkey, n.n_name AS nation, r.r_name AS region
      |  FROM customer c
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |), rev AS (
      |  SELECT g.region, g.nation, year(o.o_orderdate) AS y,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders o JOIN geo g ON o.o_custkey = g.c_custkey
      |), by_nation AS (
      |  SELECT region, nation,
      |    CAST(coalesce(sum(CASE WHEN y = 1997 THEN cents END), 0) AS BIGINT)
      |      AS raw_forecast
      |  FROM rev GROUP BY 1, 2
      |), by_region AS (
      |  SELECT region,
      |    greatest(2 * CAST(coalesce(sum(CASE WHEN y = 1997 THEN cents END), 0)
      |        AS BIGINT)
      |      - CAST(coalesce(sum(CASE WHEN y = 1996 THEN cents END), 0)
      |        AS BIGINT), 0) AS parent_forecast
      |  FROM rev GROUP BY 1
      |), joined AS (
      |  SELECT n.region, n.nation, n.raw_forecast, r.parent_forecast,
      |    sum(n.raw_forecast) OVER (PARTITION BY n.region) AS f,
      |    count(*) OVER (PARTITION BY n.region) AS nc
      |  FROM by_nation n JOIN by_region r ON n.region = r.region
      |), based AS (
      |  SELECT *,
      |    CASE WHEN f > 0
      |      THEN (CAST(parent_forecast AS HUGEINT) * raw_forecast) // f
      |      ELSE parent_forecast // nc END AS base,
      |    CASE WHEN f > 0
      |      THEN (CAST(parent_forecast AS HUGEINT) * raw_forecast) % f
      |      ELSE CAST(parent_forecast % nc AS HUGEINT) END AS md
      |  FROM joined
      |), remd AS (
      |  SELECT *,
      |    parent_forecast - sum(base) OVER (PARTITION BY region) AS r,
      |    row_number() OVER (PARTITION BY region
      |      ORDER BY md DESC, nation ASC) AS rk
      |  FROM based
      |)
      |SELECT region, nation, raw_forecast, parent_forecast,
      |  CAST(base + (CASE WHEN rk <= r THEN 1 ELSE 0 END) AS BIGINT)
      |    AS reconciled
      |FROM remd""".stripMargin
}
