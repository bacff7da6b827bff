package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** 2-D skyline (maximal-vector / Pareto frontier) — "which customers
  * are undominated on (order count, revenue)?": the multi-criteria
  * readout behind every best-supplier / best-variant shortlist the
  * reference's notebooks build by hand-sorting twice. A point is
  * dominated iff another point is ≥ on BOTH axes and > on at least
  * one; duplicates of an undominated point all survive (no strict
  * edge between them).
  *
  * Plan, not pairs: the classic sort-scan — collapse to one row per x
  * (max y), suffix-max that domain-bounded table by x descending, and
  * a point survives iff y is its x's maximum AND strictly beats the
  * best y among strictly-larger x. Two windows over the per-x table
  * (|distinct x| rows) + one broadcast-size join back; the O(n²)
  * dominance join never materializes. Exact integers throughout.
  *
  * Scale shape: the per-x table is bounded by the x domain (order
  * counts — hundreds of values at any SF); the join back to points is
  * a broadcast. The 100 TB cost is the one fact rollup producing the
  * points.
  */
object Skyline {

  /** Undominated points of (xCol, yCol), both maximized. Returns the
    * input columns of surviving rows. */
  def skyline2d(points: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = points.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__my"))
    val wDesc = Window.orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("__mgt", max(col("__my")).over(wDesc))
      .filter(col("__mgt").isNull || col("__my") > col("__mgt"))
    points.join(
      broadcast(frontier),
      col(xCol) === col("__x") && col(yCol) === col("__my"))
      .drop("__x", "__my", "__mgt")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: customer skyline on (n_orders, revenue cents). */
  def skylineCustomers(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    skyline2d(pts, "n_orders", "cents")
      .select(col("custkey"), col("n_orders"), col("cents"))
  }

  def oracleSql: String =
    """WITH pts AS (
      |  SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1
      |), perx AS (
      |  SELECT n_orders AS x, max(cents) AS my FROM pts GROUP BY 1
      |), frontier AS (
      |  SELECT x, my,
      |    max(my) OVER (ORDER BY x DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mgt
      |  FROM perx
      |)
      |SELECT p.custkey, p.n_orders, p.cents
      |FROM pts p JOIN frontier f
      |  ON p.n_orders = f.x AND p.cents = f.my
      |WHERE f.mgt IS NULL OR f.my > f.mgt""".stripMargin
}
