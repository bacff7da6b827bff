package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Cohort retention analysis: group actors by the period of their FIRST
  * activity, then count how many of each cohort stay active in each later
  * period — the standard retention-matrix query behind product/finance
  * dashboards, and the aggregate twin of the reference's per-key
  * first-activity windows (apply_scd2.py's min-effective-date per key).
  *
  * Shape: one aggregate keyed on the actor to find the cohort period, one
  * distinct on (actor, period) for activity, one equi-join on the actor
  * key, and a final small aggregate on (cohort, offset) — every shuffle
  * is keyed on the actor column, so a 100 TB activity table partitions
  * once and reuses that partitioning across both aggregates (Catalyst
  * collapses the first agg and the join onto one Exchange). The
  * (cohort × offset) result is tiny at any scale. All-integer output, so
  * the hash gate is exact.
  */
object Cohort {

  /** (cohort_month, month_offset, n_active): distinct `actorCol`s whose
    * first-ever `dateCol` month is cohort_month and who have activity in
    * cohort_month + month_offset. Offset 0 rows carry each cohort's size. */
  def retentionMonthly(activity: DataFrame, actorCol: String,
                       dateCol: String): DataFrame = {
    val firstMonth = activity.groupBy(col(actorCol))
      .agg(date_trunc("month", min(col(dateCol))).cast("date").as("cohort_month"))
    val activeMonth = activity
      .select(col(actorCol), date_trunc("month", col(dateCol)).cast("date").as("__m"))
      .distinct()
    activeMonth.join(firstMonth, actorCol)
      .groupBy(col("cohort_month"),
        months_between(col("__m"), col("cohort_month")).cast("int").as("month_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: customer cohorts by first-order month over ~80
    * months of orders. */
  def cohortRetentionOrders(spark: SparkSession, dir: String): DataFrame =
    retentionMonthly(Tables.orders(spark, dir), "o_custkey", "o_orderdate")

  def oracleSql: String =
    """WITH firstm AS (
      |  SELECT o_custkey,
      |    CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS cohort_month
      |  FROM orders GROUP BY o_custkey
      |), active AS (
      |  SELECT DISTINCT o_custkey,
      |    CAST(date_trunc('month', o_orderdate) AS DATE) AS m
      |  FROM orders
      |)
      |SELECT f.cohort_month,
      |  CAST(datediff('month', f.cohort_month, a.m) AS INT) AS month_offset,
      |  count(*) AS n_active
      |FROM active a JOIN firstm f USING (o_custkey)
      |GROUP BY 1, 2""".stripMargin
}
