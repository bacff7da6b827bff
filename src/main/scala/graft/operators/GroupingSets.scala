package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hierarchical / multi-dimensional subtotal aggregates — ROLLUP and
  * CUBE, the OLAP summary shapes the reference's gold tier feeds to BI
  * (/root/reference/DataEngineering/DataBricks/AIO_delta_table_generator.py
  * gold aggregates; dim_date_generator.py exists precisely to roll
  * facts up calendar hierarchies).
  *
  * Spark's `rollup`/`cube` plan as ONE Expand + hash aggregate — every
  * grouping set is computed in a single pass over the fact with map-side
  * partial aggregation, not one scan per level. `grouping_id()` rides
  * along so subtotal rows are distinguishable from genuine NULL keys.
  * Sums are integer cents: subtotal rows re-aggregate many partials, so
  * float sums would flap across engines.
  */
object GroupingSets {

  /** ROLLUP over the key hierarchy: (all keys) → … → grand total. */
  def rollupAgg(df: DataFrame, keys: Seq[String], cents: String): DataFrame =
    df.rollup(keys.map(col): _*)
      .agg(grouping_id().as("gid"), count(lit(1)).as("cnt"),
        sum(cents).as("sum_cents"))

  /** CUBE: every subset of the keys. */
  def cubeAgg(df: DataFrame, keys: Seq[String], cents: String): DataFrame =
    df.cube(keys.map(col): _*)
      .agg(grouping_id().as("gid"), count(lit(1)).as("cnt"),
        sum(cents).as("sum_cents"))

  // ---- query-map entries (hash-gated) ----

  private def ordersCents(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderstatus"), col("o_orderpriority"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))

  def rollupOrders(spark: SparkSession, dir: String): DataFrame =
    rollupAgg(ordersCents(spark, dir),
      Seq("o_orderstatus", "o_orderpriority"), "cents")

  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    cubeAgg(ordersCents(spark, dir),
      Seq("o_orderstatus", "o_orderpriority"), "cents")

  private def oracle(form: String): String =
    s"""SELECT o_orderstatus, o_orderpriority,
       |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
       |       AS BIGINT) AS gid,
       |  CAST(count(*) AS BIGINT) AS cnt,
       |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
       |    AS sum_cents
       |FROM orders
       |GROUP BY $form (o_orderstatus, o_orderpriority)""".stripMargin

  def rollupOracleSql: String = oracle("ROLLUP")
  def cubeOracleSql: String = oracle("CUBE")
}
