package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Right-to-be-forgotten cascade plan — given a cohort of customers to
  * erase, size the delete across the FK chain child-first
  * (lineitem → orders → customer) and, per table, count how many
  * DATE PARTITIONS must be rewritten to apply it. The second number is
  * the one a lakehouse operator actually fears: on a month-partitioned
  * 100 TB fact, deleting 0.1% of rows can still touch 100% of
  * partitions (copy-on-write rewrite amplification), and that is
  * exactly what this plan surfaces before anyone runs the delete.
  * Companion of [[graft.operators.OpsAudit]]'s backfill_plan and the
  * k_anonymity/pii_redact privacy family; reference anchor: the GDPR
  * delete flows around the curated Delta layer
  * (/root/reference/DataEngineering/DataBricks/merge_generator.py
  * MERGE ... WHEN MATCHED THEN DELETE shape).
  *
  * Scale shape: the doomed-customer key set is cohort-sized →
  * broadcast semi-joins against orders and lineitem (at larger
  * cohorts the same plan runs as a shuffle semi-join or a
  * [[graft.operators.BloomPrune]] pre-filter; the join KEYS never
  * leave the dimension's cardinality). One pass per fact table,
  * partial-aggregated counts + distinct-month counts.
  */
object RtbfCascade {

  /** Cascade plan rows (step, tbl, n_delete, parts_touched,
    * parts_total), child tables first. */
  def plan(customerDoomed: DataFrame, orders: DataFrame,
           lineitem: DataFrame): DataFrame = {
    val doomedKeys = customerDoomed.select(col("c_custkey")).distinct()
    val ordersDoomed = orders
      .join(broadcast(doomedKeys),
        orders("o_custkey") === doomedKeys("c_custkey"), "left_semi")
      .localCheckpoint() // feeds its own stats AND the lineitem semi-join
    val liDoomed = lineitem.join(
      broadcast(ordersDoomed.select(col("o_orderkey")).distinct()),
      lineitem("l_orderkey") === col("o_orderkey"), "left_semi")

    def stats(step: Int, tbl: String, doomed: DataFrame, all: DataFrame,
              partCol: String): DataFrame = {
      val touched = doomed.agg(
        count(lit(1)).as("n_delete"),
        countDistinct(date_trunc("month", col(partCol)))
          .as("parts_touched"))
      val total = all.agg(
        countDistinct(date_trunc("month", col(partCol)))
          .as("parts_total"))
      touched.crossJoin(broadcast(total))
        .select(lit(step).as("step"), lit(tbl).as("tbl"),
          col("n_delete"), col("parts_touched"), col("parts_total"))
    }

    stats(1, "lineitem", liDoomed, lineitem, "l_shipdate")
      .unionByName(stats(2, "orders", ordersDoomed, orders, "o_orderdate"))
      .unionByName(
        customerDoomed.agg(count(lit(1)).as("n_delete"))
          .select(lit(3).as("step"), lit("customer").as("tbl"),
            col("n_delete"), lit(null).cast("long").as("parts_touched"),
            lit(null).cast("long").as("parts_total")))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: erase the deterministic 0.4% cohort
    * c_custkey % 250 == 7 and size the cascade. */
  def rtbfOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    plan(cust.filter(col("c_custkey") % 250 === 7),
      Tables.orders(spark, dir), Tables.lineitem(spark, dir))
  }

  def oracleSql: String =
    """WITH doomed AS (
      |  SELECT c_custkey FROM customer WHERE c_custkey % 250 = 7
      |), od AS (
      |  SELECT * FROM orders WHERE o_custkey IN (SELECT c_custkey FROM doomed)
      |), ld AS (
      |  SELECT * FROM lineitem
      |  WHERE l_orderkey IN (SELECT o_orderkey FROM od)
      |)
      |SELECT 1 AS step, 'lineitem' AS tbl,
      |  CAST(count(*) AS BIGINT) AS n_delete,
      |  CAST(count(DISTINCT date_trunc('month', l_shipdate)) AS BIGINT)
      |    AS parts_touched,
      |  (SELECT CAST(count(DISTINCT date_trunc('month', l_shipdate))
      |    AS BIGINT) FROM lineitem) AS parts_total
      |FROM ld
      |UNION ALL
      |SELECT 2, 'orders', CAST(count(*) AS BIGINT),
      |  CAST(count(DISTINCT date_trunc('month', o_orderdate)) AS BIGINT),
      |  (SELECT CAST(count(DISTINCT date_trunc('month', o_orderdate))
      |    AS BIGINT) FROM orders)
      |FROM od
      |UNION ALL
      |SELECT 3, 'customer', CAST(count(*) AS BIGINT), NULL, NULL
      |FROM doomed""".stripMargin
}
