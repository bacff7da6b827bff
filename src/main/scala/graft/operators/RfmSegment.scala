package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** RFM (recency / frequency / monetary) customer segmentation — the
  * classic marketing-analytics scoring the reference's curated gold
  * layer feeds (customer-level aggregates of
  * /root/reference/DataEngineering/DataBricks/AIO_delta_table_generator.py
  * star facts; scoring scheme is public folklore, Hughes 1994).
  *
  * Quintile discipline — the part that decides scale: a textbook
  * `ntile(5) OVER (ORDER BY metric)` is a SINGLE-PARTITION window over
  * the whole customer dimension (10⁸ rows through one task at 100 TB).
  * Instead each metric is aggregated to its VALUE-CELL table (recency
  * days and order dates are calendar-bounded, order counts are
  * domain-bounded, dollar totals are price-domain-bounded), the
  * strictly-below customer count runs as a window over cells only, and
  * the score joins back broadcast. The contract is the dense-tie
  * variant: score = (5·below) div n + 1, so TIED customers share a
  * score (they must — a cell is indivisible); that is deterministic,
  * bit-identical cross-engine, and at real cardinalities
  * indistinguishable from ntile.
  */
object RfmSegment {

  /** (value → score 1..5) map for one metric: score =
    * (5·strictly-below) div n + 1 over the bounded cell table. */
  private def quintileMap(perCustomer: DataFrame, valueCol: String): DataFrame = {
    val cells = perCustomer.groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wPrior = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("__below", coalesce(sum(col("__c")).over(wPrior), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .select(col("__v").as(valueCol),
        expr("CAST((5 * __below) div __n + 1 AS INT)")
          .as(valueCol + "_score"))
  }

  /** Deterministic segment label from the three scores. */
  def segmentLabel(r: Column, f: Column, m: Column): Column =
    when(r >= 4 && f >= 4 && m >= 4, "champion")
      .when(f >= 4, "loyal")
      .when(m === 5, "big_spender")
      .when(r <= 2 && f >= 3, "at_risk")
      .when(r <= 2, "hibernating")
      .otherwise("regular")

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: RFM over orders — recency in days before the
    * global latest order date, frequency = order count, monetary =
    * whole dollars of lifetime total price. */
  def rfmOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_custkey").as("custkey"), col("o_orderdate").as("d"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val maxDay = o.agg(max(col("d")).as("__maxd"))
    val per = o.groupBy(col("custkey"))
      .agg(max(col("d")).as("last_d"), count(lit(1)).as("freq"),
        sum(expr("cents div 100")).as("dollars"))
      .crossJoin(broadcast(maxDay))
      .select(col("custkey"),
        datediff(col("__maxd"), col("last_d")).cast("int").as("recency_days"),
        col("freq"), col("dollars"))
      // reused four ways (3 cell maps + the scored join): materialize
      // the customer-level shuffle once instead of re-aggregating the
      // fact per metric
      .localCheckpoint()
    val scored = per
      .join(broadcast(quintileMap(per, "recency_days")), "recency_days")
      .join(broadcast(quintileMap(per, "freq")), "freq")
      .join(broadcast(quintileMap(per, "dollars")), "dollars")
      // recency: FEWER days since last order is better → invert 1..5
      .withColumn("r_score", lit(6) - col("recency_days_score"))
    scored.select(col("custkey"), col("recency_days"), col("freq"),
      col("dollars"), col("r_score"),
      col("freq_score").as("f_score"),
      col("dollars_score").as("m_score"),
      segmentLabel(col("r_score"), col("freq_score"),
        col("dollars_score")).as("segment"))
  }

  def oracleSql: String =
    """WITH o AS (
      |  SELECT o_custkey AS custkey, o_orderdate AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), per AS (
      |  SELECT custkey,
      |    CAST(date_diff('day', max(d),
      |      (SELECT max(d) FROM o)) AS INT) AS recency_days,
      |    CAST(count(*) AS BIGINT) AS freq,
      |    CAST(sum(cents // 100) AS BIGINT) AS dollars
      |  FROM o GROUP BY custkey
      |), rmap AS (
      |  SELECT recency_days AS v, CAST((5 * coalesce(sum(c) OVER (ORDER BY recency_days
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
      |      // (sum(c) OVER ()) + 1 AS INT) AS s
      |  FROM (SELECT recency_days, count(*) AS c FROM per GROUP BY 1)
      |), fmap AS (
      |  SELECT freq AS v, CAST((5 * coalesce(sum(c) OVER (ORDER BY freq
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
      |      // (sum(c) OVER ()) + 1 AS INT) AS s
      |  FROM (SELECT freq, count(*) AS c FROM per GROUP BY 1)
      |), mmap AS (
      |  SELECT dollars AS v, CAST((5 * coalesce(sum(c) OVER (ORDER BY dollars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
      |      // (sum(c) OVER ()) + 1 AS INT) AS s
      |  FROM (SELECT dollars, count(*) AS c FROM per GROUP BY 1)
      |), scored AS (
      |  SELECT per.custkey, per.recency_days, per.freq, per.dollars,
      |    6 - rmap.s AS r_score, fmap.s AS f_score, mmap.s AS m_score
      |  FROM per
      |  JOIN rmap ON rmap.v = per.recency_days
      |  JOIN fmap ON fmap.v = per.freq
      |  JOIN mmap ON mmap.v = per.dollars
      |)
      |SELECT custkey, recency_days, freq, dollars,
      |  r_score, f_score, m_score,
      |  CASE
      |    WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
      |    WHEN f_score >= 4 THEN 'loyal'
      |    WHEN m_score = 5 THEN 'big_spender'
      |    WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
      |    WHEN r_score <= 2 THEN 'hibernating'
      |    ELSE 'regular'
      |  END AS segment
      |FROM scored""".stripMargin
}
