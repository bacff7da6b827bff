package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Equi-width histogram over a numeric column: fixed-origin bins, per-bin
  * row count and exact value sum — the one-pass distribution profile
  * behind data-quality dashboards and the reference's schema-discovery
  * summaries (/root/reference/DataEngineering/Python/discover_schema.py
  * profiles columns the same way, per-column, driver-side; this is the
  * distributed form).
  *
  * Shape: a single map-side bin computation (integer floor-division, no
  * UDF) followed by one aggregate on the bin key — one shuffle whose
  * cardinality is the number of NON-EMPTY bins, independent of row count.
  * Sums are integer cents so the gate is exact at any parallelism.
  */
object Histogram {

  /** (bin, lo_cents, n, sum_cents) for `valueCol` bucketed into
    * `widthCents`-wide bins anchored at zero. Bin edges in integer cents
    * so the bin id is exact; `lo_cents = bin * widthCents` is the
    * inclusive lower edge. */
  def equiWidth(df: DataFrame, valueCol: String, widthCents: Long): DataFrame = {
    // Spark DIV truncates toward zero, DuckDB // floors: identical only
    // for non-negative inputs, which holds for the gated price column.
    // Negative-capable callers should shift to a non-negative origin.
    val cents = round(col(valueCol) * 100).cast("long")
    df.select(cents.as("__c"))
      .withColumn("bin", expr(s"__c DIV ${widthCents}L"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("sum_cents"))
      .withColumn("lo_cents", col("bin") * widthCents)
      .select("bin", "lo_cents", "n", "sum_cents")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: order totals in 50k-cent ($500) bins. */
  def histTotalprice(spark: SparkSession, dir: String): DataFrame =
    equiWidth(Tables.orders(spark, dir), "o_totalprice", widthCents = 50000L)

  def oracleSql: String =
    """WITH c AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
      |)
      |SELECT cents // 50000 AS bin,
      |  (cents // 50000) * 50000 AS lo_cents,
      |  count(*) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM c GROUP BY 1, 2""".stripMargin
}
