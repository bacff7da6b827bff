package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalable global ordering: row numbers and exact ntile buckets over a
  * TOTAL order without ever funneling the data through one task — the
  * scale-correct form of `row_number().over(Window.orderBy(...))`, whose
  * unpartitioned window is the classic 100 TB killer. Quantile binning
  * (deciles of a spend column, equal-frequency feature buckets) is a
  * routine feature-engineering step in the reference's model-prep flow
  * (/root/reference/MachineLearning/Spark/count_target_onehot_encoder_spark.py
  * family); this gives it a distributed exact implementation.
  *
  * Shape: range-repartition on the order key (Spark's sampled range
  * exchange — the same primitive behind sortWithinPartitions), local
  * row_number per range slice, then add per-slice offsets from a bounded
  * #partitions-row rollup, broadcast back. Two shuffles, no global
  * window. The order columns must be a TOTAL order (include a unique
  * tiebreaker): sampled range boundaries are not deterministic, but with
  * no order ties the composed global row number is — boundary placement
  * only moves rows between slices, never changes their rank.
  */
object Ranks {

  /** Append `out` = 1-based global row number under `orderCols`. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column],
                      out: String): DataFrame = {
    val parts = df.sparkSession.sparkContext.defaultParallelism
    // localCheckpoint is LOAD-BEARING: both the local-rank pass and the
    // per-slice offsets read `ranged`, and RangePartitioner draws a new
    // random sample per evaluation — if the exchange is not reused, the
    // two passes see DIFFERENT partition boundaries and the stitched row
    // numbers collide or overrun N. Materializing once pins one
    // partitioning for both consumers.
    val ranged = df.repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val local = ranged.withColumn("__rn", row_number().over(wLocal).cast("long"))
    // per-slice counts: #partitions rows — bounded, driver-window safe
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .drop("__cnt")
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__rn") + col("__off"))
      .drop("__pid", "__rn", "__off")
  }

  /** Append `out` = exact SQL-ntile bucket (1..k) under `orderCols`:
    * the first (N mod k) buckets hold ceil(N/k) rows, the rest floor(N/k)
    * — bit-identical to `ntile(k) OVER (ORDER BY ...)`, computed from the
    * scalable global row number plus one count() job. */
  def ntileExact(df: DataFrame, orderCols: Seq[Column], k: Int,
                 out: String): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val n = df.count()
    val s = n / k          // small-bucket size
    val r = n % k          // #buckets holding s+1 rows
    val ranked = globalRowNumber(df, orderCols, "__grn")
    // long DIV throughout: double division could round across a bucket
    // boundary once row numbers get large
    val bucket =
      if (s == 0) col("__grn") // fewer rows than buckets: one row each
      else when(col("__grn") <= lit(r * (s + 1)),
        expr(s"(__grn - 1) DIV ${s + 1} + 1"))
        .otherwise(expr(s"$r + (__grn - ${r * (s + 1)} - 1) DIV $s + 1"))
    ranked.withColumn(out, bucket.cast("int")).drop("__grn")
  }

  // ---- query-map entry (hash-gated) ----

  /** Equal-frequency decile of order spend, ties broken by key. */
  def quantileBucketizeOrders(spark: SparkSession, dir: String): DataFrame =
    ntileExact(
      Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
      Seq(col("o_totalprice"), col("o_orderkey")), k = 10, out = "decile")
      .select(col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("decile"))

  def oracleSql: String =
    """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
      |  CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS decile
      |FROM orders""".stripMargin
}
