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

  /** Append `out` = global quantile rank of `valueCol` in exact ppm:
    * `1e6 · (#rows strictly below) div (n − 1)` — the rank-based
    * feature transform (the distribution-free cousin of
    * [[Scaling.robustScale]]: monotone map onto [0, 1e6] that no
    * outlier can stretch). Ties share a value cell and therefore a ppm.
    *
    * Scale shape: below-counts come from HISTOGRAM CUMULATION — one
    * aggregate to (value, count) cells, a running sum over the CELL
    * table, and a join back keyed on the value. The unpartitioned
    * window runs over cells only, so callers choose a binning whose
    * cell cardinality is DOMAIN-bounded (whole currency units, integer
    * codes), not row-bounded — then the window input is fixed while
    * the data grows 100×. Raw rows are touched exactly twice (cell agg,
    * join back); n rides in from the cell table's own sum, not a
    * separate count() job. */
  def rankTransform(df: DataFrame, valueCol: Column, out: String): DataFrame = {
    val cells = df.select(valueCol.as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__cnt"))
    val wCum = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val ranked = cells
      .withColumn("__below", sum("__cnt").over(wCum) - col("__cnt"))
      .withColumn("__n", sum("__cnt").over(wAll))
      .withColumn(out,
        when(col("__n") > 1, expr(s"(1000000 * __below) div (__n - 1)"))
          .otherwise(lit(0L)))
      .select(col("__v"), col(out))
    // the cell table is domain-bounded — broadcast it so the fact side
    // is never shuffled for this join
    df.withColumn("__v", valueCol).join(broadcast(ranked), "__v").drop("__v")
  }

  /** Gated instance: whole-dollar account-balance quantile rank per
    * customer. Flooring to dollars bounds the cell table by the BALANCE
    * RANGE (~11k cells at any scale factor), which is what licenses the
    * cell-table window — see [[rankTransform]]. */
  def rankTransformCustomer(spark: SparkSession, dir: String): DataFrame =
    rankTransform(
      Tables.customer(spark, dir).select("c_custkey", "c_acctbal"),
      floor(col("c_acctbal")).cast("long"), "bal_rank_ppm")
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("c_acctbal"),
        col("bal_rank_ppm"))

  def rankTransformOracleSql: String =
    """WITH v AS (
      |  SELECT c_custkey, c_acctbal,
      |    CAST(floor(c_acctbal) AS BIGINT) AS dollar
      |  FROM customer
      |), cells AS (
      |  SELECT dollar, count(*) AS cnt FROM v GROUP BY 1
      |), ranked AS (
      |  SELECT dollar,
      |    SUM(cnt) OVER (ORDER BY dollar) - cnt AS below,
      |    SUM(cnt) OVER () AS n
      |  FROM cells
      |)
      |SELECT v.c_custkey, round(v.c_acctbal, 2) AS c_acctbal,
      |  CASE WHEN r.n > 1
      |    THEN CAST((1000000 * r.below) // (r.n - 1) AS BIGINT)
      |    ELSE 0 END AS bal_rank_ppm
      |FROM v JOIN ranked r ON v.dollar = r.dollar""".stripMargin

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
