package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact grouped WEIGHTED median — the revenue-weighted companion of
  * [[GroupQuantiles]]' row-count quantiles: "the price point at which
  * half the DOLLARS sit below", not half the rows. The two diverge
  * hard on skewed spend distributions, and pricing/mix analyses want
  * the weighted one (reference anchor: the revenue-mix summaries over
  * AIO_delta_table_generator.py star facts).
  *
  * Contract: lower weighted median — the smallest value v whose
  * cumulative weight reaches ⌈W/2⌉ (W = total weight), computed on
  * the VALUE-CELL table (one fact pass to (group, value) weight
  * sums; the cumulative walk is a window over cells, partitioned by
  * group — domain-bounded forever). Integer weights only; ties and
  * even totals resolve by the ceil threshold, bit-identical
  * cross-engine.
  */
object WeightedMedian {

  /** One row per group: (grp, total_w, median_v, w_below, w_at). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(sum(col(weightCol).cast("decimal(38,0)")).as("w"))
    val wCum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("tot", sum(col("w")).over(wAll))
      // cum ≥ ceil(W/2) ⟺ 2·cum ≥ W for integers — no division at
      // all (a (W+1) div 2 quotient would outgrow BIGINT at 100 TB
      // cent-weights; Spark's div returns long)
      .filter(expr("2 * cum >= tot") && expr("2 * (cum - w) < tot"))
      .select(col("g").as("grp"),
        col("tot").cast("string").as("total_w"),
        col("v").as("median_v"),
        (col("cum") - col("w")).cast("string").as("w_below"),
        col("w").cast("string").as("w_at"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the quantity at which half of lineitem REVENUE
    * (extendedprice cents) sits below, per return flag — vs the
    * unweighted median quantity which ignores price mix. */
  def weightedMedianLineitem(spark: SparkSession, dir: String): DataFrame =
    weightedMedian(
      Tables.lineitem(spark, dir).select(
        col("l_returnflag").as("flag"),
        round(col("l_quantity")).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("cents")),
      "flag", "q", "cents")
      .select(col("grp").as("flag"), col("total_w"), col("median_v"),
        col("w_below"), col("w_at"))

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT l_returnflag AS g, CAST(round(l_quantity) AS BIGINT) AS v,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |      AS HUGEINT) AS w
      |  FROM lineitem GROUP BY 1, 2
      |), cum AS (
      |  SELECT g, v, w,
      |    sum(w) OVER (PARTITION BY g ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(w) OVER (PARTITION BY g) AS tot
      |  FROM cells
      |)
      |SELECT g AS flag, CAST(tot AS VARCHAR) AS total_w,
      |  v AS median_v,
      |  CAST(cum - w AS VARCHAR) AS w_below,
      |  CAST(w AS VARCHAR) AS w_at
      |FROM cum
      |WHERE 2 * cum >= tot AND 2 * (cum - w) < tot""".stripMargin
}
