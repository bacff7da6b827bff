package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-mix apportionment — turn per-source corpus weights into an
  * EXACT integer sample-count plan for a fixed budget, by the
  * largest-remainder (Hamilton) method. This is the planning half of the
  * reference's training-mix construction
  * (/root/reference/MachineLearning/Data/flan2022_submix/
  * spark_data_generating.py builds proportional multi-source submixes);
  * [[Sampling.submixSample]] executes a plan, this COMPUTES one: the
  * allocation sums to the budget exactly (no float proportion ever
  * rounds the total away from B, the classic off-by-a-few bug in mix
  * construction).
  *
  * Hamilton method, all integer: quota_i = B·w_i; floor_i = quota_i div
  * W; the Σfloor_i shortfall (< #sources) goes +1 each to the sources
  * with the LARGEST remainders (quota_i mod W, source tie-break). Exact
  * in DECIMAL(38,0) — B·w_i at a 10⁹ budget over 10¹⁵ token weights
  * needs the headroom.
  *
  * Scale: one fact aggregation to #sources rows; windows run over that
  * dimension-sized table only. The plan is a broadcast-sized artifact.
  */
object MixturePlan {

  /** (source, weight, floor_n, extra, alloc_n) for budget B over
    * `weights` rows (sourceCol, weightCol ≥ 0). Σ alloc_n = B exactly
    * (when W > 0; zero total weight yields an all-zero plan). */
  def apportion(weights: DataFrame, sourceCol: String, weightCol: String,
                budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val base = weights.select(col(sourceCol).as("source"),
      col(weightCol).cast("decimal(38,0)").as("weight"))
    val wAll = Window.orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRem = Window.orderBy(col("__rem").desc, col("source").asc)
    base
      .withColumn("__w", sum("weight").over(wAll))
      .withColumn("__quota", lit(budget) * col("weight"))
      .withColumn("floor_n",
        expr("CASE WHEN __w > 0 THEN __quota div __w ELSE 0L END"))
      .withColumn("__rem",
        expr("CASE WHEN __w > 0 THEN CAST(__quota % __w AS DECIMAL(38,0)) " +
          "ELSE CAST(0 AS DECIMAL(38,0)) END"))
      .withColumn("__short",
        when(col("__w") > 0, lit(budget) - sum("floor_n").over(wAll))
          .otherwise(lit(0L)))
      .withColumn("__rr", row_number().over(wRem))
      .withColumn("extra", when(col("__rr") <= col("__short"), 1L).otherwise(0L))
      .withColumn("alloc_n", col("floor_n") + col("extra"))
      .select(col("source"), col("weight").cast("long").as("weight"),
        col("floor_n"), col("extra"), col("alloc_n"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: apportion a 1M-sample budget across document
    * sources weighted by total characters — the mix plan a packing run
    * ([[TokenPack]]) would consume. */
  def mixtureDocs(spark: SparkSession, dir: String): DataFrame =
    apportion(
      Tables.documents(spark, dir)
        .groupBy("source").agg(sum("n_chars").as("chars")),
      "source", "chars", budget = 1000000L)

  def oracleSql: String =
    """WITH w AS (
      |  SELECT source, CAST(sum(n_chars) AS HUGEINT) AS weight FROM documents
      |  GROUP BY source
      |), q AS (
      |  SELECT source, weight,
      |    CAST(sum(weight) OVER () AS HUGEINT) AS tot,
      |    1000000 * weight AS quota
      |  FROM w
      |), f AS (
      |  SELECT source, weight,
      |    CASE WHEN tot > 0 THEN quota // tot ELSE 0 END AS floor_n,
      |    CASE WHEN tot > 0 THEN quota % tot ELSE 0 END AS rem,
      |    CASE WHEN tot > 0
      |      THEN 1000000 - sum(CASE WHEN tot > 0 THEN quota // tot ELSE 0 END)
      |        OVER () ELSE 0 END AS short
      |  FROM q
      |), r AS (
      |  SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS rr
      |  FROM f
      |)
      |SELECT source, CAST(weight AS BIGINT) AS weight,
      |  CAST(floor_n AS BIGINT) AS floor_n,
      |  CAST(CASE WHEN rr <= short THEN 1 ELSE 0 END AS BIGINT) AS extra,
      |  CAST(floor_n + (CASE WHEN rr <= short THEN 1 ELSE 0 END) AS BIGINT)
      |    AS alloc_n
      |FROM r""".stripMargin
}
