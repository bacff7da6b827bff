package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Murphy decomposition of the Brier score — Brier = UNC − RES + REL
  * over forecast cells: the diagnostic companion of [[Calibration]]'s
  * reliability diagram (REL is its summary number) and [[ExactAuc]]
  * (RES is the probabilistic-refinement twin of rank discrimination).
  * Answers "is my probability forecast bad because it's mis-LEVELED
  * (reliability) or because it doesn't SEPARATE outcomes (resolution)?"
  * — the eval readout of the reference's model loop
  * (/root/reference/DataEngineering/DataBricks/spark_randomforest.py
  * evaluator cell).
  *
  * Forecasts quantize ONCE to cents (the [[Calibration]] contract), so
  * cells are ≤ 101 forever. Quantization points (declared, the staged
  * house style): per-cell observed rate o_k and the pooled rate ō round
  * once to permicro; from there REL = Σ n_k·(f_k − o_k)²/(N·10⁶),
  * RES = Σ n_k·(o_k − ō)²/(N·10⁶), UNC = ō(10⁶ − ō)/10⁶ are exact
  * DECIMAL(38,0) sums with one truncating division each, and the
  * reported Brier is the exact identity UNC − RES + REL of those
  * quantized components. Squared-permicro sums reach N·10¹² — DECIMAL
  * territory past ~10⁶ rows, BIGINT quotients always.
  *
  * Scale: one groupBy to forecast cells, scalar aggregates over ≤ 101
  * rows. The 100 TB cost is the scan.
  */
object BrierDecomp {

  /** One row: (n, obar_permicro, rel_permicro, res_permicro,
    * unc_permicro, brier_permicro) for a forecast in [0,1] against a
    * 0/1 label. */
  def decompose(df: DataFrame, forecastCol: String, labelCol: String): DataFrame = {
    val cells = df.select(
        round(col(forecastCol) * 100).cast("long").as("f_cents"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("f_cents"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n_k"),
        sum(col("y")).cast("decimal(38,0)").as("p_k"))
    val tot = cells.agg(
        sum(col("n_k")).cast("decimal(38,0)").as("nn"),
        sum(col("p_k")).cast("decimal(38,0)").as("pp"))
      .select(col("nn"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * pp) div nn")
          .as("obar_permicro"))
      .localCheckpoint() // broadcast into the cell pass and the report
    cells.crossJoin(broadcast(tot))
      .select(col("n_k"), col("nn"), col("obar_permicro"),
        (col("f_cents") * lit(10000L)).as("f_pm"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * p_k) div n_k").as("o_pm"))
      .agg(
        first(col("nn")).as("nn"),
        first(col("obar_permicro")).as("obar"),
        sum(col("n_k") * expr("CAST(abs(f_pm - o_pm) AS DECIMAL(38,0))")
          * expr("CAST(abs(f_pm - o_pm) AS DECIMAL(38,0))")).as("rel_num"),
        sum(col("n_k") *
          expr("CAST(abs(o_pm - obar_permicro) AS DECIMAL(38,0))") *
          expr("CAST(abs(o_pm - obar_permicro) AS DECIMAL(38,0))"))
          .as("res_num"))
      .select(
        col("nn").cast("long").as("n"),
        col("obar").as("obar_permicro"),
        expr("rel_num div (nn * 1000000)").as("rel_permicro"),
        expr("res_num div (nn * 1000000)").as("res_permicro"),
        expr("(obar * (1000000 - obar)) div 1000000").as("unc_permicro"))
      .withColumn("brier_permicro",
        col("unc_permicro") - col("res_permicro") + col("rel_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: a deterministic 0..0.99 forecast (user bucket)
    * against an A/A parity label — RES pins ~0, REL carries the
    * miscalibration of a uniform forecast against a fair coin. */
  def brierEvents(spark: SparkSession, dir: String): DataFrame =
    decompose(
      Tables.events(spark, dir).select(
        ((col("user_id") % 100L).cast("double") / 100.0).as("f"),
        (col("event_id") % 2L).as("y")),
      "f", "y")

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT CAST(round(((user_id % 100) / 100.0) * 100) AS BIGINT)
      |      AS f_cents,
      |    CAST(count(*) AS HUGEINT) AS n_k,
      |    CAST(sum(event_id % 2) AS HUGEINT) AS p_k
      |  FROM events GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(n_k) AS HUGEINT) AS nn,
      |    (1000000 * CAST(sum(p_k) AS HUGEINT)) // sum(n_k) AS obar
      |  FROM cells
      |), acc AS (
      |  SELECT any_value(t.nn) AS nn, any_value(t.obar) AS obar,
      |    sum(c.n_k * abs(c.f_cents * 10000 - (1000000 * c.p_k) // c.n_k)
      |      * abs(c.f_cents * 10000 - (1000000 * c.p_k) // c.n_k))
      |      AS rel_num,
      |    sum(c.n_k * abs((1000000 * c.p_k) // c.n_k - t.obar)
      |      * abs((1000000 * c.p_k) // c.n_k - t.obar)) AS res_num
      |  FROM cells c CROSS JOIN tot t
      |)
      |SELECT CAST(nn AS BIGINT) AS n,
      |  CAST(obar AS BIGINT) AS obar_permicro,
      |  CAST(rel_num // (nn * 1000000) AS BIGINT) AS rel_permicro,
      |  CAST(res_num // (nn * 1000000) AS BIGINT) AS res_permicro,
      |  CAST((obar * (1000000 - obar)) // 1000000 AS BIGINT)
      |    AS unc_permicro,
      |  CAST((obar * (1000000 - obar)) // 1000000
      |    - res_num // (nn * 1000000)
      |    + rel_num // (nn * 1000000) AS BIGINT) AS brier_permicro
      |FROM acc""".stripMargin
}
