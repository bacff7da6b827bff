package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** k-anonymity / l-diversity audit — the privacy gate a training-data
  * export needs BEFORE rows leave the curated zone (the reference
  * moves customer-grade records through its medallion and SFT-prep
  * pipelines; /root/reference/DataEngineering/DataBricks/
  * merge_generator.py-shaped exports are exactly where re-identification
  * risk is audited): every quasi-identifier cell with fewer than k
  * members is re-identifiable by linkage, and a cell whose sensitive
  * attribute is constant leaks it even at size ≥ k (hence l-diversity).
  *
  * One aggregate to QI-cell cardinality (count + exact distinct of the
  * sensitive value per cell — bounded by the sensitive domain), then
  * flags and the global risk summary on the CELL table; the summary
  * rides every row (the Hll readout pattern) so a consumer holds the
  * verdict and the evidence in one frame. PII-column *content*
  * scrubbing is [[graft.functions.TextClean]] `pii_redact`; this
  * audits what redaction cannot see — structure. */
object KAnonymity {

  /** Per-QI-cell rows (qi columns…, n, l_div, violates_k, violates_l)
    * + global (n_cells, n_k_violations, n_l_violations, pop_at_risk)
    * repeated per row. */
  def audit(df: DataFrame, qi: Seq[String], sensitive: Column,
            k: Long, l: Long): DataFrame = {
    val cells = df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("l_div"))
      .withColumn("violates_k", col("n") < k)
      .withColumn("violates_l", col("l_div") < l)
      .localCheckpoint() // consumed by output AND the summary aggregate
    val summary = cells.agg(
      count(lit(1)).as("n_cells"),
      sum(when(col("violates_k"), 1L).otherwise(0L)).as("n_k_violations"),
      sum(when(col("violates_l"), 1L).otherwise(0L)).as("n_l_violations"),
      coalesce(sum(when(col("violates_k") || col("violates_l"), col("n"))),
        lit(0L)).as("pop_at_risk"))
    cells.crossJoin(broadcast(summary))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: customers under QI = (nation, market segment),
    * sensitive = account-balance tier (negative / low / high). */
  def kAnonymityCustomer(spark: SparkSession, dir: String): DataFrame =
    audit(
      Tables.customer(spark, dir).select(col("c_nationkey"),
        col("c_mktsegment"),
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_tier")),
      qi = Seq("c_nationkey", "c_mktsegment"), sensitive = col("bal_tier"),
      k = 5L, l = 2L)

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'negative'
      |      WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END) AS BIGINT) AS l_div
      |  FROM customer GROUP BY 1, 2
      |), flagged AS (
      |  SELECT c_nationkey, c_mktsegment, n, l_div,
      |    n < 5 AS violates_k, l_div < 2 AS violates_l
      |  FROM cells
      |), summary AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
      |    CAST(sum(CASE WHEN violates_k THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_k_violations,
      |    CAST(sum(CASE WHEN violates_l THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_l_violations,
      |    CAST(coalesce(sum(CASE WHEN violates_k OR violates_l THEN n END), 0)
      |      AS BIGINT) AS pop_at_risk
      |  FROM flagged
      |)
      |SELECT f.c_nationkey, f.c_mktsegment, f.n, f.l_div,
      |  f.violates_k, f.violates_l,
      |  s.n_cells, s.n_k_violations, s.n_l_violations, s.pop_at_risk
      |FROM flagged f CROSS JOIN summary s""".stripMargin
}
