package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sample-ratio-mismatch (SRM) check — the experiment-integrity gate
  * that runs BEFORE any effect readout ([[MannWhitney]]/[[Cuped]]/
  * [[StratifiedAte]] are meaningless if assignment itself is broken):
  * under a 50/50 split, the χ²₁ statistic collapses to (n₁−n₂)²/N,
  * EXACT as a micros-scaled integer division — no distribution
  * function needed, because the single decision threshold (χ²₁ at
  * α = 0.05) is the PRECOMPUTED literal 3.841459 both engines share
  * (ndcg table discipline). One aggregate over the assignment column;
  * the cheapest query in the suite guards the most expensive mistakes.
  */
object SrmCheck {
  /** χ²₁ 95th percentile in micros — the declared decision literal. */
  val Chi2CritMicro = 3841459L

  /** One row: (n1, n2, chi2_micro, srm_flag) for a nominal 50/50
    * split of armCol into g1/g2. */
  def check(df: DataFrame, armCol: String, g1: String, g2: String): DataFrame =
    df.filter(col(armCol) === g1 || col(armCol) === g2)
      .agg(
        sum(when(col(armCol) === g1, 1L).otherwise(0L)).as("n1"),
        sum(when(col(armCol) === g2, 1L).otherwise(0L)).as("n2"))
      .select(col("n1"), col("n2"),
        // the squared difference accumulates in DECIMAL(38,0):
        // 10⁶·(n1−n2)² overflows BIGINT near sf10 under TPC-H's R/N
        // imbalance; the divided-out chi2_micro itself stays BIGINT
        expr("""CASE WHEN n1 + n2 > 0 THEN
            (1000000 * CAST(n1 - n2 AS DECIMAL(38,0))
              * CAST(n1 - n2 AS DECIMAL(38,0))) div (n1 + n2) END""")
          .as("chi2_micro"))
      .withColumn("srm_flag", col("chi2_micro") > Chi2CritMicro)

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: is lineitem's R/N return-flag assignment
    * consistent with a 50/50 split? (It should be — the generator
    * draws flags uniformly; the flag firing would indicate exactly the
    * pipeline bug SRM exists to catch.) */
  def srmLineitem(spark: SparkSession, dir: String): DataFrame =
    check(Tables.lineitem(spark, dir), "l_returnflag", "R", "N")

  def oracleSql: String =
    s"""WITH s AS (
      |  SELECT CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n2
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N')
      |)
      |SELECT n1, n2,
      |  CASE WHEN n1 + n2 > 0 THEN CAST(
      |    (1000000 * CAST(n1 - n2 AS HUGEINT) * (n1 - n2)) // (n1 + n2)
      |    AS BIGINT)
      |  END AS chi2_micro,
      |  CASE WHEN n1 + n2 > 0 THEN
      |    ((1000000 * CAST(n1 - n2 AS HUGEINT) * (n1 - n2)) // (n1 + n2))
      |      > $Chi2CritMicro
      |  END AS srm_flag
      |FROM s""".stripMargin
}
