package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact Mann-Whitney U (Wilcoxon rank-sum) over DOMAIN-BOUNDED integer
  * values — the nonparametric two-sample location test beside
  * [[ExactAuc]]'s KS statistic: does group 1's metric stochastically
  * dominate group 2's? The A/B readout a monitored ingestion feeds
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py events →
  * experiment scoreboard).
  *
  * U never touches row pairs: aggregate the fact ONCE to value cells
  * with per-group counts (bounded by the value domain — quantity is
  * ≤ 50 cells, forever), then U₁ = Σₓ n₁(x)·(below₂(x) + ½·n₂(x)) by a
  * running sum over the CELL table only. The ½ from ties is kept exact
  * by reporting 2U (`u2_*`): all integers, no float ever. Rank-biserial
  * effect size r = 2U₁/(n₁n₂) − 1 reported in sign-split truncating
  * permicro. Accumulation in DECIMAL(38,0): 2U ≤ 2n₁n₂ outgrows BIGINT
  * once both arms pass ~2·10⁹ rows.
  */
object MannWhitney {

  /** One row: (n1, n2, u2_g1, u2_g2, rank_biserial_permicro) comparing
    * `valueCol` between groupCol==g1 and groupCol==g2 rows. */
  def uStats(df: DataFrame, valueCol: String, groupCol: String,
             g1: String, g2: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .filter(col(groupCol) === g1 || col(groupCol) === g2)
      .groupBy(col(valueCol).as("v"))
      .agg(
        sum(when(col(groupCol) === g1, 1L).otherwise(0L))
          .cast("decimal(38,0)").as("n1"),
        sum(when(col(groupCol) === g2, 1L).otherwise(0L))
          .cast("decimal(38,0)").as("n2"))
    // running below-count over the bounded cell table (≤ |domain| rows;
    // the partition-less window is the rank_transform precedent)
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = cells.withColumn("below2",
      coalesce(sum(col("n2")).over(w), lit(0).cast("decimal(38,0)")))
    cum.agg(
      sum(col("n1")).as("__n1"),
      sum(col("n2")).as("__n2"),
      sum(col("n1") * (lit(2) * col("below2") + col("n2"))).as("__u2"))
      .select(
        col("__n1").cast("long").as("n1"),
        col("__n2").cast("long").as("n2"),
        // 2U values report as VARCHAR: DECIMAL(38,0) is the internal
        // accumulator; the gate's value-hash canonicalizes decimals
        // engine-specifically, so the digit string is the bit-exact
        // cross-engine contract.
        col("__u2").cast("string").as("u2_g1"),
        (lit(2) * col("__n1") * col("__n2") - col("__u2"))
          .cast("string").as("u2_g2"),
        expr("""CASE WHEN __n1 > 0 AND __n2 > 0 THEN
            (CASE WHEN __u2 < __n1 * __n2 THEN -1L ELSE 1L END)
              * ((1000000 * abs(__u2 - __n1 * __n2)) div (__n1 * __n2))
          END""").as("rank_biserial_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: does returned ('R') lineitem quantity dominate
    * never-returned ('N')? Values are the 1..50 integer quantities. */
  def mannWhitneyLineitem(spark: SparkSession, dir: String): DataFrame =
    uStats(
      Tables.lineitem(spark, dir).select(
        round(col("l_quantity")).cast("long").as("q"),
        col("l_returnflag").as("flag")),
      "q", "flag", "R", "N")

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT CAST(round(l_quantity) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS HUGEINT) AS n1,
      |    CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
      |      AS HUGEINT) AS n2
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
      |), cum AS (
      |  SELECT n1, n2, coalesce(sum(n2) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    0) AS below2
      |  FROM cells
      |), tot AS (
      |  SELECT sum(n1) AS tn1, sum(n2) AS tn2,
      |    sum(n1 * (2 * below2 + n2)) AS u2
      |  FROM cum
      |)
      |SELECT CAST(tn1 AS BIGINT) AS n1, CAST(tn2 AS BIGINT) AS n2,
      |  CAST(u2 AS VARCHAR) AS u2_g1,
      |  CAST(2 * tn1 * tn2 - u2 AS VARCHAR) AS u2_g2,
      |  CASE WHEN tn1 > 0 AND tn2 > 0 THEN CAST(
      |    (CASE WHEN u2 < tn1 * tn2 THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(u2 - tn1 * tn2)) // (tn1 * tn2))
      |    AS BIGINT) END AS rank_biserial_permicro
      |FROM tot""".stripMargin
}
