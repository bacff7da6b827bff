package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Benford leading-digit profiling — the fraud/data-quality screen that
  * compares a monetary column's first-digit distribution against
  * Benford's law (an extension of the reference's column profiling,
  * /root/reference/DataEngineering/Python/discover_schema.py, toward DQ
  * anomaly screens like [[DataQuality.dqReport]]).
  *
  * Exactness: the leading digit is taken from the DECIMAL STRING of the
  * exact integer cents — never via `log10` (whose float rounding can
  * misclassify exact powers of ten). Observed shares divide two exact
  * BIGINTs once per output row; the Benford expectation
  * `log10(1 + 1/d)` is the same nine-leaf constant expression in both
  * engines. One map-side projection + one 9-row aggregate: scan-bound
  * at any scale.
  */
object DigitProfile {

  /** (digit, n, pct_micros, benford_micros) over the positive values of
    * `valueCol` (zeros/negatives have no Benford digit and are
    * excluded). */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val counts = df
      .select(cents.as("__c"))
      .filter(col("__c") > 0)
      .withColumn("digit", substring(col("__c").cast("string"), 1, 1).cast("int"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__tot"))
    counts.crossJoin(broadcast(total))
      .withColumn("pct_micros",
        round(col("n").cast("double") / col("__tot") * lit(1e6)).cast("long"))
      .withColumn("benford_micros",
        round(log(10.0, lit(1.0) + lit(1.0) / col("digit")) * lit(1e6)).cast("long"))
      .select("digit", "n", "pct_micros", "benford_micros")
  }

  // ---- query-map entry (hash-gated) ----

  def benfordTotalprice(spark: SparkSession, dir: String): DataFrame =
    benford(Tables.orders(spark, dir), "o_totalprice")

  def oracleSql: String =
    """WITH c AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
      |  WHERE round(o_totalprice * 100) > 0
      |), d AS (
      |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
      |    count(*) AS n
      |  FROM c GROUP BY 1
      |), t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM d)
      |SELECT digit, n,
      |  CAST(round(CAST(n AS DOUBLE) / t.tot * 1e6) AS BIGINT) AS pct_micros,
      |  CAST(round(log10(1.0 + 1.0 / digit) * 1e6) AS BIGINT) AS benford_micros
      |FROM d CROSS JOIN t""".stripMargin
}
